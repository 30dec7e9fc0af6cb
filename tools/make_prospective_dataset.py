"""Build a YOLO training set from the prospective-validation artifacts.

The reference mount ships 200 real 1536² images
(``prospective_validation_images/``) and the published consensus-of-2
annotations (``prospective_annotations/consensus_annotations.pkl``, 520
boxes) — the only non-stub labeled data available.  This tool converts them
into the reference's training layout (``utils/datasets.py:65-82``: YOLO-txt
labels ``cls cx cy w h`` normalized, ``images→labels`` path derivation,
``train.txt``/``valid.txt`` lists) so ``amyolo train`` runs on real data.

Class convention matches ``data/custom/classes.names``: 0=CAA, 1=Cored.

Usage:
    python tools/make_prospective_dataset.py \
        --images /root/reference/prospective_validation_images \
        --annotations /root/reference/prospective_annotations/consensus_annotations.pkl \
        --out data/prospective --holdout 40 --seed 0
"""

from __future__ import annotations

import argparse
import os
import pickle
import random
import shutil


CLASSES = ("CAA", "Cored")
TILE = 1536.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--annotations", required=True)
    ap.add_argument("--out", default="data/prospective")
    ap.add_argument("--holdout", type=int, default=40,
                    help="images reserved for valid.txt")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--link", action="store_true",
                    help="symlink images instead of copying")
    args = ap.parse_args()

    with open(args.annotations, "rb") as fh:
        ann = pickle.load(fh)

    img_dir = os.path.join(args.out, "images")
    lbl_dir = os.path.join(args.out, "labels")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lbl_dir, exist_ok=True)

    names = sorted(ann)
    for name in names:
        src = os.path.join(args.images, name)
        if not os.path.exists(src):
            raise FileNotFoundError(src)
        dst = os.path.join(img_dir, name)
        if not os.path.exists(dst):
            if args.link:
                os.symlink(os.path.abspath(src), dst)
            else:
                shutil.copy(src, dst)
        rows = []
        for box, label in ann[name]:
            cls = CLASSES.index(label)
            cx = (box["x1"] + box["x2"]) / 2.0 / TILE
            cy = (box["y1"] + box["y2"]) / 2.0 / TILE
            w = (box["x2"] - box["x1"]) / TILE
            h = (box["y2"] - box["y1"]) / TILE
            rows.append(f"{cls} {cx:.6f} {cy:.6f} {w:.6f} {h:.6f}")
        with open(os.path.join(lbl_dir, name.rsplit(".", 1)[0] + ".txt"),
                  "w") as fh:
            fh.write("\n".join(rows) + ("\n" if rows else ""))

    rng = random.Random(args.seed)
    shuffled = list(names)
    rng.shuffle(shuffled)
    valid = sorted(shuffled[:args.holdout])
    train = sorted(shuffled[args.holdout:])
    with open(os.path.join(args.out, "train.txt"), "w") as fh:
        fh.write("\n".join(os.path.join(img_dir, n) for n in train) + "\n")
    with open(os.path.join(args.out, "valid.txt"), "w") as fh:
        fh.write("\n".join(os.path.join(img_dir, n) for n in valid) + "\n")
    with open(os.path.join(args.out, "classes.names"), "w") as fh:
        fh.write("\n".join(CLASSES) + "\n")
    with open(os.path.join(args.out, "custom.data"), "w") as fh:
        fh.write(f"classes={len(CLASSES)}\n"
                 f"train={os.path.join(args.out, 'train.txt')}\n"
                 f"valid={os.path.join(args.out, 'valid.txt')}\n"
                 f"names={os.path.join(args.out, 'classes.names')}\n")
    n_boxes = sum(len(v) for v in ann.values())
    print(f"{len(train)} train / {len(valid)} valid images, {n_boxes} boxes "
          f"-> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
