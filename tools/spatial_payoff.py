"""Does higher-resolution inference pay off?  (r3 verdict #8.)

The reference detects on 416² downsamples of 1536² tiles
(``Resize(416)``, ``/root/reference/validation.py:90``) — a 3.7× linear
information loss that plausibly costs small-plaque recall.  Spatial
sharding (`parallel/spatial.py`) makes native-resolution inference
mechanically possible on a TPU slice; this tool answers whether it is
WORTH real multi-chip time, using the one real chip we have:

* evaluate a trained checkpoint on the 200 real prospective images at
  model sizes 416 (production), 512 (multiscale-edge), 832 (2×);
* report study-protocol AP@0.5 (consensus GT, conf 0.8, merged) overall
  AND ground-truth recall split by object size (GT box side terciles),
  plus per-image throughput at each size.

Anchor semantics note: YOLO anchors are fixed in INPUT PIXELS
(``heads.decode_head``: ``stride = img_dim / g`` is constant 32/16/8, so
anchor pixel extents do not scale with ``img_size``).  At 832² every
plaque is 2× its 416² pixel size, so the model must generalize both its
features and its wh regressions — the multiscale recipe trains 320-512,
making 512 in-distribution and 832 an extrapolation.  That is exactly
the question: free recall, or out-of-distribution regression?

Usage (TPU, run alone):
    python tools/spatial_payoff.py --ckpt /tmp/ckpt_r4_p2/yolov3_ckpt_35 \
        [--sizes 416 512 832] [--out spatial_payoff.json]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMAGES = "/root/reference/prospective_validation_images"
CONSENSUS = ("/root/reference/prospective_annotations/"
             "consensus_annotations.pkl")
TILE = 1536


def iou_np(a, b):
    """(N,4) x (M,4) IoU with the reference's +1-pixel convention."""
    ix1 = np.maximum(a[:, None, 0], b[None, :, 0])
    iy1 = np.maximum(a[:, None, 1], b[None, :, 1])
    ix2 = np.minimum(a[:, None, 2], b[None, :, 2])
    iy2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(ix2 - ix1 + 1, 0, None) * np.clip(iy2 - iy1 + 1, 0, None)
    aa = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    bb = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    return inter / (aa[:, None] + bb[None, :] - inter + 1e-16)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--sizes", type=int, nargs="+", default=[416, 512, 832])
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--out", default="spatial_payoff.json")
    args = ap.parse_args()

    import jax

    from amyloid_yolo_tpu.analysis.prospective import (
        average_precision_from_table, compare_annotations_to_predictions)
    from amyloid_yolo_tpu.detectors import Detector
    from amyloid_yolo_tpu.graphspec import yolov3_spec
    from amyloid_yolo_tpu.io import weights as W

    spec = yolov3_spec(num_classes=2)
    params = W.load_ckpt_params(args.ckpt)  # accepts <dir>#ema

    with open(CONSENSUS, "rb") as fh:
        consensus = pickle.load(fh)
    # GT size terciles over all 520 boxes (box side = sqrt(area), px in
    # 1536 tile space)
    sides = np.array([
        np.sqrt((e[0]["x2"] - e[0]["x1"]) * (e[0]["y2"] - e[0]["y1"]))
        for v in consensus.values() for e in v])
    t1, t2 = np.percentile(sides, [33.3, 66.7])
    print(f"GT box-side terciles: small<{t1:.0f}px, medium<{t2:.0f}px, "
          f"large (n={len(sides)})", flush=True)

    def bucket(side):
        return "small" if side < t1 else ("medium" if side < t2 else "large")

    results = {}
    for size in args.sizes:
        det = Detector(spec, params, conf_thres=0.8, nms_thres=0.4,
                       model_size=size, tile_size=TILE, host_resize=True,
                       capacity=128)
        t0 = time.perf_counter()
        raw = det.detect_folder(IMAGES, batch_size=args.batch_size,
                                merge_boxes=True)
        wall = time.perf_counter() - t0
        preds = {}
        for path, rows in raw.items():
            name = os.path.basename(path)
            preds[name] = ([] if rows is None else [
                ({"x1": float(r[0]), "y1": float(r[1]),
                  "x2": float(r[2]), "y2": float(r[3]),
                  "conf": float(r[4]), "cls_conf": float(r[5]),
                  "cls_pred": float(r[6])},
                 ("CAA", "Cored")[int(r[6])]) for r in np.asarray(rows)])

        # study-protocol AP@0.5 per class (PRC machinery)
        frames = compare_annotations_to_predictions(
            consensus, preds, 0.5, annotator=f"sz{size}",
            val_type="prospective", prc_dir=f"/tmp/spatial_prc_{size}",
            precision_maps_dir=None)
        aps = {cls: round(average_precision_from_table(frames[cls]), 4)
               for cls in ("CAA", "Cored")}

        # GT recall by size bucket (class-aware match at IoU>=0.5, conf 0.8)
        hit = {"small": 0, "medium": 0, "large": 0}
        tot = {"small": 0, "medium": 0, "large": 0}
        for name, entries in consensus.items():
            gt = np.array([[e[0]["x1"], e[0]["y1"], e[0]["x2"], e[0]["y2"]]
                           for e in entries], np.float32).reshape(-1, 4)
            gcls = [e[1] for e in entries]
            pr = preds.get(name, [])
            pb = np.array([[d["x1"], d["y1"], d["x2"], d["y2"]]
                           for d, _ in pr], np.float32).reshape(-1, 4)
            pcls = [c for _, c in pr]
            m = iou_np(gt, pb) if len(gt) and len(pb) else np.zeros(
                (len(gt), len(pb)))
            for gi, (box, cls) in enumerate(zip(gt, gcls)):
                b = bucket(np.sqrt((box[2] - box[0]) * (box[3] - box[1])))
                tot[b] += 1
                ok = any(m[gi, pi] >= 0.5 and pcls[pi] == cls
                         for pi in range(len(pb)))
                hit[b] += bool(ok)
        n_det = sum(len(v) for v in preds.values())
        results[size] = {
            "mAP@0.5": round(np.mean([aps["CAA"], aps["Cored"]]), 4),
            "AP_CAA": aps["CAA"], "AP_Cored": aps["Cored"],
            "detections": n_det,
            "recall_small": round(hit["small"] / max(tot["small"], 1), 4),
            "recall_medium": round(hit["medium"] / max(tot["medium"], 1), 4),
            "recall_large": round(hit["large"] / max(tot["large"], 1), 4),
            "wall_s_200_images": round(wall, 1),
            "img_per_s": round(200 / wall, 1),
            # pool-overflow observability: images whose conf-passing
            # candidate count exceeded nms_pool (=128 here).  Non-zero at a
            # larger size would mean recall there is capacity-truncated,
            # not model-limited — re-run with a bigger --capacity.
            "overflow_images": det.overflow_images,
            "max_candidates": det.max_candidates_seen,
        }
        print(f"size {size}: {json.dumps(results[size])}", flush=True)

    out = {"terciles_px": [round(float(t1), 1), round(float(t2), 1)],
           "n_gt_boxes": int(len(sides)), "ckpt": args.ckpt,
           "by_size": results}
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
