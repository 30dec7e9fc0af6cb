"""Accuracy gate + host-throughput measurement for background-tile
suppression (``amyloid_yolo_tpu.io.tissue``; r3 verdict #1 done-criteria).

Three parts, one process:

1. **Real-tile gate (200 prospective images)** — the prefilter may skip
   ZERO tiles that contain any conf≥0.8 detection.  Detections come from a
   trained checkpoint (``--ckpt``, runs the TPU detector) or, without one,
   from the published consensus annotations
   (``/root/reference/prospective_annotations/consensus_annotations.pkl``,
   520 expert-confirmed boxes over the same 200 tiles) — a *stricter*
   stand-in, since every annotated plaque must sit on a kept tile
   regardless of model confidence.
2. **Edge-case gate (synthetic WSI)** — real detection-bearing tiles are
   pasted into a large scanner-background canvas at positions straddling
   the 1536-tile grid, so detections land within pixels of tile borders;
   after tiling (crop-time suppression ON) and prefiltering the written
   tree (sweep-time), every tile overlapping any detection box must
   survive both levers.
3. **Throughput** — host-side decode sweep over a synthetic tree at a
   realistic background fraction (default 70% — production CERAD slides
   are majority glass): wall-clock for decode-everything vs
   prefilter-then-decode-kept, single core.

Writes ``background_gate/gate_summary.json`` and exits non-zero if any
gated tile would have been skipped.

Usage (run alone; the --ckpt path compiles on the TPU)::

    python tools/background_gate.py                    # annotation gate
    python tools/background_gate.py --ckpt <orbax_dir> # detection gate
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

REF_IMAGES = "/root/reference/prospective_validation_images"
REF_CONSENSUS = ("/root/reference/prospective_annotations/"
                 "consensus_annotations.pkl")
TILE = 1536


def consensus_boxes() -> dict:
    """image filename -> list of (x1, y1, x2, y2) in tile pixel space."""
    with open(REF_CONSENSUS, "rb") as fh:
        ann = pickle.load(fh)
    out = {}
    for name, entries in ann.items():
        out[name] = [(e[0]["x1"], e[0]["y1"], e[0]["x2"], e[0]["y2"])
                     for e in entries]
    return out


def detector_boxes(ckpt: str, folder: str, model_def: str = None,
                   model_size: int = 416) -> dict:
    """conf>=0.8 detections per image from a trained checkpoint (the
    reference operating point, README.md:39)."""
    from amyloid_yolo_tpu.detectors import Detector
    from amyloid_yolo_tpu.graphspec import from_cfg, yolov3_spec
    from amyloid_yolo_tpu.io import weights as W

    spec = from_cfg(model_def) if model_def else yolov3_spec(num_classes=2)
    params = W.load_pretrained(spec, ckpt)
    det = Detector(spec, params, conf_thres=0.8, nms_thres=0.4,
                   model_size=model_size, host_resize=True)
    results = det.detect_folder(folder, batch_size=16, merge_boxes=True)
    out = {}
    for path, rows in results.items():
        name = os.path.basename(path)
        out[name] = ([] if rows is None else
                     [(r[0], r[1], r[2], r[3]) for r in np.asarray(rows)])
    return out


def gate_real_tiles(boxes_by_image: dict, args) -> dict:
    """Part 1: no detection-bearing real tile may be background-classified."""
    from amyloid_yolo_tpu.io.tissue import is_background_file, tissue_fraction

    bad, skipped, fracs, sizes = [], [], [], []
    for name in sorted(os.listdir(REF_IMAGES)):
        p = os.path.join(REF_IMAGES, name)
        sizes.append(os.path.getsize(p))
        is_bg = is_background_file(p, args.max_bpp, args.min_tissue)
        if is_bg:
            skipped.append(name)
            if boxes_by_image.get(name):
                bad.append(name)
    # distribution (decode a subsample for the report; full decode of 200
    # tiles is ~8s/core)
    from PIL import Image

    for name in sorted(os.listdir(REF_IMAGES))[::10]:
        with Image.open(os.path.join(REF_IMAGES, name)) as im:
            im.draft("RGB", (im.size[0] // 8, im.size[1] // 8))
            fracs.append(tissue_fraction(np.asarray(im.convert("RGB")), 1))
    n_with = sum(1 for v in boxes_by_image.values() if v)
    return {
        "n_images": 200,
        "n_with_detections": n_with,
        "skipped": skipped,
        "violations": bad,
        "file_size_min": min(sizes), "file_size_median": int(np.median(sizes)),
        "tissue_fraction_min_sampled": round(min(fracs), 4),
        "tissue_fraction_p50_sampled": round(float(np.median(fracs)), 4),
    }


def _scanner_background(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    base = 242 + 6 * np.sin(yy / 997.0) + 4 * np.cos(xx / 613.0)
    return np.clip(np.stack([base, base, base - 2], -1), 0, 255).astype(np.uint8)


def gate_synthetic_edges(boxes_by_image: dict, args, out_dir: str) -> dict:
    """Part 2: detections straddling tile borders survive BOTH levers."""
    from amyloid_yolo_tpu.io.datasets import load_image_rgb
    from amyloid_yolo_tpu.io.tiles import tile_image_array, tile_origin
    from amyloid_yolo_tpu.io.tissue import prefilter_tile_paths

    rng = np.random.RandomState(0)
    donors = [n for n, b in sorted(boxes_by_image.items()) if b][:6]
    grid = 4  # 4x4 tile canvas
    canvas = _scanner_background(grid * TILE, grid * TILE)
    det_boxes = []  # slide-space
    # paste donors OFFSET BY HALF A TILE so their annotated boxes straddle
    # the canvas's tile grid lines
    for i, name in enumerate(donors):
        img = load_image_rgb(os.path.join(REF_IMAGES, name))[:TILE, :TILE]
        ox = (i % 3) * TILE + TILE // 2
        oy = (i // 3) * TILE + TILE // 2
        canvas[oy:oy + TILE, ox:ox + TILE] = img
        for (x1, y1, x2, y2) in boxes_by_image[name]:
            det_boxes.append((x1 + ox, y1 + oy, x2 + ox, y2 + oy))

    def tiles_touching(box):
        x1, y1, x2, y2 = box
        cols = range(int(x1 // TILE), int(min(x2, grid * TILE - 1) // TILE) + 1)
        rows = range(int(y1 // TILE), int(min(y2, grid * TILE - 1) // TILE) + 1)
        return {(r, c) for r in rows for c in cols}

    must_keep = set()
    edge_straddlers = 0
    for b in det_boxes:
        t = tiles_touching(b)
        if len(t) > 1:
            edge_straddlers += 1
        must_keep |= t

    # crop-time lever
    skipped_crop = []
    tile_image_array(canvas, out_dir, "synthetic_crop", tile_size=TILE,
                     min_tissue_fraction=args.min_tissue,
                     skipped_out=skipped_crop)
    crop_violations = sorted(set(skipped_crop) & must_keep)
    # sweep-time lever, exercised INDEPENDENTLY: prefilter a tree written
    # with suppression OFF (i.e. the reference's every-tile tree)
    paths = tile_image_array(canvas, out_dir, "synthetic_full", tile_size=TILE)
    kept, skipped = prefilter_tile_paths(paths, args.max_bpp, args.min_tissue)
    sweep_violations = sorted(
        {(int(oy // TILE), int(ox // TILE))
         for p in skipped
         for ox, oy in [tile_origin(p, TILE)]} & must_keep)
    return {
        "canvas_tiles": grid * grid,
        "detection_boxes": len(det_boxes),
        "edge_straddling_boxes": edge_straddlers,
        "must_keep_tiles": len(must_keep),
        "crop_skipped": len(skipped_crop),
        "sweep_skipped": len(skipped),
        "crop_violations": crop_violations,
        "sweep_violations": sweep_violations,
    }


def measure_throughput(args, tree_dir: str, background_fraction=0.7,
                       n_tiles=60) -> dict:
    """Part 3: single-core decode sweep, all vs prefiltered."""
    from PIL import Image

    from amyloid_yolo_tpu.io.datasets import load_image_rgb
    from amyloid_yolo_tpu.io.tissue import prefilter_tile_paths

    os.makedirs(tree_dir, exist_ok=True)
    donors = sorted(os.listdir(REF_IMAGES))[:12]
    n_bg = int(n_tiles * background_fraction)
    paths = []
    for i in range(n_tiles):
        p = os.path.join(tree_dir, f"{i:03d}.jpg")
        if not os.path.exists(p):
            if i < n_bg:
                img = _scanner_background(TILE, TILE, seed=i)
            else:
                img = load_image_rgb(
                    os.path.join(REF_IMAGES, donors[i % len(donors)]))
            Image.fromarray(img).save(p, quality=90)
        paths.append(p)

    def decode_all(ps):
        t0 = time.perf_counter()
        for p in ps:
            np.asarray(Image.open(p).convert("RGB")).sum()  # touch pixels
        return time.perf_counter() - t0

    t_all = decode_all(paths)
    t0 = time.perf_counter()
    kept, skipped = prefilter_tile_paths(paths, args.max_bpp, args.min_tissue)
    t_filter = time.perf_counter() - t0
    t_kept = decode_all(kept)
    return {
        "n_tiles": n_tiles,
        "background_fraction": background_fraction,
        "skipped": len(skipped),
        "decode_all_s": round(t_all, 2),
        "prefilter_s": round(t_filter, 2),
        "prefilter_plus_decode_kept_s": round(t_filter + t_kept, 2),
        "tiles_per_s_before": round(n_tiles / t_all, 2),
        "tiles_per_s_after": round(n_tiles / (t_filter + t_kept), 2),
        "speedup": round(t_all / (t_filter + t_kept), 2),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=str, default=None,
                    help="trained orbax/pth checkpoint: gate on conf>=0.8 "
                         "detections (TPU); default gates on the published "
                         "consensus annotations")
    ap.add_argument("--model_def", type=str, default=None,
                    help="darknet cfg the checkpoint was trained with "
                         "(re-anchored checkpoints decode garbage under "
                         "the default COCO anchor table)")
    ap.add_argument("--model_size", type=int, default=416,
                    help="detector input side for the --ckpt gate")
    ap.add_argument("--max_bpp", type=float, default=None)
    ap.add_argument("--min_tissue", type=float, default=None)
    ap.add_argument("--out", type=str, default="background_gate")
    ap.add_argument("--skip-throughput", action="store_true")
    args = ap.parse_args()
    from amyloid_yolo_tpu.io import tissue as T

    if args.max_bpp is None:
        args.max_bpp = T.BACKGROUND_MAX_BPP
    if args.min_tissue is None:
        args.min_tissue = T.TISSUE_MIN_FRACTION

    os.makedirs(args.out, exist_ok=True)
    if args.ckpt:
        boxes = detector_boxes(args.ckpt, REF_IMAGES,
                               model_def=args.model_def,
                               model_size=args.model_size)
        source = f"detector conf>=0.8 ({args.ckpt})"
    else:
        boxes = consensus_boxes()
        source = "consensus annotations (520 boxes)"

    summary = {
        "source": source,
        "max_bpp": args.max_bpp,
        "min_tissue": args.min_tissue,
        "real_tiles": gate_real_tiles(boxes, args),
        "synthetic_edges": gate_synthetic_edges(
            boxes, args, os.path.join(args.out, "synthetic_wsi")),
    }
    if not args.skip_throughput:
        summary["throughput"] = measure_throughput(
            args, os.path.join(args.out, "throughput_tree"))

    with open(os.path.join(args.out, "gate_summary.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary, indent=2))
    ok = (not summary["real_tiles"]["violations"]
          and not summary["synthetic_edges"]["crop_violations"]
          and not summary["synthetic_edges"]["sweep_violations"])
    print("GATE:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
