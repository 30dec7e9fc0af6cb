"""Accuracy gate for the non-parity fast paths (approx_topk / lazy_decode /
int8_early) on the 200 real prospective-validation images.

For each variant, runs the full detect pipeline (preprocess → model →
decode → NMS → rescale → reference union-merge) over
``/root/reference/prospective_validation_images`` with a trained
checkpoint and compares the post-merge detections BOX-FOR-BOX against the
bf16 exact pipeline (the parity path), then scores both against the
published consensus-of-2 annotations (mAP@0.5 via the study protocol,
``prospective.py:126-249`` equivalents).

Also prints a device timing table (ms/batch at batch 16, 416² resident
input) for the same variants in the same process.

Usage:
    python tools/fastpath_gate.py --ckpt checkpoints_r2/yolov3_ckpt_60 \
        [--out fastpath_gate] [--skip-timing]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMAGES = "/root/reference/prospective_validation_images"
CONSENSUS = "/root/reference/prospective_annotations/consensus_annotations.pkl"

VARIANTS = [
    # tag, Detector kwargs (beyond the shared operating point)
    ("bf16_exact", {}),
    ("bf16_approx", {"approx_topk": True}),
    ("bf16_lazy", {"lazy_decode": True}),
    ("bf16_lazy_approx", {"lazy_decode": True, "approx_topk": True}),
    ("int8ds32_lazy_approx", {"precision": "int8_early",
                              "int8_downsample": 32,
                              "lazy_decode": True, "approx_topk": True}),
    ("int8full_lazy_approx", {"precision": "int8_full",
                              "lazy_decode": True, "approx_topk": True}),
    # round-3 bench headline stack: + space-to-depth stem
    ("int8full_s2d_lazy_approx", {"precision": "int8_full", "s2d_stem": True,
                                  "lazy_decode": True, "approx_topk": True}),
    ("bf16_s2d", {"s2d_stem": True}),
]


def _rows(dets: list) -> list:
    """[(coord_dict, cls_name), ...] → sorted list of 7-float tuples."""
    keys = ("x1", "y1", "x2", "y2", "conf", "cls_conf", "cls_pred")
    return sorted(tuple(float(d[k]) for k in keys) for d, _ in dets)


def compare_preds(ref: dict, var: dict) -> dict:
    """Box-for-box diff of two run_model_on_validation_images outputs."""
    assert set(ref) == set(var)
    n_same = 0
    max_delta = 0.0
    n_ref = n_var = 0
    diff_images = []
    for k in ref:
        a, b = _rows(ref[k]), _rows(var[k])
        n_ref += len(a)
        n_var += len(b)
        if len(a) != len(b):
            diff_images.append(k)
            continue
        same = True
        for ra, rb in zip(a, b):
            d = max(abs(x - y) for x, y in zip(ra, rb))
            max_delta = max(max_delta, d)
            if d > 1.0:  # > 1 tile pixel: call it a differing image
                same = False
        if same:
            n_same += 1
        else:
            diff_images.append(k)
    return {
        "images_identical": n_same,
        "images_total": len(ref),
        "dets_ref": n_ref,
        "dets_var": n_var,
        "max_coord_delta_matched": round(max_delta, 4),
        "differing_images": diff_images[:8],
    }


def map_at(preds: dict, consensus: dict, out_dir: str, tag: str) -> float:
    import pandas as pd

    from amyloid_yolo_tpu.analysis.prospective import (
        average_precision_from_table, compare_annotations_to_predictions,
    )

    compare_annotations_to_predictions(
        consensus, preds, 0.5, annotator=tag, val_type="prospective",
        prc_dir=os.path.join(out_dir, "PRC_tables"),
        precision_maps_dir=None)
    aps = []
    for cls in ("CAA", "Cored"):
        t = pd.read_csv(os.path.join(
            out_dir, "PRC_tables",
            f"prospective_PRC_table_{tag}_iou_0.5_{cls}.csv"))
        aps.append(average_precision_from_table(t))
    return float(np.mean(aps))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--model-def", default=None,
                    help="darknet cfg the checkpoint was trained with "
                         "(required for re-anchored checkpoints)")
    ap.add_argument("--model-size", type=int, default=416)
    ap.add_argument("--out", default="fastpath_gate")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--skip-timing", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/amyolo_jax_cache")

    import pickle

    from amyloid_yolo_tpu.analysis.prospective import (
        run_model_on_validation_images,
    )
    from amyloid_yolo_tpu.detectors import Detector
    from amyloid_yolo_tpu.graphspec import from_cfg, yolov3_spec
    from amyloid_yolo_tpu.io import weights as W

    os.makedirs(args.out, exist_ok=True)
    spec = (from_cfg(args.model_def) if args.model_def
            else yolov3_spec(num_classes=2))
    params = W.load_ckpt_params(args.ckpt)  # accepts <dir>#ema
    with open(CONSENSUS, "rb") as fh:
        consensus = pickle.load(fh)

    results = {}
    all_preds = {}
    for tag, kw in VARIANTS:
        det = Detector(spec, params, conf_thres=0.8, nms_thres=0.4,
                       model_size=args.model_size, host_resize=True, **kw)
        t0 = time.time()
        preds = run_model_on_validation_images(
            det, IMAGES, os.path.join(args.out, f"preds_{tag}.pkl"),
            caa_filter=None, merge=True, batch_size=args.batch_size)
        all_preds[tag] = preds
        row = {"n_detections": sum(len(v) for v in preds.values()),
               "mAP@0.5_vs_consensus": round(
                   map_at(preds, consensus, args.out, tag), 4),
               "wall_s": round(time.time() - t0, 1)}
        if tag != "bf16_exact":
            row["vs_bf16_exact"] = compare_preds(all_preds["bf16_exact"],
                                                 preds)
        results[tag] = row
        print(f"[{tag}] {json.dumps(row)}", flush=True)

    if not args.skip_timing:
        from bench import measure

        rng = np.random.RandomState(0)
        small = jax.device_put(rng.randint(
            0, 255, (16, args.model_size, args.model_size, 3)
        ).astype(np.uint8))
        timing = {}
        for tag, kw in VARIANTS + [
                ("int8ds32_exact", {"precision": "int8_early",
                                    "int8_downsample": 32}),
                ("int8ds32_lazy", {"precision": "int8_early",
                                   "int8_downsample": 32,
                                   "lazy_decode": True})]:
            det = Detector(spec, params, conf_thres=0.8, nms_thres=0.4,
                           model_size=args.model_size, host_resize=True,
                           **kw)
            if det.precision.startswith("int8"):
                det.calibrate(np.asarray(small))
            ms = measure(det, small) * 1e3
            timing[tag] = round(ms, 2)
            print(f"[timing] {tag}: {ms:.2f} ms/batch "
                  f"({16 / ms * 1e3:.0f} tiles/s)", flush=True)
        results["timing_ms_per_batch16"] = timing

    with open(os.path.join(args.out, "gate_summary.json"), "w") as fh:
        json.dump(results, fh, indent=1, default=str)
    print(json.dumps({k: v for k, v in results.items()}, default=str),
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
