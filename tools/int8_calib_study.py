"""int8_full calibration sensitivity on the 200 real prospective images.

Round-4 finding (``fastpath_gate_r4``): on the r4p2 checkpoint the
``int8_full`` stack gates BELOW the bf16 parity pipeline (mAP@0.5 0.657
vs 0.675) while ``int8_early`` gates above it (0.693) — the first
checkpoint where whole-graph quantization visibly costs accuracy.  The
suspects are the calibration statistic (amax lets one outlier widen a
whole layer's grid) and the calibration sample (the gate calibrates
lazily on the FIRST batch of 8 tiles only).

This tool measures both axes on a trained checkpoint:

* calibration sample size: first 8 vs first 48 tiles (accumulated
  batch-wise, max-combined — ``Detector.calibrate(accumulate=True)``);
* scale statistic: amax (percentile 100) vs 99.99 / 99.9 / 99.0
  percentiles of |activations| (``darknet._act_stat``; outliers saturate
  at ±127 — both quantizers clip, so tighter grids trade range for
  resolution).

Each config runs the full study-protocol pipeline (conf .8, merged) over
the 200 images: mAP@0.5 vs consensus + box-for-box diff vs the bf16
exact pipeline.  Reference anchor: the quantization trade has no
reference counterpart (fp32 GPU, ``validation.py:30-175``); the gate
contract is "fast paths must not lose accuracy" (BENCH.md gate tables).

Usage (TPU, run alone):
    python tools/int8_calib_study.py --ckpt checkpoints_r4_p2/yolov3_ckpt_41 \
        [--out bench_artifacts/int8_calib_study_r4.json]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

import numpy as np

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)

from fastpath_gate import CONSENSUS, IMAGES, compare_preds, map_at  # noqa: E402

# (tag, percentile, n_calibration_tiles)
CONFIGS = [
    ("amax_c8", 100.0, 8),      # status quo: lazy first-batch calibration
    ("amax_c48", 100.0, 48),
    ("p9999_c48", 99.99, 48),
    ("p999_c48", 99.9, 48),
    ("p99_c48", 99.0, 48),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", default="bench_artifacts/int8_calib_study.json")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--ref-preds", default="fastpath_gate_r4/preds_bf16_exact.pkl",
                    help="bf16 exact predictions pickle (computed if missing)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/amyolo_jax_cache")

    from amyloid_yolo_tpu.analysis.prospective import (
        run_model_on_validation_images)
    from amyloid_yolo_tpu.detectors import Detector
    from amyloid_yolo_tpu.graphspec import yolov3_spec
    from amyloid_yolo_tpu.io import weights as W
    from amyloid_yolo_tpu.io.datasets import ImageFolder

    spec = yolov3_spec(num_classes=2)
    params = W.load_ckpt_params(args.ckpt)  # accepts <dir>#ema
    with open(CONSENSUS, "rb") as fh:
        consensus = pickle.load(fh)

    os.makedirs("/tmp/calib_study", exist_ok=True)

    # bf16 exact reference predictions (box-for-box diff target)
    if os.path.exists(args.ref_preds):
        with open(args.ref_preds, "rb") as fh:
            ref_preds = pickle.load(fh)
        print(f"bf16 reference preds: {args.ref_preds}", flush=True)
    else:
        det = Detector(spec, params, conf_thres=0.8, nms_thres=0.4,
                       host_resize=True)
        ref_preds = run_model_on_validation_images(
            det, IMAGES, "/tmp/calib_study/preds_bf16.pkl",
            merge=True, batch_size=args.batch_size)

    # deterministic calibration tiles: first N files, host-resized 416²
    folder = ImageFolder(IMAGES, tile_size=1536, resize_to=416)
    calib_batches = []
    need = max(k for _, _, k in CONFIGS)
    for _, batch, n_valid in folder.iter_batches(args.batch_size):
        calib_batches.append(np.asarray(batch)[:n_valid])
        if sum(len(b) for b in calib_batches) >= need:
            break

    results = {"ckpt": args.ckpt,
               "bf16_exact_mAP": round(map_at(ref_preds, consensus,
                                              "/tmp/calib_study", "bf16"), 4)}
    for tag, pct, k in CONFIGS:
        det = Detector(spec, params, conf_thres=0.8, nms_thres=0.4,
                       host_resize=True, precision="int8_full",
                       lazy_decode=True, approx_topk=True,
                       calib_percentile=pct)
        used, t0 = 0, time.time()
        batches = []
        for b in calib_batches:
            take = min(len(b), k - used)
            if take <= 0:
                break
            batches.append(b[:take])
            used += take
        for b in batches[:-1]:
            det.calibrate(b, accumulate=True, rebuild=False)
        det.calibrate(batches[-1], accumulate=True)
        preds = run_model_on_validation_images(
            det, IMAGES, f"/tmp/calib_study/preds_{tag}.pkl",
            merge=True, batch_size=args.batch_size)
        row = {"percentile": pct, "calib_tiles": used,
               "n_detections": sum(len(v) for v in preds.values()),
               "mAP@0.5_vs_consensus": round(
                   map_at(preds, consensus, "/tmp/calib_study", tag), 4),
               "vs_bf16_exact": compare_preds(ref_preds, preds),
               "wall_s": round(time.time() - t0, 1)}
        results[tag] = row
        print(f"[{tag}] mAP {row['mAP@0.5_vs_consensus']} "
              f"dets {row['n_detections']} "
              f"identical {row['vs_bf16_exact']['images_identical']}/200",
              flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
