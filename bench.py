"""Benchmark of record: 1536px WSI tiles/sec/chip at batch 32.

Measures the flagship compiled pipeline as one jitted device program:

    uint8 1536² tiles (device-resident)
      → on-device nearest 1536→416 + /255
      → Darknet-53/YOLOv3 (full-graph int8, bf16 head convs, by default)
      → lazy score→top-k→sparse anchor decode
      → class-aware merging NMS → tile-space boxes

Methodology (and what each printed line means):

* **Headline (stdout JSON)**: steady-state throughput of the full device
  pipeline with device-resident 1536² uint8 input — every stage including
  the 1536→416 gather runs on-chip in the timed loop.  Configuration is
  the fastest gated stack (``precision=int8_full`` — whole-graph int8 with
  the RGB stem and head convs in bf16 — + lazy sparse decode + approx
  top-k), accuracy-gated on the 200 real prospective images (mAP@0.5 ≥ the
  bf16 parity pipeline's; see BENCH.md gate tables /
  ``tools/fastpath_gate.py``).  Note the CLI's ``--fast_path`` ships the
  more conservative ``int8_early, int8_downsample=32`` stack; set
  ``--precision int8_full`` there to match this headline.  Set
  ``BENCH_PRECISION=bf16 BENCH_LAZY=0 BENCH_APPROX=0`` for the box-for-box
  parity pipeline.  Measured over ``BENCH_ITERS`` dispatches × 2
  repetitions (best), blocked at the end.  Batch 32 is the measured
  per-chip optimum (round-3 sweep, same stack: b16 2056.6 / b32 2340.4 /
  b64 2269.0 tiles/s — BENCH.md "Batch operating point"); inference BN
  uses static stats, so per-tile numerics are batch-invariant and the
  accuracy gate carries over.  ``BENCH_BATCH=16`` reproduces the
  round-1/2 operating point.
* **Diagnostics (stderr)**: the bf16 parity pipeline, the host-resized
  (416² input) variant, and host-fed streaming through this dev harness's
  ~35 MB/s TPU tunnel (link-bound; a production PCIe host moves the 416²
  uint8 feed in ~1 ms).

``vs_baseline`` compares against an estimated reference throughput of 30
tiles/sec (PyTorch YOLOv3-416 on the reference's GTX 1080 at batch 8,
derated for its host-side NMS/preprocess — the reference's own run-time
pickles are git-LFS stubs, ``validation.py:282-366``).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_TILES_PER_SEC = 30.0


def measure(det, inp, iters=40, reps=2):
    import jax

    out = det._fn(det.params, inp)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        for _ in range(3):
            out = det._fn(det.params, inp)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = det._fn(det.params, inp)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/amyolo_jax_cache")

    from amyloid_yolo_tpu.detectors import Detector
    from amyloid_yolo_tpu.ops.preprocess import nearest_indices

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "30"))
    precision = os.environ.get("BENCH_PRECISION", "int8_full")
    int8_ds = int(os.environ.get("BENCH_INT8_DS", "32"))
    # lazy sparse decode + approx top-k: bit-identical / gate-passing fast
    # paths (BENCH.md "approx top-k", tools/fastpath_gate.py)
    lazy = os.environ.get("BENCH_LAZY", "1") == "1"
    approx = os.environ.get("BENCH_APPROX", "1") == "1"
    # space-to-depth stem (round 3): same math as layers 0-1, MXU-shaped
    s2d = os.environ.get("BENCH_S2D", "1") == "1"
    # deep-stage int32 accumulation for int8_full convs (0 = bf16 accum
    # everywhere, the gated default; 26 measured a wash end-to-end)
    i32_hw = int(os.environ.get("BENCH_I32DEEP_HW", "0"))
    fast_kw = dict(lazy_decode=lazy, approx_topk=approx,
                   s2d_stem=s2d and precision != "int8_early",
                   int32_accum_max_hw=i32_hw)

    rng = np.random.RandomState(0)
    tiles = rng.randint(0, 255, (batch, 1536, 1536, 3)).astype(np.uint8)
    idx = nearest_indices(416, 1536)
    small = np.ascontiguousarray(tiles[:, idx][:, :, idx])

    # headline: full device pipeline, device-resident 1536² input
    det = Detector(precision=precision, int8_downsample=int8_ds, **fast_kw)
    if precision != "bf16":
        det.calibrate(tiles[:2])
    dev_tiles = jax.device_put(tiles)
    t_head = measure(det, dev_tiles, iters, 2)
    chip_tps = batch / t_head

    # Second metric of record: the box-for-box parity pipeline (bf16 dense
    # semantics; lazy sparse decode is the default — bit-identical by
    # construction and by gate, detectors.py).  JSON line printed BEFORE
    # the headline so the headline stays the last line for the driver.
    det_bf16 = Detector()
    t_bf16 = measure(det_bf16, dev_tiles, iters, 1)
    parity_tps = batch / t_bf16
    print(f"# bf16 parity pipeline (device-resize): {parity_tps:.0f} tiles/s",
          file=sys.stderr)
    print(json.dumps({
        "metric": f"wsi_tiles_per_sec_per_chip_1536px_b{batch}_bf16_parity",
        "value": round(parity_tps, 2),
        "unit": "tiles/s",
        "vs_baseline": round(parity_tps / BASELINE_TILES_PER_SEC, 2),
    }))
    det_hr = Detector(host_resize=True, precision=precision,
                      int8_downsample=int8_ds, **fast_kw)
    if precision != "bf16":
        det_hr.calibrate(small)
    t_hr = measure(det_hr, jax.device_put(small), iters, 1)
    print(f"# host-resized 416² input variant: {batch / t_hr:.0f} tiles/s",
          file=sys.stderr)

    n_stream = max(4, iters // 6)
    bufs = [np.ascontiguousarray(small + i) for i in range(2)]
    t0 = time.perf_counter()
    for i in range(n_stream):
        out = det_hr(bufs[i % 2])
    jax.block_until_ready(out)
    stream_tps = batch * n_stream / (time.perf_counter() - t0)
    print(f"# host-fed streaming through harness tunnel: {stream_tps:.1f} "
          f"tiles/s (link-bound; see bench.py docstring)", file=sys.stderr)

    print(json.dumps({
        "metric": f"wsi_tiles_per_sec_per_chip_1536px_b{batch}",
        "value": round(chip_tps, 2),
        "unit": "tiles/s",
        "vs_baseline": round(chip_tps / BASELINE_TILES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
