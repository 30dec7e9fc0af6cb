"""A/B the s2d downsample relabel at the batch-32 operating point.

Round-3 context (BENCH.md): at b16 the s2d relabel of the narrow-input
stride-2 downsample convs measured 4.5% SLOWER end-to-end (shipped
default-off).  The b32 trace shows the 3x3/s2 64->128 conv at 208^2 as
the single largest op with better amortization (1.32 ms/b32 vs 0.84
ms/b16 = 0.66 ms/b16-equivalent), so the knob deserves one measurement
at the new default batch before staying off.

Run alone (one JAX process).  Prints one JSON line per arm.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(det, inp, iters=30, repeats=2):
    import jax

    out = det._fn(det.params, inp)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = det._fn(det.params, inp)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main() -> int:
    import jax

    from amyloid_yolo_tpu.detectors import Detector

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    rng = np.random.RandomState(0)
    tiles = rng.randint(0, 255, (batch, 1536, 1536, 3)).astype(np.uint8)
    dev = jax.device_put(tiles)
    for s2d_down in (False, True):
        det = Detector(precision="int8_full", lazy_decode=True,
                       approx_topk=True, s2d_stem=True,
                       s2d_downsample=s2d_down)
        det.calibrate(tiles[:2])  # compiles the int8 pipeline
        t = measure(det, dev)
        print(json.dumps({"s2d_downsample": s2d_down, "batch": batch,
                          "ms_per_batch": round(t * 1e3, 3),
                          "tiles_per_s": round(batch / t, 1)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
