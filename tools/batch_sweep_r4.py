"""Batch operating-point sweep for the round-4 headline stack.

Round 3 swept b16/b32/b64 (2056.6/2340.4/2269.0 tiles/s) and picked b32;
b48 was never measured, and the round-4 stack (48-tile-calib int8_full +
s2d stem + lazy sparse decode + approx top-k) differs from the r3 sweep
config.  One process, device-resident 1536² uint8 input, same methodology
as ``bench.py:measure`` (best of reps, blocked at the end).

Usage:  python tools/batch_sweep_r4.py [--batches 32,48,64] [--iters 30]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# the benchmark-of-record timing loop, imported so the sweep can never
# drift from bench.py methodology (r4 advisor, low)
from bench import measure  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,48,64")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--precision", default="int8_full")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/amyolo_jax_cache")
    from amyloid_yolo_tpu.detectors import Detector

    batches = [int(b) for b in args.batches.split(",")]
    rng = np.random.RandomState(0)
    tiles = rng.randint(0, 255, (max(batches), 1536, 1536, 3)).astype(np.uint8)

    results = {}
    for b in batches:
        det = Detector(precision=args.precision, int8_downsample=32,
                       lazy_decode=True, approx_topk=True, s2d_stem=True)
        if args.precision != "bf16":
            det.calibrate(tiles[:2])
        dev = jax.device_put(tiles[:b])
        t = measure(det, dev, args.iters)
        results[b] = b / t
        print(f"b{b}: {t * 1e3:.2f} ms/batch = {b / t:.1f} tiles/s",
              file=sys.stderr, flush=True)
        del det, dev

    print(json.dumps({f"b{b}": round(v, 1) for b, v in results.items()}))


if __name__ == "__main__":
    main()
