"""A/B: full inference pipeline with XLA residual blocks vs fused Pallas
residual blocks (104²/52²/26²/13² stages), bench.py methodology.

The relay's per-dispatch host cost (~1.7 ms) makes sub-ms kernels
unmeasurable in isolation; the full pipeline (~10 ms/batch) amortizes it,
and a jax.profiler trace provides device-time ground truth.

Run: ``python tools/pallas_pipeline_ab.py [trace]``
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


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
    import jax.numpy as jnp

    from amyloid_yolo_tpu.detectors import Detector

    trace = "trace" in sys.argv[1:]
    rng = np.random.RandomState(0)
    batch = 16
    tiles416 = jnp.asarray(
        rng.randint(0, 255, (batch, 416, 416, 3)).astype(np.uint8))

    results = {}
    for name, kw in [("bf16", {}), ("bf16+pallas", {"pallas_blocks": True})]:
        t0 = time.perf_counter()
        det = Detector(host_resize=True, precision="bf16", **kw)
        ms = measure(det, tiles416)
        results[name] = ms
        print(f"{name}: {ms*1e3:.2f} ms/batch -> {batch/ms:.0f} tiles/s "
              f"(compile+measure {time.perf_counter()-t0:.0f}s)", flush=True)
        if trace:
            with jax.profiler.trace(f"/tmp/ab_trace_{name.replace('+','_')}"):
                for _ in range(8):
                    out = det._fn(det.params, tiles416)
                jax.block_until_ready(out)
    print(f"speedup: {results['bf16']/results['bf16+pallas']:.3f}x")


if __name__ == "__main__":
    main()
