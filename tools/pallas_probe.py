"""TPU probe: is Mosaic compilation tractable on this box, and does the
fused residual-block kernel beat XLA's unfused lowering?

Measures, for the real backbone shapes (batch 16):
  1. wall-clock Mosaic compile time of the fused block kernel;
  2. steady-state runtime of the fused kernel vs the XLA 3-op block.

Run on the TPU box: ``python tools/pallas_probe.py [shape ...]``.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from amyloid_yolo_tpu.models.darknet import _conv, _leaky
    from amyloid_yolo_tpu.pallas.conv_block import (
        fused_residual_block,
        pack_block_weights,
    )

    print(f"devices: {jax.devices()}", file=sys.stderr)

    @jax.jit
    def xla_block(x, w1, b1, w2, b2):
        h = _leaky(_conv(x, w1, 1, 0, widen_output=False) + b1)
        y = _leaky(_conv(h, w2, 1, 1, widen_output=False) + b2)
        return x + y

    def bench(fn, x, *args, iters=50):
        # The axon relay resolves block_until_ready at remote-enqueue time,
        # not device completion; only a data fetch forces execution.  So:
        # chain the output into the next input (forces sequential device
        # work), end with a scalar fetch, and take the N→2N slope to cancel
        # the fixed fetch/queue overhead.
        def run(n):
            cur = x
            t0 = time.perf_counter()
            for _ in range(n):
                cur = fn(cur, *args)
            float(jnp.sum(cur))
            return time.perf_counter() - t0

        run(3)
        best = float("inf")
        for _ in range(2):
            t1 = run(iters)
            t2 = run(2 * iters)
            best = min(best, (t2 - t1) / iters)
        return best

    rng = np.random.RandomState(0)
    # (H, C) for the residual stages in the HBM-bound region
    shapes = [(int(a), int(c)) for a, c in
              (s.split(",") for s in sys.argv[1:])] or \
             [(104, 128), (52, 256), (208, 64)]
    b = 16
    for hh, c in shapes:
        c2 = c // 2
        x = jnp.asarray(rng.randn(b, hh, hh, c).astype(np.float32) * 0.5
                        ).astype(jnp.bfloat16)
        w1 = (0.1 * rng.randn(1, 1, c, c2)).astype(np.float32)
        b1 = 0.01 * rng.randn(c2).astype(np.float32)
        w2 = (0.1 * rng.randn(3, 3, c2, c)).astype(np.float32)
        b2 = 0.01 * rng.randn(c).astype(np.float32)
        packed = pack_block_weights(w1, b1, w2, b2)

        t0 = time.perf_counter()
        out = fused_residual_block(x, *packed)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0

        t_fused = bench(fused_residual_block, x, *packed)

        args = (x, jnp.asarray(w1).astype(jnp.bfloat16),
                jnp.asarray(b1).astype(jnp.bfloat16),
                jnp.asarray(w2).astype(jnp.bfloat16),
                jnp.asarray(b2).astype(jnp.bfloat16))
        t_xla = bench(xla_block, *args)

        want = xla_block(*args)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - want.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(want.astype(jnp.float32)))) + 1e-9
        print(f"{hh}^2 x{c}: mosaic_compile {compile_s:.1f}s  "
              f"fused {t_fused*1e3:.2f} ms  xla {t_xla*1e3:.2f} ms  "
              f"speedup {t_xla/t_fused:.2f}x  rel_err {err/scale:.2e}")


if __name__ == "__main__":
    main()
