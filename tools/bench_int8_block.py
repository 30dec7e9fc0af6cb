"""A/B: strip-mined fused int8 residual block (Pallas) vs the XLA int8
path, on the real chip, at the backbone shapes the trace attributes the
remaining time to (BENCH.md "Trace attribution").

Per CLAUDE.md, Mosaic remote compiles are minutes each — this tool batches
every variant into ONE process and timing uses chained outputs + a scalar
fetch (relay enqueue-ack pitfall).

Run ON TPU:  python tools/bench_int8_block.py [--iters 30] [--batch 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--chain", type=int, default=24,
                    help="block applications chained inside one dispatch")
    ap.add_argument("--shapes", nargs="*", default=None,
                    help="H,C,C2,strip tuples, e.g. 104,128,64,26")
    args = ap.parse_args()

    import functools
    import jax
    import jax.numpy as jnp
    from amyloid_yolo_tpu.pallas.int8_block import (
        fused_residual_block_int8, pack_int8_block, reference_block_int8,
        _leaky, _requant)

    shapes = args.shapes or ["104,128,64,26", "52,256,128,26",
                             "26,512,256,26", "13,1024,512,13"]
    rng = np.random.RandomState(0)
    B = args.batch
    K = args.chain

    for spec in shapes:
        H, C, C2, strip = map(int, spec.split(","))
        w1q = rng.randint(-127, 128, (1, 1, C, C2)).astype(np.int8)
        w2q = rng.randint(-127, 128, (3, 3, C2, C)).astype(np.int8)
        ws1 = rng.uniform(1e-3, 2e-2, C2).astype(np.float32)
        ws2 = rng.uniform(1e-3, 2e-2, C).astype(np.float32)
        b1 = rng.uniform(-1, 1, C2).astype(np.float32)
        b2 = rng.uniform(-1, 1, C).astype(np.float32)
        w1p, a1p, b1p, w2p, a2p, b2p = pack_int8_block(
            w1q, ws1, b1, w2q, ws2, b2)
        sx, s1, s_out = 0.011, 0.017, 0.023
        a1p = a1p * sx
        a2p = a2p * s1
        xq = jnp.asarray(rng.randint(-127, 128, (B, H, H, C)).astype(np.int8))
        gflop = (H * H * C * C2 * 2 + H * H * C2 * C * 9 * 2) * B / 1e9

        def ref_int32(x):
            return reference_block_int8(x, w1p, a1p, b1p, w2p, a2p, b2p,
                                        sx=sx, s1=s1, s_out=s_out)

        def prod_block(x):
            # the SHIPPED XLA formulation (darknet.apply_folded_int8_full):
            # bf16-accumulating int8 convs, f32 dequant epilogue, requant
            h = jax.lax.conv_general_dilated(
                x, w1p.reshape(1, 1, C, C2), (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16)
            h = _leaky(h.astype(jnp.float32) * a1p[0] + b1p[0])
            hq = _requant(h, 1.0 / s1)
            acc = jax.lax.conv_general_dilated(
                hq, w2p.reshape(3, 3, C2, C), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16)
            y = _leaky(acc.astype(jnp.float32) * a2p[0] + b2p[0])
            y = y + x.astype(jnp.float32) * sx
            return _requant(y, 1.0 / s_out)

        def fused(x):
            return fused_residual_block_int8(
                x, w1p, a1p, b1p, w2p, a2p, b2p,
                sx=sx, s1=s1, s_out=s_out, strip=strip)

        def run(name, fn):
            # K chained applications inside ONE jitted dispatch: per-unit
            # time is device-bound, not the ~1.7 ms/dispatch relay floor
            f = jax.jit(lambda x: jax.lax.fori_loop(
                0, K, lambda _, v: fn(v), x))
            try:
                x = f(xq)
                float(jnp.sum(x.astype(jnp.float32)))
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    x = f(x)
                float(jnp.sum(x.astype(jnp.float32)))
                dt = (time.perf_counter() - t0) / (args.iters * K) * 1e3
                print(f"  {name:28s} {dt:7.3f} ms/unit-batch  "
                      f"({gflop / dt * 1e3:7.1f} GOP/s)", flush=True)
                return dt
            except Exception as e:  # record, keep the other arms alive
                print(f"  {name:28s} FAILED: {type(e).__name__}: {e}",
                      flush=True)
                return None

        print(f"unit {H}²×{C}→{C2}→{C}  b{B}  chain {K}  "
              f"({gflop:.2f} GOP/batch)", flush=True)
        run("xla_int8_prod(bf16acc)", prod_block)
        run("xla_int8_int32acc", ref_int32)
        run(f"pallas_fused strip={strip}", fused)
    return 0


if __name__ == "__main__":
    sys.exit(main())
