"""A/B microbench: bilinear-warp gather formulations on the TPU chip.

The committed train trace (``bench_artifacts/traces/train``, summarize with
``tools/trace_summary.py``) attributes ~48 ms of an ~85 ms batch-8 train
step to the FOUR corner gathers in ``ops/augment.py:_bilinear_sample`` —
each a (B·S·S, 3) scattered gather whose output layout wastes 125 of 128
lanes (3-channel minor dim).  This tool measures candidate restructures:

  v0_four_gathers   current: 4 × img[yi, xi] advanced-index gathers
  v1_linear_fused   ONE 1-D gather from the flattened (B·S·S·3,) image
                    with all 4·N·3 linear indices batched (lane-dense
                    output, elementwise index math fuses)
  v2_slice22        one lax.gather with slice_sizes (1,2,2,C): fetches the
                    2x2 corner patch per index
  v3_rows_then_cols two-stage: gather row pairs (contiguous minor dim),
                    then column pairs from the row-pair strip

Run ON TPU (one process, batched experiments — CLAUDE.md):
    python tools/bench_augment.py [--batch 16] [--size 416] [--iters 30]

Timing uses chained outputs + final scalar fetch to beat the relay's
enqueue-ack pitfall (CLAUDE.md "Benchmarking through the axon relay").
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_variants(B, S):
    import jax
    import jax.numpy as jnp

    def coords(img_b, angle, tx, ty):
        s = img_b.shape[1]
        c = (s - 1) / 2.0
        th = jnp.deg2rad(angle)
        cos, sin = jnp.cos(th), jnp.sin(th)
        ys = jnp.arange(s, dtype=jnp.float32)
        gy, gx = jnp.meshgrid(ys, ys, indexing="ij")
        ox = gx[None] - c - tx[:, None, None] * s
        oy = gy[None] - c - ty[:, None, None] * s
        sx = cos[:, None, None] * ox + sin[:, None, None] * oy + c
        sy = -sin[:, None, None] * ox + cos[:, None, None] * oy + c
        return sy, sx

    def weights_and_corners(sy, sx, h, w):
        y0 = jnp.floor(sy)
        x0 = jnp.floor(sx)
        wy = sy - y0
        wx = sx - x0
        return y0.astype(jnp.int32), x0.astype(jnp.int32), wy, wx

    def v0_four_gathers(img, sy, sx):
        h, w = img.shape[1], img.shape[2]
        y0, x0, wy, wx = weights_and_corners(sy, sx, h, w)

        def one(img1, y0i, x0i, wy1, wx1):
            def gather(yi, xi):
                inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
                vals = img1[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
                return jnp.where(inb[..., None], vals, 0.0)

            v00 = gather(y0i, x0i)
            v01 = gather(y0i, x0i + 1)
            v10 = gather(y0i + 1, x0i)
            v11 = gather(y0i + 1, x0i + 1)
            top = v00 * (1 - wx1)[..., None] + v01 * wx1[..., None]
            bot = v10 * (1 - wx1)[..., None] + v11 * wx1[..., None]
            return top * (1 - wy1)[..., None] + bot * wy1[..., None]

        return jax.vmap(one)(img, y0, x0, wy, wx)

    def v1_linear_fused(img, sy, sx):
        B_, h, w, C = img.shape
        y0, x0, wy, wx = weights_and_corners(sy, sx, h, w)
        flat = img.reshape(-1)
        bb = jnp.arange(B_, dtype=jnp.int32)[:, None, None]

        def lin(yi, xi):
            inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            yi = jnp.clip(yi, 0, h - 1)
            xi = jnp.clip(xi, 0, w - 1)
            base = ((bb * h + yi) * w + xi) * C         # (B, S, S)
            idx = base[..., None] + jnp.arange(C)       # (B, S, S, C)
            return jnp.take(flat, idx.reshape(-1),
                            axis=0).reshape(B_, h, w, C) * inb[..., None]

        v00 = lin(y0, x0)
        v01 = lin(y0, x0 + 1)
        v10 = lin(y0 + 1, x0)
        v11 = lin(y0 + 1, x0 + 1)
        top = v00 * (1 - wx)[..., None] + v01 * wx[..., None]
        bot = v10 * (1 - wx)[..., None] + v11 * wx[..., None]
        return top * (1 - wy)[..., None] + bot * wy[..., None]

    def v1b_one_gather(img, sy, sx):
        # all four corners + channels through ONE jnp.take call
        B_, h, w, C = img.shape
        y0, x0, wy, wx = weights_and_corners(sy, sx, h, w)
        flat = img.reshape(-1)
        bb = jnp.arange(B_, dtype=jnp.int32)[:, None, None]

        def lin_idx(yi, xi):
            inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            yi = jnp.clip(yi, 0, h - 1)
            xi = jnp.clip(xi, 0, w - 1)
            base = ((bb * h + yi) * w + xi) * C
            return base[..., None] + jnp.arange(C), inb

        (i00, m00) = lin_idx(y0, x0)
        (i01, m01) = lin_idx(y0, x0 + 1)
        (i10, m10) = lin_idx(y0 + 1, x0)
        (i11, m11) = lin_idx(y0 + 1, x0 + 1)
        idx = jnp.stack([i00, i01, i10, i11])            # (4, B, S, S, C)
        vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(idx.shape)
        v00 = vals[0] * m00[..., None]
        v01 = vals[1] * m01[..., None]
        v10 = vals[2] * m10[..., None]
        v11 = vals[3] * m11[..., None]
        top = v00 * (1 - wx)[..., None] + v01 * wx[..., None]
        bot = v10 * (1 - wx)[..., None] + v11 * wx[..., None]
        return top * (1 - wy)[..., None] + bot * wy[..., None]

    def v2_slice22(img, sy, sx):
        B_, h, w, C = img.shape
        # pad so the 2x2 slice at clipped starts is always in bounds
        imgp = jnp.pad(img, ((0, 0), (0, 1), (0, 1), (0, 0)))
        y0, x0, wy, wx = weights_and_corners(sy, sx, h, w)
        inb = lambda yi, xi: ((yi >= -1) & (yi < h) & (xi >= -1) & (xi < w))

        def one(img1, y0i, x0i, wy1, wx1):
            starts = jnp.stack([jnp.clip(y0i, 0, h - 1).reshape(-1),
                                jnp.clip(x0i, 0, w - 1).reshape(-1)], axis=-1)
            dnums = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                start_index_map=(0, 1))
            patches = jax.lax.gather(
                img1, starts, dnums, slice_sizes=(2, 2, C),
                mode="clip")                              # (N, 2, 2, C)
            patches = patches.reshape(h, w, 2, 2, C)
            top = patches[:, :, 0, 0] * (1 - wx1)[..., None] \
                + patches[:, :, 0, 1] * wx1[..., None]
            bot = patches[:, :, 1, 0] * (1 - wx1)[..., None] \
                + patches[:, :, 1, 1] * wx1[..., None]
            out = top * (1 - wy1)[..., None] + bot * wy1[..., None]
            # zero outside (approx: zero only fully-out pixels)
            m = (y0i >= -1) & (y0i < h) & (x0i >= -1) & (x0i < w)
            return out * m[..., None]

        return jax.vmap(one)(imgp, y0, x0, wy, wx)

    return {
        "v0_four_gathers": v0_four_gathers,
        "v1_linear_fused": v1_linear_fused,
        "v1b_one_gather": v1b_one_gather,
        "v2_slice22": v2_slice22,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/amyolo_jax_cache")
    B, S = args.batch, args.size
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32))
    angle = jnp.asarray(rng.uniform(-20, 20, B).astype(np.float32))
    tx = jnp.asarray(rng.uniform(-0.2, 0.2, B).astype(np.float32))
    ty = jnp.asarray(rng.uniform(-0.2, 0.2, B).astype(np.float32))

    variants = build_variants(B, S)

    import jax

    def coords_fn(img):
        # reuse the variant-internal coord math: pass raw warp params
        return None

    ref_out = None
    for name, fn in variants.items():
        # close over the coord computation used by each variant
        def full(img, angle, tx, ty, fn=fn):
            s = img.shape[1]
            c = (s - 1) / 2.0
            th = jnp.deg2rad(angle)
            cos, sin = jnp.cos(th), jnp.sin(th)
            ys = jnp.arange(s, dtype=jnp.float32)
            gy, gx = jnp.meshgrid(ys, ys, indexing="ij")
            ox = gx[None] - c - tx[:, None, None] * s
            oy = gy[None] - c - ty[:, None, None] * s
            sx = cos[:, None, None] * ox + sin[:, None, None] * oy + c
            sy = -sin[:, None, None] * ox + cos[:, None, None] * oy + c
            return fn(img, sy, sx)

        jfn = jax.jit(full)
        out = jfn(img, angle, tx, ty)
        out.block_until_ready()
        if ref_out is None:
            ref_out = np.asarray(out)
        else:
            err = np.abs(np.asarray(out) - ref_out).max()
            interior = err < 1e-4
            print(f"  [{name}] max |delta| vs v0 = {err:.2e}"
                  f"{'' if interior else '  (check edges)'}")
        # chained timing + scalar fetch (relay-safe)
        t0 = time.perf_counter()
        o = img
        for _ in range(args.iters):
            o = jfn(o, angle, tx, ty)
        sink = float(jnp.sum(o[0, 0, 0]))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:18s} {dt * 1e3:8.3f} ms/call   (sink {sink:.3e})")


if __name__ == "__main__":
    main()
