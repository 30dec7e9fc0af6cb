"""Steady-state train-step benchmark on the TPU chip.

Measures the full jitted train step (resize + augment + forward(train BN) +
loss + backward + Adam) on the real chip, batch 8 @ 416² by default — the
configuration of record for BENCH.md's training table (reference anchor:
train.py:104-156, one optimizer step per batch).

Relay pitfalls handled (CLAUDE.md "Benchmarking through the axon relay"):
  * rng keys are PRECOMPUTED — an eager per-iteration ``fold_in`` in the
    loop triggers a one-time remote compile that pollutes the mean
    (measured: 409 ms/step artifact vs 42.7 ms real);
  * state chains through the loop (step N+1 consumes step N's output), so
    queue backpressure throttles enqueue to device rate;
  * the loop ends with a scalar fetch (``float(loss)``) forcing execution.

Run ON TPU:  python tools/bench_trainstep.py [--batch 8] [--size 416]
             [--iters 30] [--warp-ab]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_warp(B, S, iters):
    """A/B the affine warp alone: grouped shear vs per-row vs bilinear."""
    import functools
    import jax
    import jax.numpy as jnp
    from amyloid_yolo_tpu.ops import augment as aug

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32))
    ang = jnp.asarray(rng.uniform(-20, 20, B).astype(np.float32))
    tx = jnp.asarray(rng.uniform(-0.2, 0.2, B).astype(np.float32))
    ty = jnp.asarray(rng.uniform(-0.2, 0.2, B).astype(np.float32))

    def run(name, fn):
        f = jax.jit(jax.vmap(fn))
        out = f(img, ang, tx, ty)
        float(jnp.sum(out))  # compile + first exec
        t0 = time.perf_counter()
        x = img
        for _ in range(iters):
            x = f(x, ang, tx, ty)
        float(jnp.sum(x))
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"  warp {name:18s} {dt:7.2f} ms/batch (b{B}@{S})")
        return dt

    per_row = functools.partial(aug._shear_rows, group=1)

    def shear3_with(shear, im, a, x, y):
        saved = aug._shear_rows
        # _affine_shear3 resolves _shear_rows at call time (module global);
        # trace-time swap is safe because jit captures the traced graph.
        aug._shear_rows = shear
        try:
            return aug._affine_shear3(im, a, x, y)
        finally:
            aug._shear_rows = saved

    run("shear3_grouped", aug._affine_shear3)
    run("shear3_per_row", functools.partial(shear3_with, per_row))
    run("bilinear", aug._affine_one)


def bench_step(B, S, iters, dtype_name, bn_form=None, targets_form=None,
               tag="", s2d_stem=False, image_layout="nhwc"):
    import jax
    import jax.numpy as jnp
    from amyloid_yolo_tpu.graphspec import yolov3_spec
    from amyloid_yolo_tpu.models import darknet
    from amyloid_yolo_tpu.ops import targets as targets_mod
    from amyloid_yolo_tpu.parallel import steps

    # the knobs are trace-time module globals — set before make_train_step
    if bn_form is not None:
        darknet.BN_FORM = bn_form
    if targets_form is not None:
        targets_mod.TARGETS_FORM = targets_form

    spec = yolov3_spec()
    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    opt = steps.make_optimizer(1e-4)
    state = steps.init_train_state(params, opt)
    step = steps.make_train_step(spec, opt, augment=True, compute_dtype=dtype,
                                 s2d_stem=s2d_stem, image_layout=image_layout)

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 256, (B, S, S, 3), dtype=np.uint8))
    T = 64
    t = np.zeros((T, 6), np.float32)
    t[:8] = [[i, 1, 0.5, 0.5, 0.1, 0.1] for i in range(8)]
    targets = jnp.asarray(t)
    mask = jnp.asarray(np.arange(T) < 8)
    keys = jax.random.split(jax.random.PRNGKey(1), iters + 2)

    state, m = step(state, imgs, targets, mask, keys[0], S)
    float(m["loss"])  # force compile + exec
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, imgs, targets, mask, keys[i + 1], S)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters * 1e3
    ips = B / dt * 1e3
    print(f"train step b{B}@{S} {dtype_name}{tag}: {dt:.2f} ms/step = "
          f"{ips:.1f} img/s/chip", flush=True)

    trace_dir = os.environ.get("TRACE_DIR")
    if trace_dir:  # device-op ground truth (summarize: tools/trace_summary.py)
        with jax.profiler.trace(trace_dir):
            for i in range(4):
                state, m = step(state, imgs, targets, mask, keys[i], S)
            float(m["loss"])
        print(f"trace written to {trace_dir}")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--warp-ab", action="store_true")
    ap.add_argument("--s2d-ab", action="store_true",
                    help="A/B the s2d training stem vs the standard stem "
                         "on the full train step, one process")
    ap.add_argument("--layout-ab", action="store_true",
                    help="A/B the planar image pipeline vs NHWC (both with "
                         "the shipped s2d stem), one process")
    ap.add_argument("--forms-ab", action="store_true",
                    help="A/B BN_FORM (reduce|matmul) x TARGETS_FORM "
                         "(scatter|dense) on the full train step, one "
                         "process (CLAUDE.md: batch TPU experiments)")
    ap.add_argument("--batch-sweep", action="store_true",
                    help="b8/b16/b32 of the SHIPPED config (planar + s2d "
                         "stem) in one process — the matched-config batch "
                         "scaling table (r3 verdict #5: the old table mixed "
                         "pre/post-planar configs)")
    args = ap.parse_args()
    if args.batch_sweep:
        res = {}
        for B in (8, 16, 32):
            res[B] = bench_step(B, args.size, args.iters, args.dtype,
                                tag=" (planar+s2d)", s2d_stem=True,
                                image_layout="planar")
        for B, dt in res.items():
            print(f"  b{B:<3d} {dt:7.2f} ms/step  {B / dt * 1e3:7.1f} "
                  f"img/s/chip")
        return 0
    if args.warp_ab:
        bench_warp(args.batch, args.size, args.iters)
    if args.layout_ab:
        base = bench_step(args.batch, args.size, args.iters, args.dtype,
                          tag=" layout=nhwc", s2d_stem=True)
        planar = bench_step(args.batch, args.size, args.iters, args.dtype,
                            tag=" layout=planar", s2d_stem=True,
                            image_layout="planar")
        print(f"  planar pipeline: {base:.2f} -> {planar:.2f} ms/step "
              f"({base / planar:.3f}x)")
        return 0
    if args.s2d_ab:
        base = bench_step(args.batch, args.size, args.iters, args.dtype,
                          tag=" stem=standard")
        s2d = bench_step(args.batch, args.size, args.iters, args.dtype,
                         tag=" stem=s2d", s2d_stem=True)
        print(f"  s2d stem: {base:.2f} -> {s2d:.2f} ms/step "
              f"({base / s2d:.3f}x)")
        return 0
    if args.forms_ab:
        results = {}
        # 3 combos, not the full 2x2: each is a separate full-model remote
        # compile (3-35 min through the relay); (reduce, dense) adds no
        # decision-relevant information
        for bn, tf in (("reduce", "scatter"), ("matmul", "scatter"),
                       ("matmul", "dense")):
            tag = f" bn={bn} targets={tf}"
            results[(bn, tf)] = bench_step(
                args.batch, args.size, args.iters, args.dtype,
                bn_form=bn, targets_form=tf, tag=tag)
        base = results[("reduce", "scatter")]
        for k, v in results.items():
            print(f"  bn={k[0]:6s} targets={k[1]:7s} {v:7.2f} ms/step "
                  f"({base / v:.2f}x vs current default)")
        return 0
    bench_step(args.batch, args.size, args.iters, args.dtype)
    return 0


if __name__ == "__main__":
    sys.exit(main())
