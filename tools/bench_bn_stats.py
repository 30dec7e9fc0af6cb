"""A/B the BN batch-stat reduction forms on the real TPU chip.

Round-3 trace attribution (``bench_artifacts/traces/train_r3``,
``tools/trace_summary.py``): the per-channel ``convert_reduce_fusion``
kernels behind training-mode BatchNorm cost 9.2 ms of the 23.9 ms train
step at batch 8 @ 416² — ~1/8 of HBM bandwidth on the big maps and a
~40-70 µs launch floor on the small ones.  ``ops/bnstats.py`` reformulates
the four reductions per BN layer (fwd Σx/Σx², bwd Σdy/Σdy·x) as MXU dots.

This tool measures, on the chip, for every BN activation shape the real
yolov3 spec produces at a given (batch, size):

  * fwd+bwd over the whole shape set, "reduce" vs "matmul" forms, as ONE
    jitted program per form (mirrors how the kernels appear inside the
    step program; single-kernel wall timing through the axon relay is
    meaningless — CLAUDE.md "Benchmarking through the relay");
  * device-time ground truth from a ``jax.profiler`` trace per form.

Run ON TPU (chip must be otherwise idle):
    python tools/bench_bn_stats.py [--batch 8] [--size 416] [--iters 20]

The decisive end-to-end number comes from the full-step A/B:
    AMYOLO_BN_FORM=reduce python tools/bench_trainstep.py
    AMYOLO_BN_FORM=matmul python tools/bench_trainstep.py
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bn_shapes(batch: int, size: int):
    """(B, H, W, C) of every batch-normalized conv output in yolov3_spec."""
    from amyloid_yolo_tpu.graphspec import (ConvSpec, MaxPoolSpec, RouteSpec,
                                            ShortcutSpec, UpsampleSpec,
                                            YoloSpec, yolov3_spec)
    spec = yolov3_spec()
    shapes = []
    cur = {"hw": size, "ch": 3}
    outs = []  # per-layer (hw, ch) for routes/shortcuts
    for layer in spec.layers:
        if isinstance(layer, ConvSpec):
            hw = (cur["hw"] + 2 * layer.pad - layer.kernel) // layer.stride + 1
            cur = {"hw": hw, "ch": layer.out_ch}
            if layer.batch_normalize:
                shapes.append((batch, hw, hw, layer.out_ch))
        elif isinstance(layer, MaxPoolSpec):
            cur = {"hw": cur["hw"] // layer.stride, "ch": cur["ch"]}
        elif isinstance(layer, UpsampleSpec):
            cur = {"hw": cur["hw"] * layer.factor, "ch": cur["ch"]}
        elif isinstance(layer, RouteSpec):
            hw = outs[layer.layers[0]][0]
            ch = sum(outs[s][1] for s in layer.layers)
            cur = {"hw": hw, "ch": ch}
        elif isinstance(layer, (ShortcutSpec, YoloSpec)):
            pass
        outs.append((cur["hw"], cur["ch"]))
    return shapes


def device_ms_from_trace(logdir: str) -> float:
    hits = sorted(glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz")))
    trace = json.load(gzip.open(hits[-1]))
    pids = {e["pid"]: e["args"].get("name", "") for e in trace["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pids.items() if "TPU" in n}
    tot = collections.Counter()
    for e in trace["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") in dev:
            # jit_* rows are the host-visible program spans; children are
            # the kernels — count only leaf kernels (no jit_ prefix)
            if not e["name"].startswith("jit_"):
                tot[e["name"]] += e["dur"]
    return sum(tot.values()) / 1e3, tot


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from amyloid_yolo_tpu.models import darknet
    from amyloid_yolo_tpu.ops import bnstats

    shapes = bn_shapes(args.batch, args.size)
    dtype = jnp.dtype(args.dtype)
    print(f"{len(shapes)} BN activations at b{args.batch}@{args.size}, "
          f"{sum(int(np.prod(s)) for s in shapes) * dtype.itemsize / 2**20:.0f}"
          f" MB total ({args.dtype})", flush=True)

    rng = np.random.RandomState(0)
    xs = [jnp.asarray(rng.randn(*s).astype(np.float32) * 0.5 + 0.1,
                      dtype=dtype) for s in shapes]
    gammas = [jnp.asarray(rng.rand(s[-1]).astype(np.float32) + 0.5)
              for s in shapes]
    betas = [jnp.asarray(rng.randn(s[-1]).astype(np.float32) * 0.1)
             for s in shapes]

    def stats_reduce(x):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(0, 1, 2))
        msq = jnp.mean(x32 * x32, axis=(0, 1, 2))
        return mean, msq

    def stats_matmul(x):
        n = x.shape[0] * x.shape[1] * x.shape[2]
        s, sq = bnstats.channel_sums(x.reshape(-1, x.shape[-1]))
        return s / n, sq / n

    def norm_inline(x, mean, inv, gamma, beta):
        y = (x.astype(jnp.float32) - mean) * (gamma * inv) + beta
        return y.astype(x.dtype)

    def make_loss(stats, norm):
        def loss(xs_in):
            tot = 0.0
            for x, g, b in zip(xs_in, gammas, betas):
                mean, msq = stats(x)
                var = jnp.maximum(msq - mean * mean, 0.0)
                inv = jax.lax.rsqrt(var + darknet.BN_EPS)
                y = norm(x, mean, inv, g, b)
                tot = tot + jnp.sum(y.astype(jnp.float32) ** 2)
            return tot
        return loss

    forms = {
        "reduce": make_loss(stats_reduce, norm_inline),
        "matmul": make_loss(stats_matmul, bnstats.bn_normalize),
    }

    for name, loss in forms.items():
        fwd_bwd = jax.jit(jax.grad(loss))
        g = fwd_bwd(xs)
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            g = fwd_bwd(xs)
        jax.block_until_ready(g)
        float(jnp.sum(g[0].astype(jnp.float32)))
        wall = (time.perf_counter() - t0) / args.iters * 1e3
        logdir = tempfile.mkdtemp(prefix=f"bnstats_{name}_")
        with jax.profiler.trace(logdir):
            g = fwd_bwd(xs)
            jax.block_until_ready(g)
            float(jnp.sum(g[0].astype(jnp.float32)))
        dev_ms, tot = device_ms_from_trace(logdir)
        print(f"{name:8s} wall {wall:7.2f} ms/iter   device {dev_ms:7.2f} ms"
              f"  (fwd stats + normalize + full bwd, {len(shapes)} layers)",
              flush=True)
        for kname, us in tot.most_common(6):
            print(f"          {us / 1e3:8.3f} ms  {kname}")

    # numerical cross-check, f32 exactness sanity
    l_r = forms["reduce"](xs)
    l_m = forms["matmul"](xs)
    print(f"loss reduce={float(l_r):.6e} matmul={float(l_m):.6e} "
          f"rel={abs(float(l_r) - float(l_m)) / abs(float(l_r)):.2e}")


if __name__ == "__main__":
    main()
