"""MXU matmul-form BN statistics (``ops/bnstats.py``) ≡ the vector-reduce
form, values AND gradients.

The reformulation is performance-only (trace-attributed: the reduce
kernels cost 9.2 of 23.9 ms/step at b8@416², BENCH.md "BN stats on the
MXU"); torch ``BatchNorm2d`` semantics (``/root/reference/models.py:43``)
must be preserved exactly — same math, different summation order, so f32
comparisons use tight tolerances and the full-apply check runs both forms
through the identical mini graph.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from amyloid_yolo_tpu.models import darknet
from amyloid_yolo_tpu.ops import bnstats

from minispec import mini_spec

IMG = 64


def test_channel_sums_matches_numpy_f32():
    r = np.random.RandomState(0)
    x = r.randn(4, 13, 13, 32).astype(np.float32)
    s, sq = bnstats.channel_sums(jnp.asarray(x).reshape(-1, 32))
    ref_s = x.astype(np.float64).sum((0, 1, 2))
    ref_sq = (x.astype(np.float64) ** 2).sum((0, 1, 2))
    np.testing.assert_allclose(np.asarray(s), ref_s, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sq), ref_sq, rtol=1e-5)


def test_channel_sums_bf16_precision_bound():
    # bf16 squaring adds ≤2⁻⁹ per-element rounding; over ~7k-element sums
    # the statistic must stay well inside the 2e-4 torch-parity rtol used
    # by the train-step tests.
    r = np.random.RandomState(1)
    x = (r.randn(4, 13, 13, 64) * 0.5 + 0.2).astype(np.float32)
    s, sq = bnstats.channel_sums(jnp.asarray(x, jnp.bfloat16).reshape(-1, 64))
    xb = np.asarray(jnp.asarray(x, jnp.bfloat16).astype(jnp.float32),
                    np.float64)
    ref_s = xb.sum((0, 1, 2))
    ref_sq = (xb ** 2).sum((0, 1, 2))
    np.testing.assert_allclose(np.asarray(s), ref_s, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(sq), ref_sq, rtol=2e-3)


def test_bn_normalize_value_and_grads_match_autodiff():
    """Custom-VJP normalize ≡ the inline formula, fwd and all five grads."""
    r = np.random.RandomState(2)
    c = 16
    x = jnp.asarray(r.randn(2, 9, 9, c).astype(np.float32))
    mean = jnp.asarray(r.randn(c).astype(np.float32) * 0.1)
    inv = jnp.asarray((r.rand(c).astype(np.float32) + 0.5))
    gamma = jnp.asarray(r.rand(c).astype(np.float32) + 0.5)
    beta = jnp.asarray(r.randn(c).astype(np.float32) * 0.1)

    def inline(x, mean, inv, gamma, beta):
        return ((x.astype(jnp.float32) - mean) * (gamma * inv)
                + beta).astype(x.dtype)

    np.testing.assert_allclose(
        np.asarray(bnstats.bn_normalize(x, mean, inv, gamma, beta)),
        np.asarray(inline(x, mean, inv, gamma, beta)), rtol=0, atol=0)

    def loss(fn):
        def f(args):
            y = fn(*args)
            return jnp.sum(jnp.sin(y) * jnp.arange(c))
        return f

    g_custom = jax.grad(loss(bnstats.bn_normalize))((x, mean, inv, gamma, beta))
    g_auto = jax.grad(loss(inline))((x, mean, inv, gamma, beta))
    for gc, ga, name in zip(g_custom, g_auto,
                            ["x", "mean", "inv", "gamma", "beta"]):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(ga),
                                   rtol=2e-5, atol=1e-5, err_msg=name)


@pytest.fixture(scope="module")
def spec_params():
    spec = mini_spec(num_classes=2, img_size=IMG)
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    return spec, params


def _train_fwd(spec, params, x, form):
    maps, new_stats = darknet.apply(params, spec, x, train=True,
                                    bn_form=form)
    return maps, new_stats


def test_apply_matmul_form_matches_reduce_form(spec_params):
    spec, params = spec_params
    r = np.random.RandomState(3)
    x = jnp.asarray(r.rand(2, IMG, IMG, 3).astype(np.float32))
    maps_r, stats_r = _train_fwd(spec, params, x, "reduce")
    maps_m, stats_m = _train_fwd(spec, params, x, "matmul")
    for a, b in zip(maps_r, maps_m):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    for k in stats_r:
        for f in ("mean", "var"):
            np.testing.assert_allclose(np.asarray(stats_r[k][f]),
                                       np.asarray(stats_m[k][f]),
                                       rtol=1e-5, atol=1e-6, err_msg=f"{k}.{f}")


def test_apply_matmul_form_grads_match(spec_params):
    spec, params = spec_params
    r = np.random.RandomState(4)
    x = jnp.asarray(r.rand(2, IMG, IMG, 3).astype(np.float32))

    def loss(params, form):
        maps, _ = darknet.apply(params, spec, x, train=True, bn_form=form)
        return sum(jnp.sum(m ** 2) for m in maps)

    g_r = jax.grad(lambda p: loss(p, "reduce"))(params)
    g_m = jax.grad(lambda p: loss(p, "matmul"))(params)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_r)
    flat_m, _ = jax.tree_util.tree_flatten_with_path(g_m)
    # Tolerance note: the op-level VJP is exact vs autodiff (rtol 2e-5,
    # test above); end-to-end the two forms differ only by f32 summation
    # order, but the one-pass variance's msq−mean² cancellation amplifies
    # that reorder noise and each normalize divides by it — measured
    # ~2e-4 relative on this mini graph (same noise class as the shipped
    # "reduce" form vs torch).
    for (path, a), (_, b) in zip(flat_r, flat_m):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-3,
            err_msg=jax.tree_util.keystr(path))


def test_matmul_form_composes_with_dp_mesh(spec_params):
    """Per-channel dot sums under a batch-sharded jit must still produce
    GLOBAL batch stats (GSPMD partitions the contraction and inserts the
    all-reduce), identical to the single-device result."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    spec, params = spec_params
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs the multi-device CPU mesh")
    mesh = Mesh(np.array(devs[:4]), ("dp",))
    r = np.random.RandomState(5)
    x = jnp.asarray(r.rand(8, IMG, IMG, 3).astype(np.float32))

    single = jax.jit(lambda p, x: _train_fwd(spec, p, x, "matmul"))(params, x)
    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    sharded = jax.jit(lambda p, x: _train_fwd(spec, p, x, "matmul"))(ps, xs)
    for a, b in zip(single[0], sharded[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    for k in single[1]:
        np.testing.assert_allclose(np.asarray(single[1][k]["mean"]),
                                   np.asarray(sharded[1][k]["mean"]),
                                   rtol=1e-5, atol=1e-6)
