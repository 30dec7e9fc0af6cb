"""Space-to-depth TRAINING stem (round-3 train-perf lever).

`darknet.apply(..., s2d_stem=True)` computes layers 0-1 on the s2d grid
with the weight relabel inside the trace, so gradients come back in the
standard 3x3 parameterization (reference ``models.py:237-243`` stem shape;
optimizer geometry unchanged).  Contract: same function AND same gradients
as the standard path up to f32 summation order; BN batch stats reduce the
same value population phase-grouped.
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from amyloid_yolo_tpu.models import darknet
from amyloid_yolo_tpu.models.darknet import (_s2d_gather_indices_a,
                                             _s2d_gather_indices_b,
                                             _s2d_relabel,
                                             _s2d_transform_conv_a,
                                             _s2d_transform_conv_b)
from amyloid_yolo_tpu.ops.loss import yolo_loss
from amyloid_yolo_tpu.parallel import steps

from minispec import mini_spec


@pytest.fixture(scope="module")
def setup():
    spec = mini_spec(num_classes=2, img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    return spec, params, x


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-12)


def test_relabel_bitexact_vs_foldtime_transforms(setup):
    spec, params, _ = setup
    l0, l1 = spec.layers[0], spec.layers[1]
    w0 = np.asarray(params["conv_0"]["w"])
    wa_np, _ = _s2d_transform_conv_a(w0, np.zeros(l0.out_ch, np.float32))
    wa = _s2d_relabel(params["conv_0"]["w"],
                      _s2d_gather_indices_a(l0.in_ch, l0.out_ch))
    np.testing.assert_array_equal(np.asarray(wa), wa_np)
    w1 = np.asarray(params["conv_1"]["w"])
    wb_np = _s2d_transform_conv_b(w1)
    wb = _s2d_relabel(params["conv_1"]["w"],
                      _s2d_gather_indices_b(l1.in_ch, l1.out_ch))
    np.testing.assert_array_equal(np.asarray(wb), wb_np)


def test_train_forward_and_bn_stats_match_standard(setup):
    spec, params, x = setup
    maps0, st0 = darknet.apply(params, spec, x, train=True)
    maps1, st1 = darknet.apply(params, spec, x, train=True, s2d_stem=True)
    for a, b in zip(maps0, maps1):
        assert _rel(a, b) < 2e-4
    for k in st0:
        assert _rel(st0[k]["mean"], st1[k]["mean"]) < 1e-4
        assert _rel(st0[k]["var"], st1[k]["var"]) < 1e-4


def test_eval_forward_matches_standard(setup):
    spec, params, x = setup
    maps0, _ = darknet.apply(params, spec, x)
    maps1, _ = darknet.apply(params, spec, x, s2d_stem=True)
    for a, b in zip(maps0, maps1):
        assert _rel(a, b) < 2e-5


_X64_GRAD_SCRIPT = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import sys
sys.path.insert(0, "tests")
import numpy as np
import jax.numpy as jnp
from minispec import mini_spec
from amyloid_yolo_tpu.models import darknet
from amyloid_yolo_tpu.ops.loss import yolo_loss

spec = mini_spec(num_classes=2, img_size=64)
p32 = darknet.init_params(jax.random.PRNGKey(0), spec)
p64 = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), jnp.float64), p32)
rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float64))
targets = jnp.asarray(np.array(
    [[0, 0, 0.5, 0.5, 0.2, 0.3], [1, 1, 0.3, 0.6, 0.1, 0.2]], np.float64))
mask = jnp.ones((2,), bool)

def loss(p, s2d):
    maps, _ = darknet.apply(p, spec, x, train=True, s2d_stem=s2d,
                            compute_dtype=jnp.float64)
    total, _ = yolo_loss(maps, spec, 64, targets, mask)
    return total

g0 = jax.grad(lambda p: loss(p, False))(p64)
g1 = jax.grad(lambda p: loss(p, True))(p64)
worst = 0.0
for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g0)[0],
        jax.tree_util.tree_flatten_with_path(g1)[0]):
    a, b = np.asarray(a), np.asarray(b)
    r = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-300)
    if r > worst:
        worst = r
print("worst_rel", worst)
assert worst < 1e-9, worst
print("X64_GRAD_OK")
"""


def test_gradients_match_standard_parameterization_x64():
    # In f64 the summation-order noise (~1e-16) cannot flip leaky-ReLU
    # slopes or target-assignment comparisons, so the gradient equivalence
    # of the reparameterization is testable TIGHT — through the REAL
    # yolo_loss.  (In f32 the ~5e-5 forward noise flips kinks at units
    # sitting near zero — genuine O(1) local gradient differences, the same
    # divergence class the shear-warp tests bound; that is float noise, not
    # reparameterization error.)  x64 is a process-global switch, hence the
    # subprocess.
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run([sys.executable, "-c", _X64_GRAD_SCRIPT],
                          cwd=repo, timeout=900, text=True,
                          stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    assert proc.returncode == 0 and "X64_GRAD_OK" in proc.stdout, \
        proc.stdout[-3000:]


def test_gradient_direction_f32(setup):
    # f32 sanity companion to the x64 tightness test: the full gradient
    # vectors stay aligned despite per-element kink flips.
    spec, params, x = setup

    def loss(p, s2d):
        maps, _ = darknet.apply(p, spec, x, train=True, s2d_stem=s2d)
        return sum(jnp.sum(m * m) for m in maps)

    g0 = jax.grad(lambda p: loss(p, False))(params)
    g1 = jax.grad(lambda p: loss(p, True))(params)
    a = np.concatenate([np.asarray(l).ravel()
                        for l in jax.tree_util.tree_leaves(g0)])
    b = np.concatenate([np.asarray(l).ravel()
                        for l in jax.tree_util.tree_leaves(g1)])
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.999


def test_train_step_integration(setup):
    spec, params, x = setup
    opt = steps.make_optimizer(1e-3)
    t = np.zeros((8, 6), np.float32)
    t[0] = [0, 0, 0.5, 0.5, 0.2, 0.3]
    t[1] = [1, 1, 0.3, 0.6, 0.1, 0.2]
    targets = jnp.asarray(t)
    mask = jnp.asarray(np.arange(8) < 2)
    rng = jax.random.PRNGKey(3)
    xu8 = (x * 255).astype(jnp.uint8)

    # the step donates its state; each run needs its own param buffers
    s0 = steps.init_train_state(jax.tree.map(jnp.array, params), opt)
    step0 = steps.make_train_step(spec, opt, augment=False)
    s0, m0 = step0(s0, xu8, targets, mask, rng, 64)

    s1 = steps.init_train_state(jax.tree.map(jnp.array, params), opt)
    step1 = steps.make_train_step(spec, opt, augment=False, s2d_stem=True)
    s1, m1 = step1(s1, xu8, targets, mask, rng, 64)

    # loss is computed pre-update from near-identical forwards; params after
    # ONE Adam step are NOT element-comparable in f32 (Adam normalizes by
    # sqrt(v), so kink-flipped near-zero grads produce O(lr) update deltas)
    # — the x64 test above owns exact gradient equivalence.
    assert abs(float(m0["loss"]) - float(m1["loss"])) \
        < 1e-3 * max(1.0, abs(float(m0["loss"])))
    for k in s1.params:
        for kk in s1.params[k]:
            assert np.all(np.isfinite(np.asarray(s1.params[k][kk]))), (k, kk)
    # the step really trained: weights moved
    assert _rel(s1.params["conv_0"]["w"], params["conv_0"]["w"]) > 1e-5


def test_s2d_stem_rejects_bnless_stem():
    # spec whose stem shape matches but has no BN on layer 0
    spec = mini_spec(num_classes=2, img_size=64)
    object.__setattr__(spec.layers[0], "batch_normalize", False)
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    with pytest.raises(ValueError):
        darknet.apply(params, spec, x, train=True, s2d_stem=True)
