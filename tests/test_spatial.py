"""Spatial (height) sharding: partitioned forward ≡ single-device forward."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from amyloid_yolo_tpu.models import darknet, heads
from amyloid_yolo_tpu.parallel.spatial import make_spatial_mesh, spatial_forward

from minispec import mini_spec


def test_spatial_forward_matches_unsharded(rng):
    spec = mini_spec(num_classes=2, img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    folded = darknet.fold_batchnorm(params, spec)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)

    maps = darknet.apply_folded(folded, spec, jnp.asarray(x), compute_dtype=jnp.float32)
    want = heads.decode_all(maps, spec, 64)

    mesh = make_spatial_mesh(n_sp=4, n_dp=2)
    got = spatial_forward(folded, spec, jnp.asarray(x), mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_spatial_mesh_shape():
    mesh = make_spatial_mesh(n_sp=4, n_dp=2)
    assert mesh.shape == {"dp": 2, "sp": 4}
    with pytest.raises(ValueError):
        make_spatial_mesh(n_sp=16, n_dp=1)


def test_spatial_detect_full_pipeline(rng):
    """spatial_detect (the ≥1536² native-resolution inference path) ≡ the
    unsharded pipeline: normalize → forward → decode → merging NMS with
    overflow count, boxes in the input's own pixel space."""
    from amyloid_yolo_tpu.ops import nms as nms_ops
    from amyloid_yolo_tpu.parallel.spatial import spatial_detect

    spec = mini_spec(num_classes=2, img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(1), spec)
    folded = darknet.fold_batchnorm(params, spec)
    tiles = (rng.rand(2, 64, 64, 3) * 255).astype(np.uint8)

    x = jnp.asarray(tiles).astype(jnp.float32) / 255.0
    maps = darknet.apply_folded(folded, spec, x, compute_dtype=jnp.float32)
    pred = heads.decode_all(maps, spec, 64)
    want_d, want_v, want_n = nms_ops.non_max_suppression(
        pred, 0.3, 0.4, 16, return_count=True)

    mesh = make_spatial_mesh(n_sp=4, n_dp=2)
    got_d, got_v, got_n = spatial_detect(
        folded, spec, jnp.asarray(tiles), mesh,
        conf_thres=0.3, nms_thres=0.4, capacity=16)
    np.testing.assert_array_equal(np.asarray(got_n), np.asarray(want_n))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d),
                               rtol=1e-4, atol=1e-4)


def test_spatial_fns_are_memoized(rng):
    """jax.jit caches by FUNCTION IDENTITY: spatial_forward/spatial_detect
    must reuse one jitted closure per (spec, mesh, config) or every sweep
    batch recompiles the full native-resolution model (multi-minute on the
    remote-compile relay — the defect evaluate.make_eval_fn memoizes away)."""
    from amyloid_yolo_tpu.parallel import spatial

    spec = mini_spec(num_classes=2, img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    folded = darknet.fold_batchnorm(params, spec)
    mesh = make_spatial_mesh(n_sp=4, n_dp=2)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)

    spatial._FN_CACHE.clear()
    a = spatial_forward(folded, spec, jnp.asarray(x), mesh)
    assert len(spatial._FN_CACHE) == 1
    fn = next(iter(spatial._FN_CACHE.values()))[1]
    b = spatial_forward(folded, spec, jnp.asarray(x), mesh)
    assert len(spatial._FN_CACHE) == 1
    assert next(iter(spatial._FN_CACHE.values()))[1] is fn
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_spatial_fn_cache_lru_bounded(rng):
    """Past _FN_CACHE_MAX distinct configs the oldest entry is evicted —
    a many-resolution sweep must not pin dead compiled programs (same
    bound as evaluate._EVAL_FN_CACHE)."""
    from amyloid_yolo_tpu.parallel import spatial

    spatial._FN_CACHE.clear()
    for i in range(spatial._FN_CACHE_MAX + 3):
        spatial._memoized("probe", object(), object(), (i,), lambda: i)
    assert len(spatial._FN_CACHE) <= spatial._FN_CACHE_MAX


def test_spatial_train_step_equals_unsharded(rng):
    """The spatially-sharded TRAIN step (height over sp, batch over dp) ≡
    the single-device step: same loss, same post-Adam params, same BN
    batch-stat updates (sync-BN across sp×dp is implied by params
    equality — the running stats live in the param tree).  Same standard
    and Adam-aware bound as tests/test_parallel.py."""
    from amyloid_yolo_tpu.parallel import steps as S
    from amyloid_yolo_tpu.parallel.spatial import shard_spatial_train_step

    spec = mini_spec()
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    B, cap = 4, 4
    imgs = (rng.rand(B, 64, 64, 3) * 255).astype(np.uint8)
    targets = np.zeros((B * cap, 6), np.float32)
    mask = np.zeros((B * cap,), bool)
    for b in range(B):
        targets[b * cap] = [b, b % 2, 0.4 + 0.05 * b / B, 0.5, 0.2, 0.25]
        mask[b * cap] = True

    def fresh(p):
        return jax.tree.map(jnp.copy, p)

    opt = S.make_optimizer()
    step = S.make_train_step(spec, opt, augment=False)
    s1, m1 = step(S.init_train_state(fresh(params), opt), jnp.asarray(imgs),
                  jnp.asarray(targets), jnp.asarray(mask),
                  jax.random.PRNGKey(0), 64)

    mesh = make_spatial_mesh(n_sp=4, n_dp=2)
    sharded = shard_spatial_train_step(
        S.make_train_step(spec, opt, augment=False), mesh)
    s2, m2 = sharded(S.init_train_state(fresh(params), opt),
                     jnp.asarray(imgs), jnp.asarray(targets),
                     jnp.asarray(mask), jax.random.PRNGKey(0), 64)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    lr = 1e-3  # Adam sign-flip bound on near-zero grads (test_parallel.py)
    for k in s1.params:
        for kk in s1.params[k]:
            np.testing.assert_allclose(
                np.asarray(s1.params[k][kk]), np.asarray(s2.params[k][kk]),
                rtol=1e-4, atol=2.05 * lr, err_msg=f"{k}.{kk}")


def test_spatial_train_grads_equal_unsharded(rng):
    """Raw gradients under the sp×dp sharding match the unsharded gradients
    tightly (no optimizer noise floor): the BN batch stats and loss
    reductions really are global under GSPMD."""
    from amyloid_yolo_tpu.parallel import steps as S
    from amyloid_yolo_tpu.parallel.spatial import spatial_image_sharding
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = mini_spec()
    params = darknet.init_params(jax.random.PRNGKey(1), spec)
    B, cap = 4, 4
    imgs = (rng.rand(B, 64, 64, 3) * 255).astype(np.uint8)
    targets = np.zeros((B * cap, 6), np.float32)
    mask = np.zeros((B * cap,), bool)
    for b in range(B):
        targets[b * cap] = [b, 1 - b % 2, 0.5, 0.45, 0.3, 0.2]
        mask[b * cap] = True

    gstep = S.make_grad_step(spec)
    loss1, g1, st1 = gstep(params, jnp.asarray(imgs), jnp.asarray(targets),
                           jnp.asarray(mask), 64)

    mesh = make_spatial_mesh(n_sp=4, n_dp=2)
    rep = NamedSharding(mesh, P())
    x = jax.device_put(jnp.asarray(imgs), spatial_image_sharding(mesh))
    t = jax.device_put(jnp.asarray(targets), NamedSharding(mesh, P("dp")))
    mk = jax.device_put(jnp.asarray(mask), NamedSharding(mesh, P("dp")))
    loss2, g2, st2 = gstep(jax.device_put(params, rep), x, t, mk, 64)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    flat1, _ = jax.tree_util.tree_flatten(g1)
    flat2, _ = jax.tree_util.tree_flatten(g2)
    for a, b in zip(flat1, flat2):
        # Height-sharding reorders the BN-stat and loss reductions (psum
        # tree vs flat f32 sum), so grads carry reassociation noise —
        # measured max 2.8e-3 relative on a handful of near-cancelling
        # elements.  A systematic sharding bug (wrong psum scaling, missed
        # collective, halo off-by-one) shifts entire tensors by >=2x,
        # which these bounds still catch.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-3)
    # the NEW BatchNorm batch stats (sync-BN over sp x dp) agree too
    for k in st1:
        for kk in st1[k]:
            np.testing.assert_allclose(
                np.asarray(st1[k][kk]), np.asarray(st2[k][kk]),
                rtol=1e-5, atol=1e-6, err_msg=f"{k}.{kk}")


def test_spatial_train_step_planar_augment_runs(rng):
    """The production step configuration (planar layout + augmentation +
    s2d-eligible mini stem off) compiles and runs under the sp mesh and
    produces finite loss/params — the full-feature path, not just the
    equivalence configuration."""
    from amyloid_yolo_tpu.parallel import steps as S
    from amyloid_yolo_tpu.parallel.spatial import shard_spatial_train_step

    spec = mini_spec()
    params = darknet.init_params(jax.random.PRNGKey(2), spec)
    B, cap = 4, 4
    imgs = (rng.rand(B, 64, 64, 3) * 255).astype(np.uint8)
    targets = np.zeros((B * cap, 6), np.float32)
    mask = np.zeros((B * cap,), bool)
    for b in range(B):
        targets[b * cap] = [b, b % 2, 0.5, 0.5, 0.25, 0.25]
        mask[b * cap] = True

    mesh = make_spatial_mesh(n_sp=4, n_dp=1)
    opt = S.make_optimizer()
    sharded = shard_spatial_train_step(
        S.make_train_step(spec, opt, augment=True, image_layout="planar"),
        mesh)
    st, m = sharded(S.init_train_state(params, opt), jnp.asarray(imgs),
                    jnp.asarray(targets), jnp.asarray(mask),
                    jax.random.PRNGKey(3), 64)
    assert np.isfinite(float(m["loss"]))
    for k in st.params:
        for kk in st.params[k]:
            assert np.isfinite(np.asarray(st.params[k][kk])).all(), f"{k}.{kk}"
