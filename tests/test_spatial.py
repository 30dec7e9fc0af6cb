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
