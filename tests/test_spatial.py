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
