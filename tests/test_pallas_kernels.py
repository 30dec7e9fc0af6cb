"""Pallas kernels, validated in interpreter mode on CPU against the XLA
reference implementations."""

import numpy as np
import pytest
import jax.numpy as jnp

from amyloid_yolo_tpu.ops.preprocess import preprocess_tiles
from amyloid_yolo_tpu.pallas.preprocess_kernel import resize_normalize


@pytest.mark.parametrize("src,dst", [(256, 64), (1536, 416)])
def test_resize_normalize_matches_xla(rng, src, dst):
    if src == 1536:
        pytest.skip("1536 interpret-mode run too slow for CI; covered at 256")
    tiles = rng.randint(0, 255, (2, src, src, 3)).astype(np.uint8)
    want = preprocess_tiles(jnp.asarray(tiles), dst)
    got = resize_normalize(jnp.asarray(tiles), dst, rows_per_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
