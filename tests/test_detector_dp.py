"""Multi-chip batch-sharded inference ≡ single-device inference."""

import numpy as np
import jax
import jax.numpy as jnp

from amyloid_yolo_tpu.detectors import Detector
from amyloid_yolo_tpu.models import darknet
from amyloid_yolo_tpu.parallel.mesh import make_mesh

from minispec import mini_spec


def test_dp_detector_matches_single(rng):
    spec = mini_spec(num_classes=2, img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    kw = dict(conf_thres=0.3, nms_thres=0.4, model_size=64, tile_size=256,
              capacity=16, compute_dtype=jnp.float32)
    single = Detector(spec, params, **kw)
    dp = Detector(spec, params, mesh=make_mesh(8), **kw)
    tiles = rng.randint(0, 255, (8, 256, 256, 3)).astype(np.uint8)
    d1, v1 = single(tiles)
    d2, v2 = dp(tiles)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5, atol=1e-5)
    # outputs genuinely sharded across the mesh
    assert len(d2.sharding.device_set) == 8


def test_dp_sweep_end_to_end(tmp_path, rng):
    """The WSI sweep runs on an N-device dp mesh (sweep CLI --data_parallel
    path): counts match the single-device sweep."""
    from amyloid_yolo_tpu.analysis.validation import calculate_plaque_counts_per_wsi
    from amyloid_yolo_tpu.io import tiles as tiles_mod

    wsi_root = tmp_path / "wsis"
    img = rng.randint(0, 255, (512, 512, 3)).astype(np.uint8)
    tiles_mod.tile_image_array(img, str(wsi_root), "WSI_DP", tile_size=256)

    spec = mini_spec(num_classes=2, img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    kw = dict(conf_thres=0.3, nms_thres=0.4, model_size=64, tile_size=256,
              capacity=16, compute_dtype=jnp.float32)
    single = Detector(spec, params, **kw)
    dp = Detector(spec, params, mesh=make_mesh(8), **kw)
    c1 = calculate_plaque_counts_per_wsi(
        str(wsi_root), single, prefix="S_", pickles_dir=str(tmp_path / "p1"),
        batch_size=8)
    c2 = calculate_plaque_counts_per_wsi(
        str(wsi_root), dp, prefix="D_", pickles_dir=str(tmp_path / "p2"),
        batch_size=8)
    assert c1 == c2


def test_dp_detector_int8_precision(rng):
    """int8_early composes with the dp mesh: lazy calibration happens with
    replicated params, results match the single-device int8 detector."""
    import jax.numpy as jnp

    spec = mini_spec(num_classes=2, img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    kw = dict(conf_thres=0.3, nms_thres=0.4, model_size=64, tile_size=256,
              capacity=16, compute_dtype=jnp.float32, precision="int8_early")
    tiles = rng.randint(0, 255, (8, 256, 256, 3)).astype(np.uint8)
    single = Detector(spec, params, **kw)
    d1, v1 = single(tiles)
    dp = Detector(spec, params, mesh=make_mesh(8), **kw)
    d2, v2 = dp(tiles)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-4, atol=1e-3)
