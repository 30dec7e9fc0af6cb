"""End-to-end detector pipeline on the mini model (CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from amyloid_yolo_tpu.detectors import Detector
from amyloid_yolo_tpu.models import darknet

from minispec import mini_spec


@pytest.fixture(scope="module")
def det():
    spec = mini_spec(num_classes=2, img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    return Detector(
        spec, params, conf_thres=0.3, nms_thres=0.4, model_size=64,
        tile_size=256, capacity=16, compute_dtype=jnp.float32,
    )


def test_detector_shapes(det, rng):
    tiles = rng.randint(0, 255, (2, 256, 256, 3)).astype(np.uint8)
    dets, valid = det(tiles)
    assert dets.shape == (2, 16, 7)
    assert valid.shape == (2, 16)


def test_detector_boxes_in_tile_space(det, rng):
    tiles = rng.randint(0, 255, (2, 256, 256, 3)).astype(np.uint8)
    ragged = det.detect_batch_ragged(tiles)
    for d in ragged:
        if d is None:
            continue
        # class column is 0/1, conf in (0, 1]
        assert set(np.unique(d[:, 6])) <= {0.0, 1.0}
        assert (d[:, 4] > 0).all() and (d[:, 4] <= 1).all()


def test_detector_folded_matches_unfolded(rng):
    spec = mini_spec(num_classes=2, img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(1), spec)
    kw = dict(conf_thres=0.3, nms_thres=0.4, model_size=64, tile_size=256,
              capacity=16, compute_dtype=jnp.float32)
    d1 = Detector(spec, params, fold_bn=True, **kw)
    d2 = Detector(spec, params, fold_bn=False, **kw)
    tiles = rng.randint(0, 255, (1, 256, 256, 3)).astype(np.uint8)
    a, va = d1(tiles)
    b, vb = d2(tiles)
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


def test_detector_host_resize_identical(rng):
    """host_resize (pre-gathered uint8 input) must give identical results
    to the on-device resize path."""
    from amyloid_yolo_tpu.ops.preprocess import nearest_indices

    spec = mini_spec(num_classes=2, img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(2), spec)
    kw = dict(conf_thres=0.3, nms_thres=0.4, model_size=64, tile_size=256,
              capacity=16, compute_dtype=jnp.float32)
    dev = Detector(spec, params, host_resize=False, **kw)
    host = Detector(spec, params, host_resize=True, **kw)
    tiles = rng.randint(0, 255, (2, 256, 256, 3)).astype(np.uint8)
    idx = nearest_indices(64, 256)
    small = np.ascontiguousarray(tiles[:, idx][:, :, idx])
    a, va = dev(tiles)
    b, vb = host(small)
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_detect_folder(det, tmp_path, rng):
    from PIL import Image

    for i in range(3):
        img = rng.randint(0, 255, (256, 256, 3)).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / f"t{i}.jpg")
    res = det.detect_folder(str(tmp_path), batch_size=2, merge_boxes=True)
    assert len(res) == 3
    for p, d in res.items():
        assert d is None or (d.ndim == 2 and d.shape[1] == 7)


def test_detect_folder_int8_calibrates_on_many_tiles(tmp_path, rng, monkeypatch):
    """int8 lazy calibration in detect_folder uses the first ~CALIB_TILES
    tiles (accumulated amax), not just the first batch — one-batch
    calibration under-covered the activation range and cost int8_full
    2.7 mAP pts on the r4p2 gate (tools/int8_calib_study.py)."""
    from PIL import Image

    spec = mini_spec(num_classes=2, img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    imgs = []
    for i in range(6):
        img = rng.randint(0, 255, (256, 256, 3)).astype(np.uint8)
        # scale pixel energy per image so later tiles strictly widen amax
        img = (img * (0.4 + 0.1 * i)).astype(np.uint8)
        imgs.append(img)
        Image.fromarray(img).save(tmp_path / f"t{i}.jpg")

    def make():
        return Detector(spec, params, conf_thres=0.3, nms_thres=0.4,
                        model_size=64, tile_size=256, capacity=16,
                        precision="int8_early", int8_downsample=2,
                        compute_dtype=jnp.float32)

    det = make()
    monkeypatch.setattr(type(det), "CALIB_TILES", 6)
    res = det.detect_folder(str(tmp_path), batch_size=2)
    assert len(res) == 6
    folder_scales = dict(det._act_scales)

    # reference: explicit accumulate over the decoded batches in file order
    want = make()
    files = sorted(tmp_path.iterdir())
    batches = [np.stack([np.asarray(Image.open(files[j]).convert("RGB"))
                         for j in (i, i + 1)]) for i in (0, 2, 4)]
    for b in batches[:-1]:
        want.calibrate(b, accumulate=True, rebuild=False)
    want.calibrate(batches[-1], accumulate=True)
    assert folder_scales.keys() == want._act_scales.keys()
    for k in folder_scales:
        np.testing.assert_allclose(folder_scales[k], want._act_scales[k],
                                   rtol=1e-6, err_msg=k)

    # and the accumulated scales dominate any single batch's
    one = make()
    one.calibrate(batches[0])
    assert any(folder_scales[k] > one._act_scales[k] * 1.0001
               for k in folder_scales)
