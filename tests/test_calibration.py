"""int8 calibration guard rails (round-3): a degenerate calibration batch
(e.g. a blank border tile) must warn instead of silently mis-scaling, and
amax accumulation over several batches must equal the elementwise max of
per-batch calibrations."""

import numpy as np
import jax
import pytest

from amyloid_yolo_tpu.detectors import Detector
from amyloid_yolo_tpu.models import darknet

from minispec import mini_spec


def _make(precision):
    spec = mini_spec(num_classes=2, img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    return Detector(spec, params, model_size=64, tile_size=64,
                    host_resize=True, precision=precision, fold_bn=True)


@pytest.mark.parametrize("precision", ["int8_full", "int8_early"])
def test_calibrate_zero_batch_warns(precision):
    det = _make(precision)
    blank = np.zeros((2, 64, 64, 3), np.uint8)
    with pytest.warns(UserWarning, match="degenerate"):
        det.calibrate(blank, rebuild=False)
    # the input scale itself is the degenerate one
    assert det._act_scales["in"] < Detector.DEGENERATE_SCALE


def test_calibrate_real_batch_does_not_warn(recwarn):
    det = _make("int8_full")
    rng = np.random.RandomState(0)
    tiles = rng.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    det.calibrate(tiles, rebuild=False)
    assert not [w for w in recwarn.list if issubclass(w.category, UserWarning)]


def test_calibrate_accumulate_is_elementwise_max():
    rng = np.random.RandomState(1)
    a = rng.randint(0, 120, (2, 64, 64, 3)).astype(np.uint8)
    b = rng.randint(100, 255, (2, 64, 64, 3)).astype(np.uint8)

    det_a = _make("int8_full")
    sa = dict(det_a.calibrate(a, rebuild=False))
    det_b = _make("int8_full")
    sb = dict(det_b.calibrate(b, rebuild=False))

    det = _make("int8_full")
    det.calibrate(a, rebuild=False)
    acc = det.calibrate(b, accumulate=True, rebuild=False)
    assert set(acc) == set(sa) == set(sb)
    for k in acc:
        assert acc[k] == pytest.approx(max(sa[k], sb[k]), rel=1e-6)
    # rebuild=False defers compilation; the first call compiles with the
    # final accumulated scales and runs
    assert det._fn is None
    dets, valid = det(b)
    assert dets.shape[0] == 2


def test_calibration_sidecar_roundtrip(tmp_path):
    """save_calibration → load_calibration reproduces the exact scales AND
    the exact detections (the r4 verdict's deployability criterion: a
    gated int8 configuration must be reproducible WITHOUT the calibration
    folder)."""
    rng = np.random.RandomState(2)
    tiles = rng.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    det = _make("int8_full")
    det.calibrate(tiles)
    want_scales = dict(det._act_scales)
    want_dets, want_valid = det(tiles)

    path = str(tmp_path / "calib.json")
    det.save_calibration(path, meta={"note": "unit"})

    det2 = _make("int8_full")
    got_scales = det2.load_calibration(path)
    assert got_scales == pytest.approx(want_scales)
    assert det2._calib_meta["note"] == "unit"       # provenance adopted
    assert det2._calib_meta["loaded_from"] == path  # (serve /stats shows it)
    got_dets, got_valid = det2(tiles)
    np.testing.assert_array_equal(np.asarray(got_valid),
                                  np.asarray(want_valid))
    np.testing.assert_array_equal(np.asarray(got_dets),
                                  np.asarray(want_dets))


def test_calibration_sidecar_refuses_mismatched_graph(tmp_path):
    """Scales recorded under a different precision / int8 region /
    percentile must be refused — they would silently mis-scale layers."""
    rng = np.random.RandomState(3)
    tiles = rng.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    det = _make("int8_full")
    det.calibrate(tiles, rebuild=False)
    path = str(tmp_path / "calib.json")
    det.save_calibration(path)

    other = _make("int8_early")
    with pytest.raises(ValueError, match="precision"):
        other.load_calibration(path)

    spec = mini_spec(num_classes=2, img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    pctl = Detector(spec, params, model_size=64, tile_size=64,
                    host_resize=True, precision="int8_full", fold_bn=True,
                    calib_percentile=99.9)
    with pytest.raises(ValueError, match="calib_percentile"):
        pctl.load_calibration(path)

    geom = Detector(spec, params, model_size=64, tile_size=128,
                    host_resize=True, precision="int8_full", fold_bn=True)
    with pytest.warns(UserWarning, match="tile_size"):
        geom.load_calibration(path, rebuild=False)


def test_save_calibration_requires_scales(tmp_path):
    det = _make("int8_full")
    with pytest.raises(ValueError, match="no calibration"):
        det.save_calibration(str(tmp_path / "c.json"))
    bf = Detector(mini_spec(num_classes=2, img_size=64),
                  darknet.init_params(jax.random.PRNGKey(0),
                                      mini_spec(num_classes=2, img_size=64)),
                  model_size=64, tile_size=64, precision="bf16")
    with pytest.raises(ValueError, match="has no"):
        bf.save_calibration(str(tmp_path / "c.json"))


def test_folder_calibration_records_provenance(tmp_path):
    """_calibrate_from_folder stamps tile provenance that save_calibration
    embeds in the sidecar meta."""
    from PIL import Image

    from amyloid_yolo_tpu.io.datasets import ImageFolder

    rng = np.random.RandomState(4)
    d = tmp_path / "tiles"
    d.mkdir()
    for i in range(3):
        Image.fromarray(
            rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)).save(
            str(d / f"t{i}.jpg"))
    det = _make("int8_full")
    folder = ImageFolder(str(d), tile_size=64, resize_to=64)
    det._calibrate_from_folder(folder, batch_size=2)
    path = str(tmp_path / "c.json")
    det.save_calibration(path)
    import json

    meta = json.load(open(path))["meta"]
    assert meta["source"] == "folder" and meta["n_tiles"] == 3
    assert meta["first_tiles"][0] == "t0.jpg"
    assert len(meta["tiles_sha256"]) == 64
