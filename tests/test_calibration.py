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
