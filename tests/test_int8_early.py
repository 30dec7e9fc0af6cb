"""int8 early-backbone fast path (non-parity, opt-in): quantized storage and
int8 MXU convs through the HBM-bound high-resolution stage must approximate
the f32 pipeline closely enough that detections survive."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from amyloid_yolo_tpu.models import darknet

from minispec import mini_spec


@pytest.fixture(scope="module")
def setup():
    spec = mini_spec(num_classes=2, img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    folded = darknet.fold_batchnorm(params, spec)
    upto = darknet.int8_region(spec)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    return spec, folded, upto, x


def test_int8_region_covers_high_res_prefix(setup):
    spec, folded, upto, x = setup
    # mini spec: conv, conv/2, res(3), conv/2, res(3) -> factor 4 region
    assert upto >= 8
    assert upto < len(spec.layers)


@pytest.mark.parametrize("int8_compute", [True, False])
def test_int8_early_close_to_f32(setup, int8_compute):
    spec, folded, upto, x = setup
    q = darknet.quantize_folded_int8(folded, spec, upto)
    scales = darknet.calibrate_act_scales(folded, spec, x, upto)
    assert "in" in scales and str(upto - 1) in scales
    maps8 = darknet.apply_folded_int8(
        folded, q, scales, spec, x, upto=upto,
        compute_dtype=jnp.float32, int8_compute=int8_compute)
    maps = darknet.apply_folded(folded, spec, x, compute_dtype=jnp.float32)
    assert len(maps8) == len(maps)
    for a, b in zip(maps8, maps):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.99, f"head map correlation {corr}"


def test_detector_int8_precision_end_to_end():
    from amyloid_yolo_tpu.detectors import Detector

    spec = mini_spec(num_classes=2, img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(1), spec)
    rng = np.random.RandomState(1)
    tiles = rng.randint(0, 255, (2, 256, 256, 3)).astype(np.uint8)

    det8 = Detector(spec, params, conf_thres=0.3, nms_thres=0.4,
                    model_size=64, tile_size=256, capacity=16,
                    compute_dtype=jnp.float32, precision="int8_early")
    assert det8._fn is None          # compiles after calibration
    dets, valid = det8(tiles)        # lazy calibration on first batch
    assert det8._fn is not None
    assert dets.shape == (2, 16, 7)

    det32 = Detector(spec, params, conf_thres=0.3, nms_thres=0.4,
                     model_size=64, tile_size=256, capacity=16,
                     compute_dtype=jnp.float32)
    d32, v32 = det32(tiles)
    # same number of confident detections in this easy regime
    assert int(np.asarray(valid).sum()) == int(np.asarray(v32).sum())


def test_quantize_weight_roundtrip(setup):
    spec, folded, upto, _ = setup
    q = darknet.quantize_folded_int8(folded, spec, upto)
    for i in spec.conv_indices:
        if i >= upto:
            continue
        w = np.asarray(folded[f"conv_{i}"]["w"], np.float32)
        wq = np.asarray(q[f"conv_{i}"]["wq"])
        ws = np.asarray(q[f"conv_{i}"]["ws"])
        assert wq.dtype == np.int8
        np.testing.assert_allclose(wq * ws, w, atol=float(ws.max()) * 0.51)
