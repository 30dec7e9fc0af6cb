"""int8 full-graph fast path (non-parity, opt-in): whole-network int8
storage + MXU convs with bf16 head convs must track the f32 pipeline
closely enough that detections survive; route rescale-concat must preserve
branch values."""

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
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    return spec, folded, x


def test_quantized_set_excludes_head_convs(setup):
    spec, folded, x = setup
    from amyloid_yolo_tpu.graphspec import ConvSpec

    q = darknet.int8_full_conv_indices(spec)
    linear = {i for i, l in enumerate(spec.layers)
              if isinstance(l, ConvSpec) and l.activation != "leaky"}
    stem = {i for i, l in enumerate(spec.layers)
            if isinstance(l, ConvSpec) and l.in_ch < 8}
    assert len(linear) == 3  # three head convs in the YOLOv3 shape
    assert not (q & (linear | stem))
    assert q == set(spec.conv_indices) - linear - stem

    # on the real model the tiny-in_ch rule excludes exactly the RGB stem
    from amyloid_yolo_tpu.graphspec import yolov3_spec

    full = yolov3_spec(num_classes=2)
    qf = darknet.int8_full_conv_indices(full)
    assert 0 not in qf
    assert {i for i in full.conv_indices
            if i not in qf and full.layers[i].activation == "leaky"} == {0}


def test_int8_full_close_to_f32(setup):
    spec, folded, x = setup
    qp = darknet.quantize_folded_int8_full(folded, spec)
    scales = darknet.calibrate_act_scales_full(folded, spec, x)
    assert str(len(spec.layers) - 1) in scales
    maps8 = darknet.apply_folded_int8_full(
        folded, qp, scales, spec, x, compute_dtype=jnp.float32)
    maps = darknet.apply_folded(folded, spec, x, compute_dtype=jnp.float32)
    assert len(maps8) == len(maps)
    for a, b in zip(maps8, maps):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.98, f"head map correlation {corr}"


def test_percentile_calibration_scales_and_accuracy(setup):
    """percentile<100 produces per-layer scales <= amax scales (a tighter
    grid; outliers clip at +-127) and the quantized forward still tracks
    f32 closely (r4: tools/int8_calib_study.py measures the real-data
    accuracy trade)."""
    spec, folded, x = setup
    amax = darknet.calibrate_act_scales_full(folded, spec, x)
    p999 = darknet.calibrate_act_scales_full(folded, spec, x, percentile=99.9)
    assert set(p999) == set(amax)
    assert all(p999[k] <= amax[k] + 1e-12 for k in amax)
    assert any(p999[k] < amax[k] * 0.999 for k in amax)  # actually tighter
    qp = darknet.quantize_folded_int8_full(folded, spec)
    maps8 = darknet.apply_folded_int8_full(
        folded, qp, p999, spec, x, compute_dtype=jnp.float32)
    maps = darknet.apply_folded(folded, spec, x, compute_dtype=jnp.float32)
    for a, b in zip(maps8, maps):
        corr = np.corrcoef(np.asarray(a, np.float64).ravel(),
                           np.asarray(b, np.float64).ravel())[0, 1]
        assert corr > 0.98, f"head map correlation {corr}"


def test_int8_full_detector_pipeline(setup):
    """Detector(precision='int8_full') composes with lazy decode and
    produces detections comparable to the bf16 path on the mini model."""
    from amyloid_yolo_tpu.detectors import Detector

    spec, _, _ = setup
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    rng = np.random.RandomState(1)
    tiles = rng.randint(0, 255, (2, 128, 128, 3)).astype(np.uint8)
    kw = dict(spec=spec, model_size=64, tile_size=128, capacity=8,
              conf_thres=0.3)
    d0, v0 = Detector(params=params, **kw)(tiles)
    det8 = Detector(params=params, **kw, precision="int8_full",
                    lazy_decode=True)
    d8, v8 = det8(tiles)
    # quantization moves boxes slightly; counts should broadly agree
    assert abs(int(np.sum(v0)) - int(np.sum(v8))) <= max(2, int(np.sum(v0)))


def test_int8_maxpool_matches_f32_pool():
    rng = np.random.RandomState(2)
    q = rng.randint(-128, 128, (1, 8, 8, 4)).astype(np.int8)
    for kernel, stride in [(2, 1), (2, 2), (3, 1)]:
        got = darknet._maxpool_int8(jnp.asarray(q), kernel, stride)
        # scale=0.5: max commutes with positive scaling
        want = darknet._maxpool(jnp.asarray(q, jnp.float32) * 0.5,
                                kernel, stride)
        np.testing.assert_array_equal(
            np.asarray(got, np.float32) * 0.5, np.asarray(want))
