"""Space-to-depth stem restructure (round-3 perf lever, VERDICT item 2).

The s2d stem must compute the SAME function as layers 0-1 (conv 3x3/s1 →
leaky → conv 3x3/s2 → leaky) — it is a pure weight relabeling with zero
fill, so f32 results match to summation-order rounding and the int8_full
variant reuses conv_1's integer weights verbatim.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from amyloid_yolo_tpu.models import darknet
from amyloid_yolo_tpu.models.darknet import (_conv, _leaky, _space_to_depth,
                                             make_s2d_stem,
                                             make_s2d_stem_int8,
                                             s2d_stem_forward)

from minispec import mini_spec


@pytest.fixture(scope="module")
def setup():
    spec = mini_spec(num_classes=2, img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    folded = darknet.fold_batchnorm(params, spec)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    return spec, folded, x


def _direct_layers01(folded, x):
    o = _leaky(_conv(x, folded["conv_0"]["w"], 1, 1) + folded["conv_0"]["b"])
    return _leaky(_conv(o, folded["conv_1"]["w"], 2, 1) + folded["conv_1"]["b"])


def test_space_to_depth_roundtrip():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32))
    y = _space_to_depth(x)
    assert y.shape == (1, 4, 4, 12)
    # channel layout: (ph*2+pw)*C + c
    for ph in range(2):
        for pw in range(2):
            for c in range(3):
                np.testing.assert_array_equal(
                    np.asarray(y[0, :, :, (ph * 2 + pw) * 3 + c]),
                    np.asarray(x[0, ph::2, pw::2, c]))


def test_stem_forward_equals_layers_0_1(setup):
    spec, folded, x = setup
    stem = make_s2d_stem(folded, spec)
    want = np.asarray(_direct_layers01(folded, x))
    got = np.asarray(s2d_stem_forward(stem, x, jnp.float32))
    assert got.shape == want.shape == (2, 32, 32, 8)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_weight_transform_structure(setup):
    spec, folded, x = setup
    stem = make_s2d_stem(folded, spec)
    w0 = np.asarray(folded["conv_0"]["w"])
    wa = np.asarray(stem["wa"])
    # every original weight value appears exactly 4x (once per phase)
    assert wa.shape == (3, 3, 12, 16)
    assert np.count_nonzero(wa) <= 4 * np.count_nonzero(w0) and \
        np.count_nonzero(wa) >= 4 * np.count_nonzero(w0) - 4  # exact zeros rare
    np.testing.assert_allclose(np.abs(wa).sum(), 4 * np.abs(w0).sum(),
                               rtol=1e-6)
    w1 = np.asarray(folded["conv_1"]["w"])
    wb = np.asarray(stem["wb"])
    assert wb.shape == (2, 2, 16, 8)
    np.testing.assert_allclose(np.abs(wb).sum(), np.abs(w1).sum(), rtol=1e-6)


def test_apply_folded_s2d_matches_direct(setup):
    spec, folded, x = setup
    stem = make_s2d_stem(folded, spec)
    ref = darknet.apply_folded(folded, spec, x, compute_dtype=jnp.float32)
    got = darknet.apply_folded(folded, spec, x, compute_dtype=jnp.float32,
                               s2d_stem=stem)
    assert len(ref) == len(got)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def _stem8_spec(img=64):
    """Tiny graph whose conv_1 has in_ch >= 8 so the int8_full rule
    quantizes it (mini_spec's 4-channel conv_1 falls under the tiny-in_ch
    bf16 exclusion; the real yolov3 conv_1 is 32-channel and quantized)."""
    from amyloid_yolo_tpu.graphspec import (NetInfo, YOLOV3_MASKS, _Builder,
                                            _finish)

    b = _Builder(NetInfo(width=img, height=img))
    b.conv(8, 3)
    b.conv(16, 3, stride=2)
    b.conv(8, 1)
    b.conv(16, 3)
    b.shortcut(-3)
    b.conv(3 * (5 + 2), 1, bn=False, act="linear")
    b.yolo(YOLOV3_MASKS[0], 2)
    return _finish(b.net, b.layers, b.out_channels)


@pytest.fixture(scope="module")
def setup8():
    spec = _stem8_spec()
    params = darknet.init_params(jax.random.PRNGKey(1), spec)
    folded = darknet.fold_batchnorm(params, spec)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    return spec, folded, x


def test_int8_full_s2d_matches_unfused(setup8):
    spec, folded, x = setup8
    qp = darknet.quantize_folded_int8_full(folded, spec)
    assert "conv_1" in qp
    scales = darknet.calibrate_act_scales_full(folded, spec, x)
    ref = darknet.apply_folded_int8_full(folded, qp, scales, spec, x,
                                         compute_dtype=jnp.float32)
    stem8 = make_s2d_stem_int8(folded, qp, spec)
    got = darknet.apply_folded_int8_full(folded, qp, scales, spec, x,
                                         compute_dtype=jnp.float32,
                                         s2d_stem=stem8)
    # conv_b reuses conv_1's integer weights, so the only drift source is
    # conv_a's f32 summation order flipping a borderline quantization level
    for a, b in zip(got, ref):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = np.abs(b).max() + 1e-6
        assert np.abs(a - b).max() / denom < 0.02


def test_s2d_int8_weights_are_exact_relabeling(setup8):
    spec, folded, x = setup8
    qp = darknet.quantize_folded_int8_full(folded, spec)
    stem8 = make_s2d_stem_int8(folded, qp, spec)
    wbq = np.asarray(stem8["wbq"])
    assert wbq.dtype == np.int8
    wq1 = np.asarray(qp["conv_1"]["wq"])
    # integer multiset preserved (plus zero fill)
    assert np.abs(wbq.astype(np.int64)).sum() == np.abs(wq1.astype(np.int64)).sum()


def test_detector_s2d_smoke(setup):
    spec, _, _ = setup
    from amyloid_yolo_tpu.detectors import Detector

    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    rng = np.random.RandomState(0)
    tiles = rng.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)

    base = Detector(spec, params, model_size=64, tile_size=64,
                    host_resize=True, conf_thres=0.05, nms_thres=0.4,
                    compute_dtype=jnp.float32)
    fast = Detector(spec, params, model_size=64, tile_size=64,
                    host_resize=True, conf_thres=0.05, nms_thres=0.4,
                    compute_dtype=jnp.float32, s2d_stem=True)
    d0, v0 = base(tiles)
    d1, v1 = fast(tiles)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_allclose(np.asarray(d0)[np.asarray(v0)],
                               np.asarray(d1)[np.asarray(v1)],
                               rtol=1e-3, atol=1e-3)

    with pytest.raises(ValueError):
        Detector(spec, params, precision="int8_early", s2d_stem=True)


def _down_spec(img=64):
    """Tiny graph with a second, non-stem 3x3/s2 conv (in_ch 16 ≤ 64) that
    make_s2d_down_int8 must relabel — the shape class of the real conv_5."""
    from amyloid_yolo_tpu.graphspec import (NetInfo, YOLOV3_MASKS, _Builder,
                                            _finish)

    b = _Builder(NetInfo(width=img, height=img))
    b.conv(8, 3)
    b.conv(16, 3, stride=2)
    b.conv(32, 3, stride=2)       # <- the relabeled downsample
    b.conv(3 * (5 + 2), 1, bn=False, act="linear")
    b.yolo(YOLOV3_MASKS[0], 2)
    return _finish(b.net, b.layers, b.out_channels)


@pytest.fixture(scope="module")
def setup_down():
    spec = _down_spec()
    params = darknet.init_params(jax.random.PRNGKey(3), spec)
    folded = darknet.fold_batchnorm(params, spec)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    qp = darknet.quantize_folded_int8_full(folded, spec)
    scales = darknet.calibrate_act_scales_full(folded, spec, x)
    return spec, folded, qp, scales, x


def test_s2d_down_selection(setup_down):
    spec, folded, qp, scales, x = setup_down
    downs = darknet.make_s2d_down_int8(qp, spec)
    assert set(downs) == {2}                  # never the stem conv_1
    wr = np.asarray(downs[2])
    assert wr.dtype == np.int8 and wr.shape == (2, 2, 64, 32)
    wq = np.asarray(qp["conv_2"]["wq"])
    assert np.abs(wr.astype(np.int64)).sum() == np.abs(wq.astype(np.int64)).sum()


def test_s2d_down_bitexact_under_int32_accum(setup_down):
    """With int32 accumulation on both arms the relabeled conv's integer
    sums are EXACT, so the whole forward must be bit-identical."""
    spec, folded, qp, scales, x = setup_down
    downs = darknet.make_s2d_down_int8(qp, spec)
    ref = darknet.apply_folded_int8_full(folded, qp, scales, spec, x,
                                         compute_dtype=jnp.float32,
                                         int32_accum_max_hw=10**6)
    got = darknet.apply_folded_int8_full(folded, qp, scales, spec, x,
                                         compute_dtype=jnp.float32,
                                         s2d_downs=downs,
                                         int32_accum_max_hw=10**6)
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_s2d_down_close_under_bf16_accum(setup_down):
    spec, folded, qp, scales, x = setup_down
    downs = darknet.make_s2d_down_int8(qp, spec)
    ref = darknet.apply_folded_int8_full(folded, qp, scales, spec, x,
                                         compute_dtype=jnp.float32)
    got = darknet.apply_folded_int8_full(folded, qp, scales, spec, x,
                                         compute_dtype=jnp.float32,
                                         s2d_downs=downs)
    for a, b in zip(got, ref):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = np.abs(b).max() + 1e-6
        assert np.abs(a - b).max() / denom < 0.02
