"""Lazy decode path (score → top-k → sparse decode) vs the dense path.

`heads.decode_topk` + `nms.non_max_suppression_pooled` must be
bit-identical to `heads.decode_all` + `nms.non_max_suppression` — it is a
pure perf restructure of the same math (the reference semantics are the
dense path's: ``models.py:144-169`` decode + ``utils/utils.py:235-273``
NMS).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from amyloid_yolo_tpu.models import heads
from amyloid_yolo_tpu.ops import nms as nms_ops

from minispec import mini_spec

IMG = 64


def random_maps(rng, b=3, num_classes=2, dtype=jnp.float32):
    spec = mini_spec(num_classes=num_classes, img_size=IMG)
    maps = [
        jnp.asarray(rng.normal(0, 1.5, (b, g, g, 3 * (5 + num_classes))),
                    dtype)
        for g in (IMG // 32, IMG // 16, IMG // 8)
    ]
    return spec, maps


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("conf_thres", [0.0, 0.5, 0.8])
def test_lazy_matches_dense(dtype, conf_thres):
    rng = np.random.RandomState(0)
    spec, maps = random_maps(rng, dtype=dtype)
    cap, pool = 16, 32

    pred = heads.decode_all(maps, spec, IMG)
    d_dense, v_dense = nms_ops.non_max_suppression(
        pred, conf_thres, 0.4, capacity=cap, pool=pool)

    det, scores = heads.decode_topk(maps, spec, IMG, conf_thres, pool)
    d_lazy, v_lazy = nms_ops.non_max_suppression_pooled(
        det, scores, 0.4, capacity=cap)

    np.testing.assert_array_equal(np.asarray(v_dense), np.asarray(v_lazy))
    np.testing.assert_array_equal(np.asarray(d_dense), np.asarray(d_lazy))


def test_lazy_matches_dense_pool_eq_capacity():
    rng = np.random.RandomState(1)
    spec, maps = random_maps(rng)
    cap = 24

    pred = heads.decode_all(maps, spec, IMG)
    d_dense, v_dense = nms_ops.non_max_suppression(pred, 0.3, 0.4,
                                                   capacity=cap)
    det, scores = heads.decode_topk(maps, spec, IMG, 0.3, cap)
    d_lazy, v_lazy = nms_ops.non_max_suppression_pooled(det, scores, 0.4,
                                                        capacity=cap)
    np.testing.assert_array_equal(np.asarray(v_dense), np.asarray(v_lazy))
    np.testing.assert_array_equal(np.asarray(d_dense), np.asarray(d_lazy))


def test_lazy_no_candidates():
    rng = np.random.RandomState(2)
    spec, maps = random_maps(rng)
    # sigmoid of N(0, 1.5) essentially never reaches 0.9999
    det, scores = heads.decode_topk(maps, spec, IMG, 0.9999, 16)
    d, v = nms_ops.non_max_suppression_pooled(det, scores, 0.4, capacity=16)
    assert not np.asarray(v).any()
    np.testing.assert_array_equal(np.asarray(d), 0.0)


def test_lazy_detector_integration():
    """Detector(lazy_decode=True) — the r4 DEFAULT parity pipeline —
    produces the same detections as the dense-decode path
    (lazy_decode=False) on the mini model (full pipeline through rescale)."""
    import jax

    from amyloid_yolo_tpu.detectors import Detector
    from amyloid_yolo_tpu.models import darknet

    rng = np.random.RandomState(3)
    spec = mini_spec(img_size=IMG)
    params = darknet.init_params(jax.random.PRNGKey(7), spec)
    tiles = rng.randint(0, 255, (2, 128, 128, 3)).astype(np.uint8)

    kw = dict(spec=spec, model_size=IMG, tile_size=128, capacity=8,
              conf_thres=0.3)
    d0, v0 = Detector(params=params, **kw, lazy_decode=False)(tiles)
    d1, v1 = Detector(params=params, **kw, lazy_decode=True)(tiles)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))


def test_lazy_pool_exceeds_anchor_rows():
    """pool > N pads with -inf scores instead of mis-indexing."""
    rng = np.random.RandomState(4)
    spec, maps = random_maps(rng, b=1)
    n = sum(3 * g * g for g in (IMG // 32, IMG // 16, IMG // 8))
    det, scores = heads.decode_topk(maps, spec, IMG, 0.5, n + 37)
    assert det.shape == (1, n + 37, 7)
    assert np.isneginf(np.asarray(scores)[0, -37:]).all()
    d, v = nms_ops.non_max_suppression_pooled(det, scores, 0.4, capacity=8)
    pred = heads.decode_all(maps, spec, IMG)
    d0, v0 = nms_ops.non_max_suppression(pred, 0.5, 0.4, capacity=8,
                                         pool=n + 37)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d))
