"""Golden-artifact regression: fixed weights + fixed input → stored
detections.  Guards the whole numeric pipeline (model, decode, NMS,
rescale) against silent drift across refactors — the reference's
golden-pickle testing tier (``unit_test.py:125-131``) applied to the
detector itself.

Regenerate after an INTENTIONAL numeric change:
    AMYOLO_REGEN_GOLDEN=1 python -m pytest tests/test_golden.py -q
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from amyloid_yolo_tpu.detectors import Detector
from amyloid_yolo_tpu.models import darknet

from minispec import mini_spec

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "mini_detections.npz")


def compute():
    spec = mini_spec(num_classes=2, img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(42), spec)
    det = Detector(spec, params, conf_thres=0.3, nms_thres=0.4, model_size=64,
                   tile_size=256, capacity=16, compute_dtype=jnp.float32)
    rng = np.random.RandomState(7)
    tiles = rng.randint(0, 255, (2, 256, 256, 3)).astype(np.uint8)
    dets, valid = det(tiles)
    return np.asarray(dets), np.asarray(valid)


def test_golden_detections():
    dets, valid = compute()
    if os.environ.get("AMYOLO_REGEN_GOLDEN") == "1" or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, dets=dets, valid=valid)
        if os.environ.get("AMYOLO_REGEN_GOLDEN") != "1":
            pytest.skip("golden artifact created; rerun to compare")
    g = np.load(GOLDEN)
    np.testing.assert_array_equal(valid, g["valid"])
    # CPU/TPU and compiler-version variation allow small numeric slack
    np.testing.assert_allclose(dets, g["dets"], rtol=1e-3, atol=1e-2)
