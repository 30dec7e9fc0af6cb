"""Full YOLOv3 (75-conv) numerical parity vs the torch oracle.

Slow on the 1-CPU test runner (full-graph compile), so it runs only when
``AMYOLO_FULL_PARITY=1`` is set; the mini-spec suite covers the same
semantics per-layer on every run.
"""

import os

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from amyloid_yolo_tpu.graphspec import YoloSpec, yolov3_spec
from amyloid_yolo_tpu.models import darknet, heads

import torch_mirror as tm

pytestmark = pytest.mark.skipif(
    os.environ.get("AMYOLO_FULL_PARITY") != "1",
    reason="set AMYOLO_FULL_PARITY=1 to run the full-model parity check",
)


def test_full_yolov3_parity_96():
    spec = yolov3_spec(num_classes=2)
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    tp = tm.params_to_torch(params)
    x = np.random.RandomState(0).rand(1, 96, 96, 3).astype(np.float32)

    maps, _ = darknet.apply(params, spec, jnp.asarray(x))
    out = heads.decode_all(maps, spec, 96)

    t_heads = tm.forward_heads(spec, tp, torch.from_numpy(x.transpose(0, 3, 1, 2)).double())
    yolos = [l for l in spec.layers if isinstance(l, YoloSpec)]
    t_out = torch.cat([tm.decode_head(h, y, 96) for h, y in zip(t_heads, yolos)],
                      dim=1).numpy()
    assert out.shape == t_out.shape == (1, 3 * (3 * 3 + 6 * 6 + 12 * 12), 7)
    # 75 conv layers of f32 accumulation vs f64 oracle: activations stay O(1)
    np.testing.assert_allclose(np.asarray(out), t_out, rtol=5e-3, atol=5e-3)
