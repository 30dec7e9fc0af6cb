"""Generality of the cfg→GraphSpec builder beyond the shipped YOLOv3:
a tiny-YOLOv3-shaped cfg (maxpool downsampling incl. the kernel-2/stride-1
tail pool, two heads, route+upsample neck) must build, run, and round-trip
through the cfg emitter.

Reference anchor: ``create_modules``'s maxpool branch
(``/root/reference/models.py:46-55``) — the shipped cfg has no maxpool
blocks, so this guards the path tiny cfgs rely on (incl. the ZeroPad2d
(0,1,0,1) quirk for kernel 2 / stride 1).
"""

import textwrap

import jax
import jax.numpy as jnp
import numpy as np

from amyloid_yolo_tpu import graphspec
from amyloid_yolo_tpu.models import darknet, heads
from amyloid_yolo_tpu.ops import nms as nms_ops

TINY_CFG = textwrap.dedent("""\
    [net]
    width=96
    height=96
    channels=3
    batch=8

    [convolutional]
    batch_normalize=1
    filters=8
    size=3
    stride=1
    pad=1
    activation=leaky

    [maxpool]
    size=2
    stride=2

    [convolutional]
    batch_normalize=1
    filters=16
    size=3
    stride=1
    pad=1
    activation=leaky

    [maxpool]
    size=2
    stride=2

    [convolutional]
    batch_normalize=1
    filters=32
    size=3
    stride=1
    pad=1
    activation=leaky

    [maxpool]
    size=2
    stride=2

    [convolutional]
    batch_normalize=1
    filters=64
    size=3
    stride=1
    pad=1
    activation=leaky

    [maxpool]
    size=2
    stride=1

    [convolutional]
    batch_normalize=1
    filters=64
    size=3
    stride=1
    pad=1
    activation=leaky

    [convolutional]
    size=1
    stride=1
    pad=1
    filters=21
    activation=linear

    [yolo]
    mask = 3,4,5
    anchors = 10,14,  23,27,  37,58,  81,82,  135,169,  344,319
    classes=2
    num=6
    jitter=.3
    ignore_thresh = .7
    truth_thresh = 1
    random=1

    [route]
    layers = -3

    [convolutional]
    batch_normalize=1
    filters=16
    size=1
    stride=1
    pad=1
    activation=leaky

    [upsample]
    stride=2

    [route]
    layers = -1, 4

    [convolutional]
    batch_normalize=1
    filters=32
    size=3
    stride=1
    pad=1
    activation=leaky

    [convolutional]
    size=1
    stride=1
    pad=1
    filters=21
    activation=linear

    [yolo]
    mask = 0,1,2
    anchors = 10,14,  23,27,  37,58,  81,82,  135,169,  344,319
    classes=2
    num=6
    jitter=.3
    ignore_thresh = .7
    truth_thresh = 1
    random=1
""")


def _build(tmp_path):
    p = tmp_path / "tiny.cfg"
    p.write_text(TINY_CFG)
    return graphspec.from_cfg(str(p))


def test_tiny_cfg_builds(tmp_path):
    spec = _build(tmp_path)
    from amyloid_yolo_tpu.graphspec import MaxPoolSpec, YoloSpec

    pools = [l for l in spec.layers if isinstance(l, MaxPoolSpec)]
    assert len(pools) == 4
    assert pools[-1].kernel == 2 and pools[-1].stride == 1
    yolos = [l for l in spec.layers if isinstance(l, YoloSpec)]
    assert len(yolos) == 2
    assert yolos[0].anchors == ((81, 82), (135, 169), (344, 319))


def test_tiny_cfg_runs_and_decodes(tmp_path):
    spec = _build(tmp_path)
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    folded = darknet.fold_batchnorm(params, spec)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 96, 96, 3), jnp.float32)
    maps = darknet.apply_folded(folded, spec, x, compute_dtype=jnp.float32)
    # heads at stride 8 (96/8=12 after 3 stride-2 pools) for both scales
    # (the k2/s1 pool keeps resolution)
    assert maps[0].shape == (2, 12, 12, 21)
    assert maps[1].shape == (2, 24, 24, 21)
    pred = heads.decode_all(maps, spec, 96)
    assert pred.shape[1] == 3 * 12 * 12 + 3 * 24 * 24
    dets, valid = nms_ops.non_max_suppression(pred, 0.2, 0.4, capacity=8)
    assert dets.shape == (2, 8, 7)
    # lazy path agrees on the tiny graph too
    det, sc = heads.decode_topk(maps, spec, 96, 0.2, 8)
    d1, v1 = nms_ops.non_max_suppression_pooled(det, sc, 0.4, capacity=8)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(dets), np.asarray(d1))


def test_tiny_cfg_emitter_roundtrip(tmp_path):
    spec = _build(tmp_path)
    out = tmp_path / "emitted.cfg"
    out.write_text(graphspec.emit_cfg(spec))
    spec2 = graphspec.from_cfg(str(out))
    assert [type(l).__name__ for l in spec.layers] == \
        [type(l).__name__ for l in spec2.layers]
