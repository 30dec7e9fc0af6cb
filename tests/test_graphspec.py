"""Graph spec construction, cfg parsing, and cfg round-tripping."""

import os

import pytest

from amyloid_yolo_tpu import emit_cfg, from_cfg, yolov3_spec
from amyloid_yolo_tpu.graphspec import ConvSpec, YoloSpec
from amyloid_yolo_tpu.parsecfg import parse_data_config, parse_model_config


def test_yolov3_structure():
    spec = yolov3_spec(num_classes=2)
    assert len(spec.layers) == 107
    assert spec.yolo_indices == (82, 94, 106)
    assert len(spec.conv_indices) == 75
    # three head convs are 21 = 3*(5+2) filters, linear, no BN
    for yi in spec.yolo_indices:
        head_conv = spec.layers[yi - 1]
        assert isinstance(head_conv, ConvSpec)
        assert head_conv.out_ch == 21
        assert head_conv.activation == "linear"
        assert not head_conv.batch_normalize
    # anchor masks per scale
    yolos = [spec.layers[i] for i in spec.yolo_indices]
    assert yolos[0].anchors == ((116, 90), (156, 198), (373, 326))
    assert yolos[2].anchors == ((10, 13), (16, 30), (33, 23))


def test_cfg_roundtrip(tmp_path):
    spec = yolov3_spec(num_classes=2)
    p = tmp_path / "gen.cfg"
    p.write_text(emit_cfg(spec))
    spec2 = from_cfg(str(p))
    assert spec.layers == spec2.layers
    assert spec.out_channels == spec2.out_channels


def test_reference_cfg_cross_validation():
    """When the reference mount is present, our native builder must compile
    to the exact same layer graph as its cfg."""
    ref = "/root/reference/config/yolov3-custom.cfg"
    if not os.path.exists(ref):
        pytest.skip("reference mount not available")
    spec = from_cfg(ref)
    assert spec.layers == yolov3_spec(num_classes=2).layers


def test_parse_data_config(tmp_path):
    p = tmp_path / "d.data"
    p.write_text("classes= 3\ntrain=data/custom/train.txt\n# comment\n\nnames=x.names\n")
    opts = parse_data_config(str(p))
    assert opts["classes"] == "3"
    assert opts["train"] == "data/custom/train.txt"
    assert opts["names"] == "x.names"
    assert opts["gpus"] == "0,1,2,3"  # reference default retained


def test_parse_model_config_defaults(tmp_path):
    p = tmp_path / "m.cfg"
    p.write_text("[net]\nwidth=32\nheight=32\n[convolutional]\nfilters=4\nsize=3\nstride=1\nactivation=leaky\n")
    blocks = parse_model_config(str(p))
    assert blocks[0]["type"] == "net"
    assert blocks[1]["batch_normalize"] == "0"  # default injected


def test_num_classes_and_consumers():
    spec = yolov3_spec(num_classes=2)
    assert spec.num_classes == 2
    # layer 36 (stride-8 features) must be consumed by the head-3 route
    assert any(c > 94 for c in spec.consumers[36])
    # layer 61 consumed by head-2 route
    assert any(82 < c <= 94 for c in spec.consumers[61])


def test_custom_anchors_spec_and_cfg_roundtrip(tmp_path):
    """yolov3_spec(anchors=...) installs the 9-entry custom table under the
    standard masks (largest triple → stride-32 head) and survives an
    emit_cfg → from_cfg round trip (the tools/estimate_anchors.py path)."""
    anchors = [(10, 11), (12, 13), (14, 15), (20, 21), (22, 23), (24, 25),
               (30, 31), (40, 41), (50, 51)]
    spec = yolov3_spec(num_classes=2, img_size=512, anchors=anchors)
    yolos = [spec.layers[i] for i in spec.yolo_indices]
    assert yolos[0].anchors == ((30, 31), (40, 41), (50, 51))  # stride 32
    assert yolos[1].anchors == ((20, 21), (22, 23), (24, 25))  # stride 16
    assert yolos[2].anchors == ((10, 11), (12, 13), (14, 15))  # stride 8
    assert spec.net.width == 512

    p = tmp_path / "anchored.cfg"
    p.write_text(emit_cfg(spec))
    spec2 = from_cfg(str(p))
    assert [spec2.layers[i].anchors for i in spec2.yolo_indices] == \
        [l.anchors for l in yolos]
    assert spec2.net.width == 512
    # params are anchor-independent: a checkpoint trained under one table
    # loads under another (the decode, not the weights, changes)
    assert spec2.out_channels == spec.out_channels


def test_default_anchor_table_unchanged():
    """anchors=None keeps the reference's hardcoded COCO table exactly
    (config/create_custom_model.sh)."""
    from amyloid_yolo_tpu.graphspec import YOLOV3_ANCHORS

    spec = yolov3_spec(num_classes=2)
    yolos = [spec.layers[i] for i in spec.yolo_indices]
    assert yolos[0].anchors == tuple(YOLOV3_ANCHORS[m] for m in (6, 7, 8))
    assert yolos[2].anchors == tuple(YOLOV3_ANCHORS[m] for m in (0, 1, 2))
