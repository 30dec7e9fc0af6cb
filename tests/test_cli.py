"""CLI surface: parser wiring, flag conventions, export round trip."""

import numpy as np
import pytest
import jax

from amyloid_yolo_tpu.cli.main import _truthy, build_parser


def test_truthy_reference_convention():
    # the reference passes booleans as strings (detect.py:132)
    assert _truthy("True") and _truthy(True) and _truthy("true") and _truthy("1")
    assert not _truthy("False") and not _truthy(None) and not _truthy("0")


def test_parser_commands():
    p = build_parser()
    for cmd in ["train", "test", "detect", "sweep", "crop", "clear", "bench",
                "export", "serve"]:
        args = p.parse_args([cmd] + (
            ["--weights_path", "x"] if cmd == "test" else
            ["--wsi_dirs", "a"] if cmd == "crop" else
            ["--directory", "d"] if cmd == "sweep" else
            ["--src", "a", "--dst", "b"] if cmd == "export" else []))
        assert args.command == cmd


def test_train_parser_defaults():
    args = build_parser().parse_args(["train"])
    assert args.epochs == 100 and args.batch_size == 8
    assert args.gradient_accumulations == 2
    assert args.img_size == 416


def test_detect_parser_operating_point():
    args = build_parser().parse_args(["detect"])
    assert args.conf_thres == 0.8 and args.nms_thres == 0.4  # README.md:39


def test_export_roundtrip(tmp_path):
    """orbax -> darknet binary -> identical params via export machinery."""
    import sys

    from amyloid_yolo_tpu.graphspec import yolov3_spec
    from amyloid_yolo_tpu.io import weights as W
    from amyloid_yolo_tpu.models import darknet

    spec = yolov3_spec(num_classes=2)
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    ck = str(tmp_path / "ck")
    W.save_checkpoint(ck, {"params": params})
    from amyloid_yolo_tpu.cli.main import main

    dst = str(tmp_path / "model.weights")
    assert main(["export", "--src", ck, "--dst", dst]) == 0
    loaded, _ = W.load_darknet_weights(spec, dst)
    np.testing.assert_allclose(
        np.asarray(loaded["conv_0"]["w"]), np.asarray(params["conv_0"]["w"]),
        rtol=1e-6)


def test_fast_path_kwargs():
    from amyloid_yolo_tpu.cli.main import _fast_path_kwargs

    p = build_parser()
    off = p.parse_args(["detect"])
    assert _fast_path_kwargs(off) == {}
    on = p.parse_args(["detect", "--fast_path", "True"])
    kw = _fast_path_kwargs(on)
    assert kw == {"precision": "int8_early", "int8_downsample": 32,
                  "lazy_decode": True, "approx_topk": True}
    sweep_on = p.parse_args(["sweep", "--directory", "d",
                             "--fast_path", "True"])
    assert _fast_path_kwargs(sweep_on)["lazy_decode"] is True


def test_resolve_batch_size_auto():
    from amyloid_yolo_tpu.detectors import resolve_batch_size

    assert resolve_batch_size("auto", 1000) == 32
    assert resolve_batch_size("auto", 64) == 32
    assert resolve_batch_size("auto", 63) == 16
    assert resolve_batch_size("auto", 3) == 16
    assert resolve_batch_size("8", 1000) == 8
    assert resolve_batch_size(16, 2) == 16


def test_fast_path_kwargs_warns_on_ignored_flags():
    """--precision / --calib_percentile without --fast_path True must warn
    (they only configure the gated fast stack) instead of being silently
    dropped — a user asking for int8 must not unknowingly run bf16."""
    from amyloid_yolo_tpu.cli.main import _fast_path_kwargs

    p = build_parser()
    args = p.parse_args(["detect", "--precision", "int8_full",
                         "--calib_percentile", "99.9"])
    with pytest.warns(UserWarning, match="only take effect"):
        assert _fast_path_kwargs(args) == {}
