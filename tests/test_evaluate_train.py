"""Evaluation + trainer smoke tests on the mini model (CPU)."""

import os

import numpy as np
import pytest
from PIL import Image

import jax

from amyloid_yolo_tpu.evaluate import evaluate
from amyloid_yolo_tpu.models import darknet
from amyloid_yolo_tpu.training import TrainConfig, Trainer

from minispec import mini_spec


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.RandomState(0)
    paths = []
    for i in range(4):
        img = rng.randint(0, 255, (128, 128, 3)).astype(np.uint8)
        p = root / "images" / f"t{i}.jpg"
        Image.fromarray(img).save(p)
        (root / "labels" / f"t{i}.txt").write_text("1 0.5 0.5 0.2 0.2\n")
        paths.append(str(p))
    (root / "train.txt").write_text("\n".join(paths[:2]) + "\n")
    (root / "valid.txt").write_text("\n".join(paths[2:]) + "\n")
    (root / "classes.names").write_text("CAA\nCored\n")
    (root / "custom.data").write_text(
        f"classes=2\ntrain={root}/train.txt\nvalid={root}/valid.txt\n"
        f"names={root}/classes.names\n")
    return root


def test_evaluate_runs(tiny_dataset):
    spec = mini_spec(num_classes=2, img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    out = evaluate(spec, params, str(tiny_dataset / "valid.txt"),
                   iou_thres=0.5, conf_thres=0.01, nms_thres=0.5,
                   img_size=64, batch_size=2)
    # random model: may or may not produce detections, but must not crash
    if out is not None:
        p, r, ap, f1, classes = out
        assert len(ap) == len(classes)
        assert ((ap >= 0) & (ap <= 1)).all()


def test_trainer_smoke(tiny_dataset, tmp_path):
    cfg = TrainConfig(
        data_config=str(tiny_dataset / "custom.data"),
        epochs=1, batch_size=2, img_size=64, multiscale=False,
        augment=False, checkpoint_dir=str(tmp_path / "ckpts"),
        logdir=str(tmp_path / "logs"), evaluation_interval=10,
        max_batches_per_epoch=1,
    )
    tr = Trainer(cfg, spec=mini_spec(num_classes=2, img_size=64))
    state = tr.train()
    assert int(state.step) == 1
    assert os.path.isdir(tmp_path / "ckpts" / "yolov3_ckpt_0")
    # resume round trip
    tr2 = Trainer(cfg, spec=mini_spec(num_classes=2, img_size=64))
    tr2.load_checkpoint(str(tmp_path / "ckpts" / "yolov3_ckpt_0"))
    for k in state.params:
        for kk in state.params[k]:
            np.testing.assert_allclose(
                np.asarray(tr2.state.params[k][kk]),
                np.asarray(state.params[k][kk]), rtol=1e-6)
    # the restored state must be STEPPABLE (orbax flattens optax
    # namedtuples; a structure mismatch only explodes on the next update)
    state2 = tr2.train()
    assert int(state2.step) == 2
    assert np.isfinite(np.asarray(state2.params["conv_0"]["w"])).all()


def test_eval_fn_cache_memoized_and_bounded():
    """make_eval_fn returns the SAME jitted program for identical keys (no
    per-epoch recompile) and evicts LRU entries past _EVAL_FN_CACHE_MAX so
    a config-sweeping process doesn't pin dead executables forever."""
    from amyloid_yolo_tpu import evaluate as ev

    spec = mini_spec(num_classes=2, img_size=64)
    ev._EVAL_FN_CACHE.clear()
    f1 = ev.make_eval_fn(spec, 0.5, 0.5, capacity=8)
    assert ev.make_eval_fn(spec, 0.5, 0.5, capacity=8) is f1
    for cap in range(9, 10 + ev._EVAL_FN_CACHE_MAX):
        ev.make_eval_fn(spec, 0.5, 0.5, capacity=cap)
    assert len(ev._EVAL_FN_CACHE) <= ev._EVAL_FN_CACHE_MAX


def test_eval_nms_capacity_flows_through(tiny_dataset, tmp_path, monkeypatch):
    """TrainConfig.eval_nms_capacity must reach evaluate() — the in-run
    overflow warning ("more than nms_capacity conf-passing candidates")
    is only actionable if the knob it names actually exists on the
    trainer surface."""
    from amyloid_yolo_tpu import training as training_mod

    seen = []
    real_evaluate = training_mod.evaluate

    def spy(*a, **kw):
        seen.append(kw.get("nms_capacity"))
        return real_evaluate(*a, **kw)

    monkeypatch.setattr(training_mod, "evaluate", spy)
    cfg = TrainConfig(
        data_config=str(tiny_dataset / "custom.data"),
        epochs=1, batch_size=2, gradient_accumulations=1, img_size=64,
        multiscale=False, augment=False, checkpoint_dir=str(tmp_path / "ck"),
        logdir=str(tmp_path / "logs"), evaluation_interval=1,
        max_batches_per_epoch=1, eval_nms_capacity=37,
    )
    Trainer(cfg, spec=mini_spec(num_classes=2, img_size=64)).train()
    assert seen == [37]

    from amyloid_yolo_tpu.cli.main import build_parser
    args = build_parser().parse_args(["train", "--eval_nms_capacity", "256"])
    assert args.eval_nms_capacity == 256
