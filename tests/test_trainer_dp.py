"""Trainer-level data parallelism smoke test on the virtual mesh."""

import numpy as np
from PIL import Image

import pytest

from amyloid_yolo_tpu.training import TrainConfig, Trainer

from minispec import mini_spec


def test_trainer_data_parallel(tmp_path, rng):
    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    paths = []
    for i in range(8):
        img = rng.randint(0, 255, (128, 128, 3)).astype(np.uint8)
        p = img_dir / f"t{i}.jpg"
        Image.fromarray(img).save(p)
        (lbl_dir / f"t{i}.txt").write_text("1 0.5 0.5 0.2 0.2\n")
        paths.append(str(p))
    (tmp_path / "train.txt").write_text("\n".join(paths) + "\n")
    (tmp_path / "valid.txt").write_text(paths[0] + "\n")
    (tmp_path / "classes.names").write_text("CAA\nCored\n")
    (tmp_path / "custom.data").write_text(
        f"classes=2\ntrain={tmp_path}/train.txt\nvalid={tmp_path}/valid.txt\n"
        f"names={tmp_path}/classes.names\n")

    cfg = TrainConfig(
        data_config=str(tmp_path / "custom.data"),
        epochs=1, batch_size=8, img_size=64, multiscale=False, augment=False,
        checkpoint_dir=str(tmp_path / "ck"), logdir=str(tmp_path / "logs"),
        evaluation_interval=10, max_batches_per_epoch=1, data_parallel=8,
    )
    tr = Trainer(cfg, spec=mini_spec(num_classes=2, img_size=64))
    state = tr.train()
    assert int(state.step) == 1
    assert np.isfinite(
        np.asarray(state.params["conv_0"]["w"], np.float32)).all()
