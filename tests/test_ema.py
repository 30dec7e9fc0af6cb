"""EMA-of-weights knob (beyond-reference capability; the reference's
``train.py`` has no EMA).

Verified here:

* the in-step EMA recurrence matches an independent numpy recurrence over
  the exact param iterates of an EMA-free twin run (same data, same RNG);
* with gradient accumulation the EMA updates only on apply micro-batches;
* checkpoints round-trip the EMA tree, and resuming a pre-EMA checkpoint
  with ``ema_decay`` set re-seeds the EMA from the restored params;
* the Trainer surfaces ``validation/mAP_ema`` and a best-EMA line.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from amyloid_yolo_tpu.models import darknet
from amyloid_yolo_tpu.parallel import steps as S

from minispec import mini_spec

DECAY = 0.95


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ema_ds")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    r = np.random.RandomState(0)
    paths = []
    for i in range(4):
        img = r.randint(0, 255, (128, 128, 3)).astype(np.uint8)
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


def _ramped(decay, t):
    return min(decay, (1.0 + t) / (10.0 + t))


def _batch(rng):
    imgs = rng.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    t = np.zeros((8, 6), np.float32)
    t[0] = [0, 1, 0.5, 0.5, 0.25, 0.25]
    t[1] = [1, 0, 0.3, 0.3, 0.2, 0.2]
    mask = np.array([True, True] + [False] * 6)
    return jnp.asarray(imgs), jnp.asarray(t), jnp.asarray(mask)


def test_ema_matches_numpy_recurrence(rng):
    spec = mini_spec(num_classes=2, img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    opt = S.make_optimizer(1e-3)
    st_ema = S.init_train_state(jax.tree.map(jnp.array, params), opt, ema=True)
    st_raw = S.init_train_state(jax.tree.map(jnp.array, params), opt)
    step_ema = S.make_train_step(spec, opt, augment=False, ema_decay=DECAY)
    step_raw = S.make_train_step(spec, opt, augment=False)
    imgs, t, mask = _batch(rng)

    flat0, _ = jax.tree_util.tree_flatten(
        jax.tree.map(np.asarray, params))
    ema_np = [np.array(x, np.float64) for x in flat0]
    for i in range(5):
        key = jax.random.PRNGKey(i)
        st_ema, _ = step_ema(st_ema, imgs, t, mask, key, 64)
        st_raw, _ = step_raw(st_raw, imgs, t, mask, key, 64)
        # raw twin must be untouched by the EMA machinery
        for a, b in zip(jax.tree.leaves(st_ema.params),
                        jax.tree.leaves(st_raw.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        d = _ramped(DECAY, i)  # state.step was i when the update ran
        flat_p = jax.tree_util.tree_flatten(
            jax.tree.map(np.asarray, st_raw.params))[0]
        ema_np = [e + (1.0 - d) * (p - e) for e, p in zip(ema_np, flat_p)]

    for got, want in zip(jax.tree.leaves(st_ema.ema), ema_np):
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-6)
    # EMA must lag the raw params (it still remembers the init)
    d0 = jax.tree.leaves(st_ema.ema)[0]
    p0 = jax.tree.leaves(st_ema.params)[0]
    assert float(jnp.abs(d0 - p0).max()) > 0


def test_ema_accum_updates_only_on_apply(rng):
    spec = mini_spec(num_classes=2, img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    opt = S.make_optimizer(1e-3)
    astate = S.init_accum_state(S.init_train_state(params, opt, ema=True))
    step = S.make_accum_train_step(spec, opt, 2, augment=False,
                                   ema_decay=DECAY)
    imgs, t, mask = _batch(rng)

    snaps = []
    for i in range(4):
        astate, metrics = step(astate, imgs, t, mask, jax.random.PRNGKey(i), 64)
        snaps.append((float(metrics["applied"]),
                      [np.asarray(x) for x in jax.tree.leaves(astate.inner.ema)]))
    # reference accumulation schedule: micro 0 applies, 1 skips, 2 applies...
    assert [a for a, _ in snaps] == [1.0, 0.0, 1.0, 0.0]
    same01 = all((x == y).all() for x, y in zip(snaps[0][1], snaps[1][1]))
    diff12 = any((x != y).any() for x, y in zip(snaps[1][1], snaps[2][1]))
    assert same01, "EMA moved on a skip micro-batch"
    assert diff12, "EMA did not move on an apply micro-batch"


def test_ema_checkpoint_roundtrip(tiny_dataset, tmp_path):
    from amyloid_yolo_tpu.training import Trainer, TrainConfig

    cfg = TrainConfig(
        data_config=str(tiny_dataset / "custom.data"),
        epochs=1, batch_size=2, gradient_accumulations=1, img_size=64,
        multiscale=False, augment=False, checkpoint_dir=str(tmp_path / "ck"),
        logdir=str(tmp_path / "logs"), evaluation_interval=0,
        ema_decay=DECAY, max_batches_per_epoch=2,
    )
    spec = mini_spec(num_classes=2, img_size=64)
    tr = Trainer(cfg, spec=spec)
    tr.train()
    assert tr.state.ema is not None

    tr2 = Trainer(cfg, spec=spec)
    tr2.load_checkpoint(str(tmp_path / "ck" / "yolov3_ckpt_0"))
    for a, b in zip(jax.tree.leaves(tr.state.ema),
                    jax.tree.leaves(tr2.state.ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a pre-EMA checkpoint (no ema_params) resumed with ema_decay set
    # re-seeds the EMA from the restored params
    cfg_plain = TrainConfig(**{**cfg.__dict__, "ema_decay": None,
                               "checkpoint_dir": str(tmp_path / "ck2")})
    trp = Trainer(cfg_plain, spec=spec)
    trp.train()
    tr3 = Trainer(cfg, spec=spec)
    tr3.load_checkpoint(str(tmp_path / "ck2" / "yolov3_ckpt_0"))
    assert tr3.state.ema is not None
    for e, p in zip(jax.tree.leaves(tr3.state.ema),
                    jax.tree.leaves(tr3.state.params)):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(p))


def test_load_pretrained_ema_suffix(tiny_dataset, tmp_path):
    """`<ckpt_dir>#ema` selects the EMA tree from every weights surface."""
    from amyloid_yolo_tpu.io import weights as weights_io
    from amyloid_yolo_tpu.training import Trainer, TrainConfig

    spec = mini_spec(num_classes=2, img_size=64)
    cfg = TrainConfig(
        data_config=str(tiny_dataset / "custom.data"),
        epochs=1, batch_size=2, gradient_accumulations=1, img_size=64,
        multiscale=False, augment=False, checkpoint_dir=str(tmp_path / "ck"),
        logdir=str(tmp_path / "logs"), evaluation_interval=0,
        ema_decay=DECAY, max_batches_per_epoch=2,
    )
    tr = Trainer(cfg, spec=spec)
    tr.train()
    ck = str(tmp_path / "ck" / "yolov3_ckpt_0")

    got_ema = weights_io.load_pretrained(spec, ck + "#ema")
    got_raw = weights_io.load_pretrained(spec, ck)
    # the tools' shared helper resolves the suffix identically
    got_ema2 = weights_io.load_ckpt_params(ck + "#ema")
    for a, b in zip(jax.tree.leaves(got_ema), jax.tree.leaves(got_ema2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(got_ema), jax.tree.leaves(tr.state.ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # EMA and raw trees differ after training steps
    assert any((np.asarray(a) != np.asarray(b)).any()
               for a, b in zip(jax.tree.leaves(got_ema),
                               jax.tree.leaves(got_raw)))

    # '#ema' on a run without EMA is a clear error
    cfg_plain = TrainConfig(**{**cfg.__dict__, "ema_decay": None,
                               "checkpoint_dir": str(tmp_path / "ckp")})
    Trainer(cfg_plain, spec=spec).train()
    with pytest.raises(KeyError):
        weights_io.load_pretrained(
            spec, str(tmp_path / "ckp" / "yolov3_ckpt_0") + "#ema")


def test_keep_checkpoints_retention(tiny_dataset, tmp_path):
    """keep_checkpoints prunes to the last N + tracked best epochs."""
    import os
    from amyloid_yolo_tpu.training import Trainer, TrainConfig

    cfg = TrainConfig(
        data_config=str(tiny_dataset / "custom.data"),
        epochs=4, batch_size=2, gradient_accumulations=1, img_size=64,
        multiscale=False, augment=False, checkpoint_dir=str(tmp_path / "ck"),
        logdir=str(tmp_path / "logs"), evaluation_interval=1,
        keep_checkpoints=1, max_batches_per_epoch=1,
    )
    tr = Trainer(cfg, spec=mini_spec(num_classes=2, img_size=64))
    tr.train()
    kept = sorted(os.listdir(tmp_path / "ck"))
    best_epochs = {ep for _, ep in tr.best.values() if ep >= 0}
    want = {f"yolov3_ckpt_{e}" for e in best_epochs | {cfg.epochs - 1}}
    assert set(kept) == want, (kept, want)
    # without retention, every epoch is kept (reference behavior)
    cfg2 = TrainConfig(**{**cfg.__dict__, "keep_checkpoints": None,
                          "checkpoint_dir": str(tmp_path / "ck2"),
                          "evaluation_interval": 0})
    Trainer(cfg2, spec=mini_spec(num_classes=2, img_size=64)).train()
    assert len(os.listdir(tmp_path / "ck2")) == cfg.epochs


def test_trainer_ema_eval_logs(tiny_dataset, tmp_path, capsys):
    from amyloid_yolo_tpu.training import Trainer, TrainConfig

    cfg = TrainConfig(
        data_config=str(tiny_dataset / "custom.data"),
        epochs=1, batch_size=2, gradient_accumulations=1, img_size=64,
        multiscale=False, augment=False, checkpoint_dir=str(tmp_path / "ck"),
        logdir=str(tmp_path / "logs"), evaluation_interval=1,
        ema_decay=DECAY, max_batches_per_epoch=2,
    )
    tr = Trainer(cfg, spec=mini_spec(num_classes=2, img_size=64))
    tr.train()
    outp = capsys.readouterr().out
    assert "mAP_ema" in outp or "Best EMA mAP" in outp
    assert "map_ema" in tr.best


def test_save_snapshot_fresh_buffers_bitexact(tiny_dataset, tmp_path):
    """The async single-host save snapshots the state ON DEVICE before the
    next step donates the live buffers.  The snapshot must be bit-exact
    (incl. -0.0, which x + 0 would flip) and must NOT alias the inputs —
    an aliased snapshot written after donation is a corrupted checkpoint.
    (CPU ignores donation, so only freshness/bit-exactness is testable
    here; the donation race itself only exists on accelerators.)"""
    from amyloid_yolo_tpu.training import Trainer, TrainConfig

    cfg = TrainConfig(
        data_config=str(tiny_dataset / "custom.data"),
        epochs=1, batch_size=2, gradient_accumulations=1, img_size=64,
        multiscale=False, augment=False, checkpoint_dir=str(tmp_path / "ck"),
        logdir=str(tmp_path / "logs"), evaluation_interval=0,
        max_batches_per_epoch=1,
    )
    tr = Trainer(cfg, spec=mini_spec(num_classes=2, img_size=64))
    tr.train()
    tr.join_pending_save()
    # build the lazily-created snapshot fn via a save, then probe it
    tr.save_checkpoint(7)
    tr.join_pending_save()
    assert tr._snap_fn is not None
    x = jnp.asarray(np.array([-0.0, 0.0, 1.5, -2.25], np.float32))
    snap = tr._snap_fn({"a": x})["a"]
    assert snap.unsafe_buffer_pointer() != x.unsafe_buffer_pointer()
    np.testing.assert_array_equal(
        np.asarray(snap).view(np.int32), np.asarray(x).view(np.int32))
    # and the written checkpoint round-trips the live params exactly
    from amyloid_yolo_tpu.io import weights as weights_io
    loaded = weights_io.load_ckpt_params(str(tmp_path / "ck" / "yolov3_ckpt_7"))
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(tr.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
