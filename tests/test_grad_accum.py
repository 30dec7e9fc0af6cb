"""Gradient accumulation: the reference's step-every-N-batches schedule
(``/root/reference/train.py:113-119``) as one jitted TPU step.

Two tiers:

* steps-level exact test — the ``lax.cond``-gated accumulate/apply must
  reproduce, bit-for-bit in f32, a manual transcription of the torch
  semantics: grads sum across batches, the optimizer applies the summed
  gradient when ``batches_done % N == 0`` (batch 0 steps alone), BN running
  stats and ``seen`` update every batch;
* trainer-level test — ``TrainConfig.gradient_accumulations`` is honored by
  ``Trainer.train`` (the round-1 gap: the flag was accepted and ignored).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from amyloid_yolo_tpu.models import darknet
from amyloid_yolo_tpu.parallel import steps as S

from minispec import mini_spec


IMG = 64


def make_batch(seed, batch=2, n_targets=2):
    r = np.random.RandomState(seed)
    images = r.randint(0, 255, (batch, IMG, IMG, 3)).astype(np.uint8)
    cap = 4
    targets = np.zeros((batch * cap, 6), np.float32)
    mask = np.zeros((batch * cap,), bool)
    for b in range(batch):
        for t in range(n_targets):
            row = b * cap + t
            targets[row] = [b, r.randint(0, 2), 0.3 + 0.4 * r.rand(),
                            0.3 + 0.4 * r.rand(), 0.15, 0.2]
            mask[row] = True
    return jnp.asarray(images), jnp.asarray(targets), jnp.asarray(mask)


@pytest.fixture(scope="module")
def spec():
    return mini_spec(num_classes=2, img_size=IMG)


def test_accum_step_matches_manual_torch_schedule(spec):
    accum = 2
    optimizer = S.make_optimizer(1e-3)
    params0 = darknet.init_params(jax.random.PRNGKey(0), spec)
    step = S.make_accum_train_step(spec, optimizer, accum, augment=False)
    grad_step = S.make_grad_step(spec, augment=False)

    batches = [make_batch(s) for s in range(3)]
    rng = jax.random.PRNGKey(1)

    # --- framework path (donating step: give it its own copy of params) -----
    params_fw = jax.tree.map(jnp.array, params0)
    astate = S.init_accum_state(S.init_train_state(params_fw, optimizer))
    applied = []
    for images, targets, mask in batches:
        astate, metrics = step(astate, images, targets, mask, rng, IMG)
        applied.append(float(metrics["applied"]))
    # reference schedule: batches_done 0 -> apply, 1 -> hold, 2 -> apply
    assert applied == [1.0, 0.0, 1.0]
    assert int(astate.inner.step) == 3
    assert int(astate.inner.seen) == 6

    # --- manual transcription of train.py:113-119 ---------------------------
    params = params0
    train, _ = S._split(params)
    opt_state = optimizer.init(train)
    grad_buffer = jax.tree.map(jnp.zeros_like, train)
    for bi, (images, targets, mask) in enumerate(batches):
        _, grads, new_stats = grad_step(params, images, targets, mask, IMG)
        grad_buffer = jax.tree.map(jnp.add, grad_buffer, grads)  # loss.backward()
        train, stats = S._split(params)
        if bi % accum == 0:                                      # optimizer.step()
            updates, opt_state = optimizer.update(grad_buffer, opt_state, train)
            train = optax.apply_updates(train, updates)
            grad_buffer = jax.tree.map(jnp.zeros_like, grad_buffer)
        params = S._merge(train, stats)
        for k, s in new_stats.items():
            params[k]["mean"] = s["mean"]
            params[k]["var"] = s["var"]

    # rtol 2e-5: the accum step and the bare grad step are separately
    # compiled programs; XLA may schedule the one-pass BN stat pair
    # (mean + E[x²] multi-output fusion) differently per program, giving
    # 1-ulp drift on a few running-stat elements.  The SCHEDULE equivalence
    # under test (sum-then-apply == consecutive loss.backward()) is exact.
    for key in params:
        for leaf in params[key]:
            np.testing.assert_allclose(
                np.asarray(astate.inner.params[key][leaf], np.float32),
                np.asarray(params[key][leaf], np.float32),
                rtol=2e-5, atol=5e-7, err_msg=f"{key}/{leaf}")


def test_accum_holds_params_between_applies(spec):
    """Between applies the trainable params must not move (BN stats do)."""
    optimizer = S.make_optimizer(1e-3)
    params0 = darknet.init_params(jax.random.PRNGKey(2), spec)
    step = S.make_accum_train_step(spec, optimizer, 3, augment=False)
    astate = S.init_accum_state(S.init_train_state(params0, optimizer))
    rng = jax.random.PRNGKey(3)

    images, targets, mask = make_batch(7)
    astate, m0 = step(astate, images, targets, mask, rng, IMG)   # micro 0: apply
    w_after_apply = np.asarray(astate.inner.params["conv_0"]["w"])
    astate, m1 = step(astate, images, targets, mask, rng, IMG)   # micro 1: hold
    astate, m2 = step(astate, images, targets, mask, rng, IMG)   # micro 2: hold
    assert (float(m0["applied"]), float(m1["applied"]), float(m2["applied"])) \
        == (1.0, 0.0, 0.0)
    np.testing.assert_array_equal(
        np.asarray(astate.inner.params["conv_0"]["w"]), w_after_apply)
    astate, m3 = step(astate, images, targets, mask, rng, IMG)   # micro 3: apply
    assert float(m3["applied"]) == 1.0
    assert not np.array_equal(
        np.asarray(astate.inner.params["conv_0"]["w"]), w_after_apply)


def test_bf16_compute_train_step(spec):
    """compute_dtype=bfloat16 trains with finite loss; master params, BN
    stats and optimizer state stay f32."""
    optimizer = S.make_optimizer(1e-3)
    params = darknet.init_params(jax.random.PRNGKey(5), spec)
    step = S.make_train_step(spec, optimizer, augment=False,
                             compute_dtype=jnp.bfloat16)
    state = S.init_train_state(params, optimizer)
    images, targets, mask = make_batch(3)
    state, m = step(state, images, targets, mask, jax.random.PRNGKey(0), IMG)
    assert np.isfinite(float(m["loss"]))
    assert state.params["conv_0"]["w"].dtype == jnp.float32
    assert state.params["bn_0"]["mean"].dtype == jnp.float32


def test_burn_in_schedule():
    """Darknet LR burn-in: lr * (step/burn_in)^4, reaching base lr after
    burn_in optimizer steps.  With a constant gradient Adam's update
    magnitude tracks the scheduled lr."""
    opt = S.make_optimizer(1e-3, burn_in=10)
    params = {"w": jnp.ones((4,))}
    state = opt.init(params)
    grads = {"w": jnp.ones((4,))}
    norms = []
    for _ in range(12):
        updates, state = opt.update(grads, state, params)
        norms.append(float(jnp.abs(updates["w"]).max()))
    assert norms[0] < norms[5] < norms[9]
    assert norms[0] < 1e-5                      # (1/10)^4 * 1e-3
    assert norms[-1] == pytest.approx(1e-3, rel=0.25)


def test_burn_in_zero_is_reference_behavior():
    a = S.make_optimizer(1e-3, burn_in=0)
    b = S.make_optimizer(1e-3)
    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.full((3,), 0.5)}
    ua, _ = a.update(grads, a.init(params), params)
    ub, _ = b.update(grads, b.init(params), params)
    np.testing.assert_array_equal(np.asarray(ua["w"]), np.asarray(ub["w"]))


def _tiny_dataset(tmp_path, rng):
    from PIL import Image

    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    paths = []
    for i in range(4):
        img = rng.randint(0, 255, (96, 96, 3)).astype(np.uint8)
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
    return str(tmp_path / "custom.data")


def test_trainer_honors_gradient_accumulations(tmp_path, rng):
    from amyloid_yolo_tpu.training import TrainConfig, Trainer

    data_cfg = _tiny_dataset(tmp_path, rng)
    cfg = TrainConfig(
        data_config=data_cfg,
        epochs=1, batch_size=2, gradient_accumulations=2, img_size=IMG,
        multiscale=False, augment=False,
        checkpoint_dir=str(tmp_path / "ck"), logdir=str(tmp_path / "logs"),
        evaluation_interval=10,
    )
    tr = Trainer(cfg, spec=mini_spec(num_classes=2, img_size=IMG))
    assert tr.accum == 2
    state = tr.train()
    assert int(state.step) == 2      # 4 images / batch 2
    assert int(state.seen) == 4
    assert np.isfinite(np.asarray(state.params["conv_0"]["w"], np.float32)).all()


def test_resume_across_optimizer_shapes(tmp_path, rng, capsys):
    """A checkpoint written with a burn-in optimizer (extra schedule-count
    leaf) resumes into a burn-in-free Trainer: params restored, optimizer
    state reset with a message (reference semantics — it never checkpoints
    optimizer state)."""
    from amyloid_yolo_tpu.training import TrainConfig, Trainer

    data_cfg = _tiny_dataset(tmp_path, rng)
    base = dict(
        data_config=data_cfg, epochs=1, batch_size=2,
        gradient_accumulations=1, img_size=IMG, multiscale=False,
        augment=False, logdir=str(tmp_path / "logs"),
        evaluation_interval=10,
    )
    spec = mini_spec(num_classes=2, img_size=IMG)
    tr1 = Trainer(TrainConfig(burn_in=5, checkpoint_dir=str(tmp_path / "ck1"),
                              **base), spec=spec)
    tr1.train()
    ckpt = str(tmp_path / "ck1" / "yolov3_ckpt_0")

    tr2 = Trainer(TrainConfig(burn_in=0, checkpoint_dir=str(tmp_path / "ck2"),
                              **base), spec=spec)
    tr2.load_checkpoint(ckpt)
    assert "optimizer state reset" in capsys.readouterr().out
    np.testing.assert_array_equal(
        np.asarray(tr2.state.params["conv_0"]["w"]),
        np.asarray(tr1.state.params["conv_0"]["w"]))
    state = tr2.train()          # must step fine post-resume
    assert int(state.step) > int(tr1.state.step) - 1

    # matching shapes restore the optimizer state exactly (no message)
    tr3 = Trainer(TrainConfig(burn_in=5, checkpoint_dir=str(tmp_path / "ck3"),
                              **base), spec=spec)
    tr3.load_checkpoint(ckpt)
    assert "optimizer state reset" not in capsys.readouterr().out
