"""Multi-process (multi-host) data parallelism — tests.

The reference is strictly single-process (SURVEY §2.3); this exercises the
new pod-scale capability in ``parallel/distributed.py`` the only way it can
be exercised without a pod: two REAL OS processes (``mp_child.py``) join a
JAX distributed runtime over loopback (CPU backend, gloo collectives, 2
virtual devices each) and run ONE global dp train step on the mini spec.
The parent then runs the identical step single-process on a 4-device mesh
and asserts the losses and post-Adam params agree — i.e. crossing a process
(DCN) boundary changes nothing about the program's semantics.

Tolerances mirror ``test_parallel.py``: gloo's cross-process all-reduce may
sum in a different order than XLA's in-process reduction, so equality is
float-reorder-noise-bounded, not bitwise; a systematic bug (wrong psum
scale, missed collective, wrong local-shard assembly) is orders of
magnitude above the bound.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def mp_run(tmp_path_factory):
    """Launch the 2-process global step once; several asserts read it."""
    out = str(tmp_path_factory.mktemp("mp") / "params0.npz")
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # children pin cpu via jax.config
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "mp_child.py"),
             str(pid), "2", str(port), out if pid == 0 else "-"],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout or "")
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"child {pid} rc={p.returncode}\n{log[-4000:]}"
        assert "MP_OK" in log, f"child {pid} incomplete\n{log[-4000:]}"
    losses = []
    for log in logs:
        line = [l for l in log.splitlines() if l.startswith("MP_LOSS ")][0]
        losses.append(float(line.split(" ", 1)[1]))
    return losses, out


def _single_process_reference():
    """The same fixture/step as mp_child.py, on a 4-device in-process mesh."""
    import jax
    import jax.numpy as jnp
    from amyloid_yolo_tpu.models import darknet
    from amyloid_yolo_tpu.parallel import steps as S
    from amyloid_yolo_tpu.parallel.mesh import make_mesh
    from minispec import mini_spec

    spec = mini_spec()
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    B, cap = 8, 4
    rngs = np.random.RandomState(5)
    imgs = rngs.randint(0, 255, (B, 64, 64, 3)).astype(np.uint8)
    targets = np.zeros((B * cap, 6), np.float32)
    mask = np.zeros((B * cap,), bool)
    for b in range(B):
        targets[b * cap] = [b, b % 2, 0.4 + 0.05 * b / B, 0.5, 0.2, 0.25]
        mask[b * cap] = True

    opt = S.make_optimizer()
    mesh = make_mesh(4)
    sharded = S.shard_train_step(
        S.make_train_step(spec, opt, augment=False), mesh)
    state = S.init_train_state(params, opt)
    s2, m = sharded(state, jnp.asarray(imgs), jnp.asarray(targets),
                    jnp.asarray(mask), jax.random.PRNGKey(0), 64)
    flat = {f"{k}/{kk}": np.asarray(v)
            for k, entry in s2.params.items() for kk, v in entry.items()}
    return float(m["loss"]), flat


def test_two_process_step_matches_single_process(mp_run):
    losses, out = mp_run
    # Both processes run the same global program — identical replicated loss.
    assert losses[0] == losses[1], losses

    ref_loss, ref_params = _single_process_reference()
    np.testing.assert_allclose(losses[0], ref_loss, rtol=1e-5)

    got = np.load(out)
    assert set(got.files) == set(ref_params)
    # Post-Adam bound (see test_parallel.py): a near-zero gradient element
    # can sign-flip under reduction reorder and move by up to 2·lr.
    lr = 1e-3
    for k in ref_params:
        np.testing.assert_allclose(
            got[k], ref_params[k], rtol=1e-4, atol=2.05 * lr, err_msg=k)


def test_process_shard_partitions_evenly():
    from amyloid_yolo_tpu.parallel import distributed as dist

    items = list(range(11))
    shards = [dist.process_shard(items, pid, 4) for pid in range(4)]
    # Uneven tail (11 % 4 = 3 items) dropped so hosts stay in lockstep.
    assert all(len(s) == 2 for s in shards)
    assert sorted(x for s in shards for x in s) == list(range(8))
    # Single process: identity, nothing dropped.
    assert dist.process_shard(items, 0, 1) == items


def _write_tiny_dataset(root: str, n_train: int = 8, n_valid: int = 2):
    """64² PNG tiles + YOLO labels + .data config (PNG: lossless, so the
    child processes and the in-process reference decode identical pixels)."""
    from PIL import Image

    rng = np.random.RandomState(7)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "labels"), exist_ok=True)
    paths = []
    for i in range(n_train + n_valid):
        img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
        p = os.path.join(root, "images", f"t{i}.png")
        Image.fromarray(img).save(p)
        with open(os.path.join(root, "labels", f"t{i}.txt"), "w") as fh:
            fh.write(f"{i % 2} 0.5 0.5 0.25 0.25\n0 0.3 0.3 0.2 0.2\n")
        paths.append(p)
    with open(os.path.join(root, "train.txt"), "w") as fh:
        fh.write("\n".join(paths[:n_train]) + "\n")
    with open(os.path.join(root, "valid.txt"), "w") as fh:
        fh.write("\n".join(paths[n_train:]) + "\n")
    with open(os.path.join(root, "classes.names"), "w") as fh:
        fh.write("CAA\nCored\n")
    data = os.path.join(root, "custom.data")
    with open(data, "w") as fh:
        fh.write(f"classes=2\ntrain={root}/train.txt\nvalid={root}/valid.txt\n"
                 f"names={root}/classes.names\n")
    return data


def test_two_process_trainer_end_to_end(tmp_path):
    """The REAL Trainer with distributed=True across 2 OS processes ==
    the single-process data_parallel=4 Trainer: same per-batch losses, same
    final checkpoint (Adam-noise bound), checkpoints/logs written by the
    main host only."""
    import glob
    import json

    data_root = str(tmp_path / "data")
    os.makedirs(data_root)
    data_cfg = _write_tiny_dataset(data_root)

    out = str(tmp_path / "mp")
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "mp_trainer_child.py"),
             str(pid), "2", str(port), data_root, out],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout or "")
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"child {pid} rc={p.returncode}\n{log[-4000:]}"
        assert "MP_TRAIN_OK" in log, f"child {pid} incomplete\n{log[-4000:]}"
    # Only the main host prints/logs/saves.
    assert "loss=" in logs[0] and "loss=" not in logs[1]
    ckpts = sorted(os.listdir(os.path.join(out, "ckpt")))
    assert ckpts == ["yolov3_ckpt_0", "yolov3_ckpt_1"], ckpts

    # Identical run, single process, dp over 4 in-process devices.
    from amyloid_yolo_tpu.training import Trainer, TrainConfig
    from amyloid_yolo_tpu.io import weights as weights_io
    from minispec import mini_spec

    ref_out = str(tmp_path / "sp")
    cfg = TrainConfig(
        data_config=data_cfg, epochs=2, batch_size=4,
        gradient_accumulations=1, img_size=64, multiscale=False,
        augment=False, evaluation_interval=0,
        checkpoint_dir=os.path.join(ref_out, "ckpt"),
        logdir=os.path.join(ref_out, "logs"), seed=0, data_parallel=4)
    trainer = Trainer(cfg, spec=mini_spec())
    state = trainer.train()

    def logged_losses(logdir):
        events = sorted(glob.glob(os.path.join(logdir, "*", "events.jsonl")))
        assert events, logdir
        recs = [json.loads(l) for f in events for l in open(f)]
        return [(r["epoch"], r["batch"], r["loss"]) for r in recs if "loss" in r]

    mp_losses = logged_losses(os.path.join(out, "logs"))
    sp_losses = logged_losses(os.path.join(ref_out, "logs"))
    assert len(mp_losses) == len(sp_losses) == 2  # bi==0 of each epoch
    for (e1, b1, l1), (e2, b2, l2) in zip(mp_losses, sp_losses):
        assert (e1, b1) == (e2, b2)
        np.testing.assert_allclose(l1, l2, rtol=1e-5)

    # Final checkpoints agree. 4 Adam steps compound the per-step
    # sign-flip bound (2.05·lr each, see test_parallel.py) — use 4×.
    tree = weights_io.load_checkpoint(os.path.join(out, "ckpt", "yolov3_ckpt_1"))
    lr = 1e-3
    for k, entry in state.params.items():
        for kk, v in entry.items():
            np.testing.assert_allclose(
                np.asarray(tree["params"][k][kk]), np.asarray(v),
                rtol=1e-3, atol=4 * 2.05 * lr, err_msg=f"{k}.{kk}")


def test_local_batch_size_validates():
    from amyloid_yolo_tpu.parallel import distributed as dist
    from amyloid_yolo_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(4)
    # Single-process mesh: all devices local, so the local share is global.
    assert dist.local_batch_size(8, mesh) == 8
    with pytest.raises(ValueError):
        dist.local_batch_size(6, mesh)
