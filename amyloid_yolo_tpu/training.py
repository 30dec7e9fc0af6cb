"""Training driver — the reference's ``train.py`` loop, TPU-native.

Behavioral parity (``/root/reference/train.py:27-210``):

* Adam at torch defaults, gradient accumulation every N batches (summed
  grads), multiscale resize every 10 batches, per-epoch evaluation at
  iou/conf/nms 0.5, per-epoch checkpointing, best-mAP tracking per class
  (Cored/CAA) — "dan's edit" at ``train.py:187-197``;
* ``seen`` image counting for darknet-format weight export.

TPU-native differences: one jitted step (resize+augment+loss+Adam fused,
no per-batch host sync); gradient accumulation runs as a ``lax.cond``-gated
apply inside that same jitted step; data parallelism over a mesh is the
scale-out alternative (numerically equivalent to accumulation — see
tests/test_parallel); orbax checkpoints carry optimizer state (the
reference drops it).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .evaluate import evaluate
from .graphspec import GraphSpec, yolov3_spec
from .io import weights as weights_io
from .io.datasets import ListDataset
from .models import darknet
from .parsecfg import load_classes, parse_data_config
from .parallel import steps as steps_mod
from .parallel.mesh import make_mesh
from .utils.logging import MetricsLogger


@dataclass
class TrainConfig:
    data_config: str = "config/custom.data"
    epochs: int = 100
    batch_size: int = 8
    gradient_accumulations: int = 2
    img_size: int = 416
    multiscale: bool = True
    augment: bool = True
    pretrained_weights: Optional[str] = None
    checkpoint_dir: str = "checkpoints"
    checkpoint_interval: int = 1
    evaluation_interval: int = 1
    learning_rate: float = 1e-3
    grad_clip_norm: Optional[float] = None  # None = reference behavior
    burn_in: int = 0  # darknet LR warmup steps; 0 = reference (ignored cfg)
    compute_dtype: str = "float32"  # "bfloat16": MXU-native training compute
    num_classes: int = 2
    logdir: str = "logs"
    seed: int = 0
    data_parallel: Optional[int] = None   # devices in the dp mesh (None = 1)
    spatial_shard: Optional[int] = None  # shard image HEIGHT over an sp
    #   mesh axis (composes with data_parallel: mesh is (dp, sp)).  GSPMD
    #   partitions every conv with halo exchanges and keeps BN batch stats
    #   + grads global (sync-BN semantics identical to unsharded — grad
    #   equivalence in tests/test_spatial.py).  This is what makes
    #   native-resolution (≥1536²) scale-matched TRAINING fit on a slice
    #   (BENCH.md "Spatial payoff"); on one chip it is a no-op beyond
    #   program layout.  Incompatible with distributed=True for now.
    distributed: bool = False  # multi-host (pod-scale) DP: one global mesh
    #   over every process's devices; batch_size is the GLOBAL batch and
    #   each host loads its own row block (parallel/distributed.py).  On a
    #   TPU pod the coordinator/topology fields may stay None (discovered
    #   from the TPU environment).
    coordinator_address: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None
    verbose: bool = False
    max_batches_per_epoch: Optional[int] = None  # for smoke runs
    eval_nms_capacity: int = 128  # NMS candidate pool for the in-training
    #   eval (evaluate() warns when any image's conf-passing candidates
    #   exceed it — early epochs routinely do at conf .5; raise this to
    #   make in-run mAP comparable to the reference's uncapped NMS at the
    #   cost of a larger compiled eval program)
    cache_images: bool = False  # RAM-cache decoded images across epochs
    host_resize: bool = False   # bit-identical nearest resize before transfer
    s2d_stem: Optional[bool] = None  # space-to-depth training stem; None =
    #   auto (on when the spec has the YOLOv3 stem shape).  Same function and
    #   gradients as the standard stem up to f32 summation order
    #   (tests/test_s2d_train.py); measured 25.36 -> 23.70 ms/step b8@416
    #   bf16 on v5e (tools/bench_trainstep.py --s2d-ab).
    keep_checkpoints: Optional[int] = None  # checkpoint retention: after
    #   each save, prune epoch checkpoints down to the most recent N plus
    #   every tracked best epoch (mAP / per-class / EMA).  None = reference
    #   behavior (every epoch kept, train.py:205) — a full 80-epoch run of
    #   this model writes ~50 GB of orbax state, so long runs should bound
    #   it.  Pruning runs on the main host only.
    ema_decay: Optional[float] = None  # exponential moving average of the
    #   full param tree (weights + BN stats), updated once per optimizer
    #   apply INSIDE the jitted step (steps._ema_update; TF-style warmup
    #   ramp min(decay, (1+t)/(10+t))).  When set, each eval epoch scores
    #   BOTH raw and EMA params (validation/mAP vs validation/mAP_ema) —
    #   an in-run A/B — and checkpoints carry the EMA tree.  Beyond the
    #   reference (train.py has no EMA); opt-in, default off for parity.
    image_layout: str = "planar"  # in-step image pipeline layout.  "planar"
    #   transposes ONCE at uint8 and runs resize+augment channel-planar
    #   (W-minor VPU tiles instead of 42x lane padding on C=3): measured
    #   23.76 -> 22.00 ms/step (tools/bench_trainstep.py --layout-ab).
    #   Identical results (bit-exact except the sharpen conv's ~1 ULP tap
    #   order, tests/test_augment_planar.py); "nhwc" reverts.


class Trainer:
    def __init__(self, cfg: TrainConfig, spec: Optional[GraphSpec] = None):
        self.cfg = cfg
        if cfg.distributed:
            # Join the multi-host runtime BEFORE any device access below.
            # Tolerate an embedding process (test child, launcher) having
            # already initialized it.
            from .parallel import distributed as dist_mod
            try:
                dist_mod.initialize(cfg.coordinator_address,
                                    cfg.num_processes, cfg.process_id)
            except RuntimeError as e:
                # Only an already-running runtime is benign (launcher / test
                # harness initialized first).  A genuine failure (bad
                # coordinator address, unreachable peer) must NOT silently
                # fall back to single-host training while the other hosts
                # hang on the coordinator.
                msg = str(e).lower()
                if ("already initialized" not in msg
                        and "only be called once" not in msg):
                    raise
            self._dist = dist_mod
            self.pid = jax.process_index()
            self.nproc = jax.process_count()
            if cfg.num_processes is not None and self.nproc != cfg.num_processes:
                raise RuntimeError(
                    f"distributed runtime has {self.nproc} processes but "
                    f"num_processes={cfg.num_processes} was requested — "
                    f"refusing to train on a partial pod")
        else:
            self._dist = None
            self.pid, self.nproc = 0, 1
        self.is_main = self.pid == 0
        self.spec = spec or yolov3_spec(num_classes=cfg.num_classes)
        data = parse_data_config(cfg.data_config)
        self.train_path = data["train"]
        self.valid_path = data["valid"]
        self.class_names = load_classes(data["names"]) if os.path.exists(data["names"]) \
            else [f"class{i}" for i in range(cfg.num_classes)]

        params = darknet.init_params(jax.random.PRNGKey(cfg.seed), self.spec)
        if cfg.pretrained_weights:
            params = weights_io.load_pretrained(self.spec, cfg.pretrained_weights, params)
        self.optimizer = steps_mod.make_optimizer(cfg.learning_rate,
                                                  cfg.grad_clip_norm,
                                                  burn_in=cfg.burn_in)
        self.state = steps_mod.init_train_state(
            params, self.optimizer, ema=cfg.ema_decay is not None)
        self.accum = max(1, int(cfg.gradient_accumulations or 1))
        # compute_dtype="bfloat16" runs conv forward/backward MXU-native;
        # params, loss reductions, BN stats and Adam state stay f32
        cdtype = jnp.dtype(cfg.compute_dtype)
        s2d = cfg.s2d_stem
        if s2d is None:  # auto: on whenever the stem qualifies
            try:
                darknet._check_s2d_spec(self.spec)
                s2d = bool(self.spec.layers[0].batch_normalize
                           and self.spec.layers[1].batch_normalize)
            except ValueError:
                s2d = False
        self.s2d_stem = s2d
        if self.accum > 1:
            # reference default recipe: batch 8 x accumulation 2
            # (train.py:31,116-119) — summed grads, step every N batches
            self.step_fn = steps_mod.make_accum_train_step(
                self.spec, self.optimizer, self.accum, augment=cfg.augment,
                compute_dtype=cdtype, s2d_stem=s2d,
                image_layout=cfg.image_layout, ema_decay=cfg.ema_decay,
            )
        else:
            self.step_fn = steps_mod.make_train_step(
                self.spec, self.optimizer, augment=cfg.augment,
                compute_dtype=cdtype, s2d_stem=s2d,
                image_layout=cfg.image_layout, ema_decay=cfg.ema_decay,
            )
        if cfg.spatial_shard and cfg.spatial_shard > 1:
            if cfg.distributed:
                raise ValueError("spatial_shard does not compose with "
                                 "distributed multi-host DP yet")
            from .parallel import spatial as spatial_mod

            mesh = spatial_mod.make_spatial_mesh(
                cfg.spatial_shard, cfg.data_parallel or 1)
            self.step_fn = spatial_mod.shard_spatial_train_step(
                self.step_fn, mesh)
        elif cfg.distributed and self.nproc > 1:
            mesh = self._dist.global_mesh()
            self.step_fn = self._dist.shard_train_step_multiprocess(
                self.step_fn, mesh)
        elif cfg.data_parallel and cfg.data_parallel > 1:
            mesh = make_mesh(cfg.data_parallel)
            self.step_fn = steps_mod.shard_train_step(self.step_fn, mesh)
        self.logger = MetricsLogger(cfg.logdir)
        self.best = {"map": (-1.0, -1), "Cored": (-1.0, -1), "CAA": (-1.0, -1)}
        if cfg.ema_decay is not None:
            self.best["map_ema"] = (-1.0, -1)
        self._saved_epochs: list = []
        self._eval_dataset = None  # lazy; reused across eval epochs
        self._save_thread = None   # in-flight async checkpoint write
        self._save_error: Optional[BaseException] = None
        self._snap_fn = None       # jitted on-device state copy (lazy)

    def train(self):
        cfg = self.cfg
        os.makedirs(cfg.checkpoint_dir, exist_ok=True)
        dataset = ListDataset(
            self.train_path, img_size=cfg.img_size, multiscale=cfg.multiscale,
            augment=cfg.augment, seed=cfg.seed, cache_images=cfg.cache_images,
            host_resize=cfg.host_resize,
        )
        rng = jax.random.PRNGKey(cfg.seed + 1)
        # grad-accumulation buffer lives only for this run (the reference
        # never checkpoints .grad either); the micro-batch counter plays
        # the role of train.py's batches_done
        run_state = (steps_mod.init_accum_state(self.state)
                     if self.accum > 1 else self.state)
        shard = (self.pid, self.nproc) if self.nproc > 1 else None
        if shard is not None and not cfg.host_resize:
            # host-invariant collate fallback shape: without it a host
            # whose entire local batch fails to read falls back to
            # img_size, mismatching the other hosts' native-side batches
            # and aborting the collective (datasets.probe_native_side)
            dataset.probe_native_side()
        for epoch in range(cfg.epochs):
            t0 = time.time()
            for bi, batch in enumerate(
                    dataset.iter_epoch(cfg.batch_size, shard=shard)):
                if cfg.max_batches_per_epoch and bi >= cfg.max_batches_per_epoch:
                    break
                rng, sub = jax.random.split(rng)
                # multi-host: pass this host's np rows; the sharded wrapper
                # assembles the global arrays (make_array_from_process_local_data
                # wants host buffers, not device arrays)
                cast = np.asarray if shard else jnp.asarray
                run_state, metrics = self.step_fn(
                    run_state,
                    cast(batch["images"]),
                    cast(batch["targets"]),
                    cast(batch["target_mask"]),
                    sub,
                    int(batch["img_size"]),
                )
                self.state = run_state.inner if self.accum > 1 else run_state
                if bi % 10 == 0 and self.is_main:
                    # fetch metrics only when logging (no per-step sync)
                    host = {k: float(self._fetch(v)) for k, v in metrics.items()}
                    host["epoch"] = epoch
                    host["batch"] = bi
                    self.logger.log(host, step=int(self._fetch(self.state.step)))
                    if cfg.verbose:
                        print(f"[epoch {epoch} batch {bi}] loss={host['loss']:.4f}")
            epoch_time = time.time() - t0
            t_eval0 = time.time()

            if cfg.evaluation_interval and epoch % cfg.evaluation_interval == 0:
                # Multi-host: every host evaluates identically (the eval
                # program has no collectives, so symmetric execution keeps
                # hosts in lockstep without rendezvous-timeout risk); only
                # the main host logs/prints.  Params must be host-local
                # copies — a local jit can't consume process-spanning arrays.
                if self._eval_dataset is None:
                    # one dataset for every eval epoch (decode cache), and
                    # make_eval_fn memoizes the jitted program on self.spec —
                    # a fresh program per epoch would recompile the model
                    # every eval through the remote relay.  host_resize
                    # follows the train pipeline (bit-identical nearest
                    # gather): it cuts the per-eval host->device transfer
                    # from full tiles to img_size² uint8.
                    self._eval_dataset = ListDataset(
                        self.valid_path, img_size=cfg.img_size,
                        multiscale=False, augment=False,
                        cache_images=cfg.cache_images,
                        host_resize=cfg.host_resize)
                out = evaluate(
                    self.spec, self._host_tree(self.state.params), self.valid_path,
                    iou_thres=0.5, conf_thres=0.5, nms_thres=0.5,
                    img_size=cfg.img_size, batch_size=8,
                    nms_capacity=cfg.eval_nms_capacity,
                    dataset=self._eval_dataset,
                )
                if out is not None:
                    precision, recall, ap, f1, ap_class = out
                    if self.is_main:
                        self.logger.log(
                            {
                                "validation/precision": float(precision.mean()),
                                "validation/recall": float(recall.mean()),
                                "validation/mAP": float(ap.mean()),
                                "validation/f1": float(f1.mean()),
                            },
                            step=epoch,
                        )
                    for i, c in enumerate(ap_class):
                        name = self.class_names[int(c)] if int(c) < len(self.class_names) else str(c)
                        if name in self.best and ap[i] > self.best[name][0]:
                            self.best[name] = (float(ap[i]), epoch)
                    if ap.mean() > self.best["map"][0]:
                        self.best["map"] = (float(ap.mean()), epoch)
                    if self.is_main:
                        print(f"---- epoch {epoch}: mAP {float(ap.mean()):.5f} "
                              f"({epoch_time:.1f}s)")
                elif self.is_main:
                    print("---- mAP not measured (no detections found by model)")

                if cfg.ema_decay is not None and self.state.ema is not None:
                    # in-run A/B: score the EMA iterate on the same split
                    out_ema = evaluate(
                        self.spec, self._host_tree(self.state.ema),
                        self.valid_path, iou_thres=0.5, conf_thres=0.5,
                        nms_thres=0.5, img_size=cfg.img_size, batch_size=8,
                        nms_capacity=cfg.eval_nms_capacity,
                        dataset=self._eval_dataset,
                    )
                    if out_ema is not None:
                        _, _, ap_e, _, _ = out_ema
                        m = float(ap_e.mean())
                        if self.is_main:
                            self.logger.log({"validation/mAP_ema": m},
                                            step=epoch)
                            print(f"---- epoch {epoch}: mAP_ema {m:.5f}")
                        if m > self.best["map_ema"][0]:
                            self.best["map_ema"] = (m, epoch)
                    elif self.is_main:
                        print("---- mAP_ema not measured (no detections)")

            if epoch % cfg.checkpoint_interval == 0:
                t_save0 = time.time()
                self.save_checkpoint(epoch)
                if cfg.verbose and self.is_main:
                    # wall attribution: train step loop / eval epochs /
                    # checkpoint fetch+dispatch (async write overlaps next
                    # epoch on single host)
                    print(f"[epoch {epoch} wall] train {epoch_time:.1f}s "
                          f"eval {t_save0 - t_eval0:.1f}s "
                          f"save-dispatch {time.time() - t_save0:.1f}s")
        if cfg.epochs and (cfg.epochs - 1) % cfg.checkpoint_interval != 0:
            # the reference's modulo rule (train.py:205) never saves the
            # final epoch unless it lands on the interval; always keep it
            self.save_checkpoint(cfg.epochs - 1)
        self.join_pending_save()
        if self.is_main:
            print("Best mAP: {} @ epoch: {}".format(*self.best["map"]))
            print("Best Cored mAP: {} @ epoch: {}".format(*self.best["Cored"]))
            print("Best CAA mAP: {} @ epoch: {}".format(*self.best["CAA"]))
            if "map_ema" in self.best:
                print("Best EMA mAP: {} @ epoch: {}".format(*self.best["map_ema"]))
        return self.state

    def _fetch(self, x):
        """Host value of a (possibly process-spanning replicated) array."""
        if self._dist is not None and self.nproc > 1:
            return self._dist.fetch_replicated(x)
        return x

    def _host_tree(self, tree):
        if self._dist is None or self.nproc == 1:
            return tree
        return jax.tree.map(lambda x: np.asarray(self._fetch(x)), tree)

    def save_checkpoint(self, epoch: int):
        # Multi-host: EVERY host calls orbax together — its save path runs
        # cross-host sync barriers, so a main-only save would leave the
        # other hosts' next collective paired against the barrier (gloo
        # payload-mismatch abort).  Orbax itself writes replicated/np data
        # from the primary host only.
        path = os.path.join(self.cfg.checkpoint_dir, f"yolov3_ckpt_{epoch}")
        if self._dist is None or self.nproc == 1:
            # Single-host: snapshot the state ON DEVICE (one jitted
            # whole-tree copy, an HBM pass: ~ms), then move BOTH the
            # host fetch and the orbax write to a worker thread
            # overlapped with the next epoch.  The live state is DONATED
            # into the next train step, so the worker must never read its
            # buffers — the snapshot's buffers belong to the pending save
            # alone.  (Before the snapshot, the ~1 GB device_get sat on
            # the epoch path: ~30 s/epoch through the ~35 MB/s dev-harness
            # tunnel, the largest term of the inter-epoch gap.)
            # Cost of the trade: the snapshot holds a second copy of
            # params+opt_state(+EMA) in HBM until the worker's fetch
            # completes (~1 GB for the full model — ~6% of a v5e's 16 GB,
            # sub-second to fetch on PCIe).  If a larger model runs the
            # chip near HBM capacity, drop back to a synchronous save by
            # joining the worker before the next step (or shrink the
            # train batch).
            self.join_pending_save()
            tree = {
                "params": self.state.params,
                "opt_state": self.state.opt_state,
                "step": self.state.step,
                "seen": self.state.seen,
            }
            if self.state.ema is not None:
                tree["ema_params"] = self.state.ema
            if self._snap_fn is None:
                # x * 1 of matching dtype: a real jaxpr op (not jax's
                # passthrough short-circuit, which would return the
                # donated input buffers), bit-exact incl. -0.0 (unlike
                # x + 0), and XLA's copy-insertion guarantees outputs
                # never alias non-donated inputs.
                self._snap_fn = jax.jit(lambda t: jax.tree.map(
                    lambda x: x * jnp.ones((), x.dtype), t))
            tree = self._snap_fn(tree)
            import threading

            self._save_thread = threading.Thread(
                target=self._write_checkpoint, args=(path, tree, epoch),
                name=f"ckpt-save-{epoch}", daemon=False)
            self._save_thread.start()
            return
        # Multi-host: keep the save fully synchronous — orbax's cross-host
        # barriers must not race the next epoch's collectives.
        tree = {
            "params": self._host_tree(self.state.params),
            "opt_state": self._host_tree(self.state.opt_state),
            "step": np.asarray(self._fetch(self.state.step)),
            "seen": np.asarray(self._fetch(self.state.seen)),
        }
        if self.state.ema is not None:
            tree["ema_params"] = self._host_tree(self.state.ema)
        weights_io.save_checkpoint(path, tree)
        self._saved_epochs.append(epoch)
        self._prune_checkpoints()

    def _write_checkpoint(self, path: str, tree, epoch: int):
        try:
            # fetch the device snapshot here, off the epoch path (JAX
            # transfers are thread-safe; the snapshot is not donated)
            tree = jax.device_get(tree)
            weights_io.save_checkpoint(path, tree)
            self._saved_epochs.append(epoch)
            self._prune_checkpoints()
        except BaseException as e:  # surfaced at the next join
            self._save_error = e

    def join_pending_save(self):
        """Block until the in-flight async checkpoint write (if any) lands;
        re-raise its failure so a disk error cannot pass silently."""
        t = self._save_thread
        if t is not None:
            t.join()
            self._save_thread = None
        if self._save_error is not None:
            err, self._save_error = self._save_error, None
            raise RuntimeError("async checkpoint write failed") from err

    def _prune_checkpoints(self):
        """Retention (cfg.keep_checkpoints): drop saved epoch checkpoints
        beyond the most recent N, never dropping a tracked best epoch."""
        n = self.cfg.keep_checkpoints
        if not n or not self.is_main:
            return
        best_epochs = {ep for _, ep in self.best.values() if ep >= 0}
        keep = set(self._saved_epochs[-n:]) | best_epochs
        for ep in list(self._saved_epochs):
            if ep in keep:
                continue
            path = os.path.join(self.cfg.checkpoint_dir, f"yolov3_ckpt_{ep}")
            import shutil
            shutil.rmtree(path, ignore_errors=True)
            self._saved_epochs.remove(ep)

    def load_checkpoint(self, path: str):
        tree = weights_io.load_checkpoint(path)
        # orbax restores optax state as plain dicts/lists; rebuild the
        # optimizer's pytree structure (namedtuples) around the restored
        # leaves or the first post-resume update dies on attribute access
        ref_opt = self.optimizer.init(steps_mod._split(tree["params"])[0])
        struct = jax.tree.structure(ref_opt)
        leaves = jax.tree.leaves(tree["opt_state"])
        if struct.num_leaves == len(leaves):
            opt_state = jax.tree.unflatten(struct, leaves)
        else:
            # the checkpoint was written with a differently-shaped optimizer
            # (e.g. a burn-in schedule adds a count leaf): resume params
            # only, with fresh optimizer state — the reference's resume
            # semantics (it never checkpoints optimizer state at all)
            print(f"[resume] optimizer state mismatch ({len(leaves)} leaves "
                  f"vs {struct.num_leaves} expected) — params restored, "
                  f"optimizer state reset")
            opt_state = ref_opt
        # EMA tree: restored only when this run tracks one (cfg.ema_decay);
        # if the checkpoint predates EMA, re-seed from the restored params
        # (the warmup ramp re-blends quickly).  A checkpointed EMA tree is
        # dropped when this run doesn't track EMA — carrying it would cost
        # one dead param-tree copy per donated step.
        ema = None
        if self.cfg.ema_decay is not None:
            ema = tree.get("ema_params")
            ema = (jax.tree.map(jnp.asarray, ema) if ema is not None
                   else jax.tree.map(lambda x: jnp.array(x, copy=True),
                                     tree["params"]))
        self.state = steps_mod.TrainState(
            params=tree["params"],
            opt_state=opt_state,
            step=jnp.asarray(tree["step"]),
            seen=jnp.asarray(tree["seen"]),
            ema=ema,
        )


__all__ = ["Trainer", "TrainConfig"]
