"""Jitted train/eval steps, single-chip and data-parallel.

Replaces the reference train loop's per-batch torch autograd + host metric
syncs (``train.py:104-156``, ``models.py:171-222``) with one compiled step:

    uint8 batch → device resize/normalize → augment → forward(train BN) →
    YOLO loss → grad → Adam update → new params/stats/metrics

Data parallelism (new capability — the reference is single-device) comes
from running the SAME step over a ``Mesh`` with the batch sharded on ``dp``
and params replicated: the loss is a global-batch mean, so XLA inserts the
gradient all-reduce over ICI.  Because the program semantics are global,
BatchNorm batch statistics are computed over the *global* batch — i.e. DP
training here is numerically the reference's single-device semantics at the
global batch size (sync-BN), not per-replica BN; tests assert DP ≡
single-device bit-for-bit-ish (f32 tolerances).

Gradient accumulation (``train.py:116-119``: optimizer step every N batches
on summed gradients — summed, not averaged, exactly like consecutive
``loss.backward()`` calls) is a first-class step via
``make_accum_train_step``; ``make_grad_step`` exposes the bare gradient for
the DP ≡ accumulation equivalence tests.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax

from ..graphspec import GraphSpec
from ..models import darknet
from ..ops.augment import augment_batch
from ..ops.loss import yolo_loss
from ..ops.preprocess import resize_nearest


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any          # full param tree (conv w/b + bn scale/bias/mean/var)
    opt_state: Any
    step: jnp.ndarray
    seen: jnp.ndarray    # images seen (reference Darknet.seen)
    # Exponential moving average of the FULL param tree (weights + BN
    # running stats), updated once per optimizer apply when the step was
    # built with ema_decay (beyond-reference capability; the reference
    # trainer has no EMA).  None = disabled (empty pytree node, so every
    # existing TrainState(...) call site and checkpoint stays valid).
    ema: Any = None


TRAINABLE_BN_KEYS = ("scale", "bias")


def _split(params):
    """Partition the param tree into (trainable, bn running stats)."""
    train, stats = {}, {}
    for k, entry in params.items():
        if k.startswith("bn_"):
            train[k] = {kk: entry[kk] for kk in TRAINABLE_BN_KEYS}
            stats[k] = {"mean": entry["mean"], "var": entry["var"]}
        else:
            train[k] = dict(entry)
    return train, stats


def _merge(train, stats):
    out = {}
    for k, entry in train.items():
        if k.startswith("bn_"):
            out[k] = {**entry, **stats[k]}
        else:
            out[k] = dict(entry)
    return out


def make_optimizer(learning_rate: float = 1e-3,
                   grad_clip_norm: float | None = None,
                   burn_in: int = 0,
                   burn_in_power: float = 4.0) -> optax.GradientTransformation:
    """torch.optim.Adam defaults (``train.py:81``): lr 1e-3, betas (0.9,
    0.999), eps 1e-8.

    ``grad_clip_norm`` adds global-norm clipping — the reference never clips
    (it fine-tunes pretrained weights); recommended for from-scratch
    training.

    ``burn_in > 0`` enables darknet's LR burn-in, ``lr * (step/burn_in)^4``
    until ``burn_in`` optimizer steps: the cfg declares ``burn_in=1000``
    (``config/yolov3-custom.cfg:17``) but the reference's torch trainer
    parses and IGNORES it (plain Adam, ``train.py:81``) — opt-in here,
    default off for parity.  With gradient accumulation the count advances
    per optimizer apply, like darknet's per-step seen counter.
    """
    if burn_in and burn_in > 0:
        base = float(learning_rate)
        bi = float(burn_in)

        def schedule(step):
            frac = jnp.minimum((jnp.asarray(step, jnp.float32) + 1.0) / bi, 1.0)
            return base * frac ** burn_in_power

        adam = optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8)
    else:
        adam = optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    if grad_clip_norm is None:
        return adam
    return optax.chain(optax.clip_by_global_norm(grad_clip_norm), adam)


def init_train_state(params, optimizer: optax.GradientTransformation,
                     ema: bool = False) -> TrainState:
    train, _ = _split(params)
    return TrainState(
        params=params,
        opt_state=optimizer.init(train),
        step=jnp.zeros((), jnp.int32),
        seen=jnp.zeros((), jnp.int32),
        # fresh buffers (copy=True): the state is donated into the jitted
        # step, and a leaf aliased with params would be a double donation
        ema=jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        if ema else None,
    )


def _ema_update(ema, params, decay: float, step):
    """One EMA step over the full param tree.

    Effective decay uses the TensorFlow ``ExponentialMovingAverage``
    warmup ramp ``min(decay, (1 + t) / (10 + t))`` so the average is
    usable from the first epochs instead of being dominated by the init
    snapshot; ``t`` is the micro-batch counter (``state.step``).  The
    ``e + (1 - d) * (p - e)`` form avoids catastrophic cancellation at
    d → 1.
    """
    t = jnp.asarray(step, jnp.float32)
    d = jnp.minimum(jnp.float32(decay), (1.0 + t) / (10.0 + t))
    return jax.tree.map(lambda e, p: e + (1.0 - d) * (p - e), ema, params)


def make_train_step(
    spec: GraphSpec,
    optimizer: optax.GradientTransformation,
    *,
    augment: bool = True,
    compute_dtype=jnp.float32,
    s2d_stem: bool = False,
    image_layout: str = "nhwc",
    ema_decay: float | None = None,
):
    """Build the jitted train step.

    Signature: ``step(state, images_u8 (B,S0,S0,3), targets (T,6),
    target_mask (T,), rng, img_size) -> (state, metrics)``; ``img_size`` is
    static (the multiscale schedule compiles one program per size, 7 total).
    ``ema_decay`` folds an EMA update of the full (post-apply) param tree
    into the same program — no extra dispatch (the ~1.7 ms host floor per
    dispatch would cost ~8% of a b8 step on this harness).
    """

    def loss_fn(train_params, stats, images, targets, target_mask, img_size):
        params = _merge(train_params, stats)
        maps, new_stats = darknet.apply(
            params, spec, images, train=True, compute_dtype=compute_dtype,
            s2d_stem=s2d_stem, input_layout=image_layout,
        )
        total, per_head = yolo_loss(maps, spec, img_size, targets, target_mask)
        return total, (new_stats, per_head)

    @functools.partial(jax.jit, static_argnames=("img_size",), donate_argnums=(0,))
    def step(state: TrainState, images_u8, targets, target_mask, rng, img_size: int):
        if image_layout == "planar":
            # one C-minor pass at uint8, then every pipeline op runs W-minor
            images_u8 = jnp.transpose(images_u8, (0, 3, 1, 2))
        images = resize_nearest(images_u8, img_size,
                                layout=image_layout).astype(jnp.float32) / 255.0
        if augment:
            images, targets, target_mask = augment_batch(
                rng, images, targets, target_mask, layout=image_layout
            )
        train_params, stats = _split(state.params)
        (total, (new_stats, per_head)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(train_params, stats, images, targets, target_mask, img_size)

        updates, new_opt = optimizer.update(grads, state.opt_state, train_params)
        new_train = optax.apply_updates(train_params, updates)
        merged = _merge(new_train, stats)
        for k, s in new_stats.items():  # BN running-stat update
            merged[k]["mean"] = s["mean"]
            merged[k]["var"] = s["var"]

        metrics = {"loss": total}
        for hi, m in enumerate(per_head):
            for name, v in m.items():
                metrics[f"head{hi}/{name}"] = v
        new_state = TrainState(
            params=merged,
            opt_state=new_opt,
            step=state.step + 1,
            seen=state.seen + images_u8.shape[0],
            ema=_ema_update(state.ema, merged, ema_decay, state.step)
            if ema_decay is not None else state.ema,
        )
        return new_state, metrics

    return step


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AccumState:
    """Train state + gradient-accumulation buffer (summed grads, like
    consecutive torch ``loss.backward()`` calls)."""
    inner: TrainState
    grad_sum: Any        # same pytree as the trainable params
    micro: jnp.ndarray   # global micro-batch counter (reference batches_done)


def init_accum_state(state: TrainState) -> AccumState:
    train, _ = _split(state.params)
    return AccumState(
        inner=state,
        grad_sum=jax.tree.map(jnp.zeros_like, train),
        micro=jnp.zeros((), jnp.int32),
    )


def make_accum_train_step(
    spec: GraphSpec,
    optimizer: optax.GradientTransformation,
    accum_steps: int,
    *,
    augment: bool = True,
    compute_dtype=jnp.float32,
    s2d_stem: bool = False,
    image_layout: str = "nhwc",
    ema_decay: float | None = None,
):
    """Train step with the reference's gradient-accumulation schedule.

    ``train.py:113-119``: every batch runs forward/backward (grads sum into
    the buffer, BN running stats and ``seen`` update); the optimizer applies
    the summed gradients when ``batches_done % gradient_accumulations == 0``
    — i.e. batch 0 steps alone, then batches 1..N sum and apply at batch N,
    and the buffer carries across epoch boundaries exactly like torch's
    un-zeroed ``.grad``.  One jitted program; the apply is a ``lax.cond``.
    """

    def loss_fn(train_params, stats, images, targets, target_mask, img_size):
        params = _merge(train_params, stats)
        maps, new_stats = darknet.apply(
            params, spec, images, train=True, compute_dtype=compute_dtype,
            s2d_stem=s2d_stem, input_layout=image_layout,
        )
        total, per_head = yolo_loss(maps, spec, img_size, targets, target_mask)
        return total, (new_stats, per_head)

    @functools.partial(jax.jit, static_argnames=("img_size",), donate_argnums=(0,))
    def step(astate: AccumState, images_u8, targets, target_mask, rng, img_size: int):
        state = astate.inner
        if image_layout == "planar":
            # one C-minor pass at uint8, then every pipeline op runs W-minor
            images_u8 = jnp.transpose(images_u8, (0, 3, 1, 2))
        images = resize_nearest(images_u8, img_size,
                                layout=image_layout).astype(jnp.float32) / 255.0
        if augment:
            images, targets, target_mask = augment_batch(
                rng, images, targets, target_mask, layout=image_layout
            )
        train_params, stats = _split(state.params)
        (total, (new_stats, per_head)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(train_params, stats, images, targets, target_mask, img_size)

        grad_sum = jax.tree.map(jnp.add, astate.grad_sum, grads)
        do_apply = (astate.micro % accum_steps) == 0

        def apply_fn(op):
            g, opt_state, tp = op
            updates, new_opt = optimizer.update(g, opt_state, tp)
            new_tp = optax.apply_updates(tp, updates)
            return new_tp, new_opt, jax.tree.map(jnp.zeros_like, g)

        def skip_fn(op):
            g, opt_state, tp = op
            return tp, opt_state, g

        new_train, new_opt, grad_sum = jax.lax.cond(
            do_apply, apply_fn, skip_fn, (grad_sum, state.opt_state, train_params)
        )

        merged = _merge(new_train, stats)
        for k, s in new_stats.items():  # BN running stats update every batch
            merged[k]["mean"] = s["mean"]
            merged[k]["var"] = s["var"]

        if ema_decay is not None:
            # EMA tracks optimizer iterates: update only on apply
            # micro-batches (between applies the trainable params are
            # unchanged, and updating anyway would shrink the effective
            # decay horizon by the accumulation factor)
            new_ema = jax.lax.cond(
                do_apply,
                lambda _: _ema_update(state.ema, merged, ema_decay, state.step),
                lambda _: state.ema,
                None,
            )
        else:
            new_ema = state.ema

        metrics = {"loss": total, "applied": do_apply.astype(jnp.float32)}
        for hi, m in enumerate(per_head):
            for name, v in m.items():
                metrics[f"head{hi}/{name}"] = v
        new_state = TrainState(
            params=merged,
            opt_state=new_opt,
            step=state.step + 1,
            seen=state.seen + images_u8.shape[0],
            ema=new_ema,
        )
        return AccumState(inner=new_state, grad_sum=grad_sum,
                          micro=astate.micro + 1), metrics

    return step


def make_grad_step(spec: GraphSpec, *, augment: bool = False,
                   compute_dtype=jnp.float32, s2d_stem: bool = False,
                   image_layout: str = "nhwc"):
    """Gradient-only step (no optimizer) — used by the grad-accumulation
    trainer and by the DP≡accumulation equivalence tests."""

    def loss_fn(train_params, stats, images, targets, target_mask, img_size):
        params = _merge(train_params, stats)
        maps, new_stats = darknet.apply(
            params, spec, images, train=True, compute_dtype=compute_dtype,
            s2d_stem=s2d_stem, input_layout=image_layout,
        )
        total, _ = yolo_loss(maps, spec, img_size, targets, target_mask)
        return total, new_stats

    @functools.partial(jax.jit, static_argnames=("img_size",))
    def grad_step(params, images_u8, targets, target_mask, img_size: int, rng=None):
        if image_layout == "planar":
            images_u8 = jnp.transpose(images_u8, (0, 3, 1, 2))
        images = resize_nearest(images_u8, img_size,
                                layout=image_layout).astype(jnp.float32) / 255.0
        if augment:
            images, targets, target_mask = augment_batch(
                rng, images, targets, target_mask, layout=image_layout)
        train_params, stats = _split(params)
        (total, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            train_params, stats, images, targets, target_mask, img_size
        )
        return total, grads, new_stats

    return grad_step


def make_eval_forward(spec: GraphSpec, *, compute_dtype=jnp.float32):
    """Eval forward returning decoded predictions (B, N, 5+C)."""
    from ..models import heads

    @functools.partial(jax.jit, static_argnames=("img_size",))
    def fwd(params, images_u8, img_size: int):
        images = resize_nearest(images_u8, img_size).astype(jnp.float32) / 255.0
        maps, _ = darknet.apply(params, spec, images, compute_dtype=compute_dtype)
        return heads.decode_all(maps, spec, img_size)

    return fwd


def shard_train_step(step_fn, mesh):
    """Wrap a train step so batch/target inputs land sharded on dp and the
    state stays replicated.  jit + NamedSharding: XLA derives the psum."""
    from .mesh import batch_sharding, replicated

    bs = batch_sharding(mesh)
    rep = replicated(mesh)

    def sharded(state, images_u8, targets, target_mask, rng, img_size):
        images_u8 = jax.device_put(images_u8, bs)
        targets = jax.device_put(targets, bs)
        target_mask = jax.device_put(target_mask, bs)
        state = jax.device_put(state, rep)
        return step_fn(state, images_u8, targets, target_mask, rng, img_size)

    return sharded


__all__ = [
    "TrainState", "AccumState", "make_optimizer", "init_train_state",
    "init_accum_state", "make_train_step", "make_accum_train_step",
    "make_grad_step", "make_eval_forward", "shard_train_step",
]
