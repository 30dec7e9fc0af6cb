"""Spatial sharding: native-resolution inference across chips.

The reference downsamples every 1536² tile to 416² before detection
(``Resize(416)``, ``validation.py:90``) because one GPU cannot hold the
native-resolution activations.  On a TPU slice the closest analog of
sequence/context parallelism for this CNN (SURVEY §5 "long-context") is
**spatial** sharding: partition the image height across the ``sp`` mesh
axis and let GSPMD partition every convolution with halo exchanges over
ICI — no manual collective choreography, the same functional model runs
unmodified.

This enables detection at full 1536² input (stride-8 head sees 192×192
cells instead of 52×52), a capability the reference does not have; it is
exercised on the virtual CPU mesh in tests and kept independent of the
production 416² path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graphspec import GraphSpec
from ..models import darknet, heads
from ..utils.memo import memoized_program


# Memoize the jitted programs: jax.jit caches by function identity, so a
# fresh closure per call would recompile the full native-resolution model
# on EVERY batch (the same defect evaluate.make_eval_fn memoizes away —
# a multi-minute remote compile per sweep batch here).  Keyed on id(spec)/
# id(mesh) with both guarded by identity in utils.memo (shared policy
# with evaluate.make_eval_fn), LRU-bounded so a many-resolution sweep
# doesn't pin dead compiled programs.
_FN_CACHE: dict = {}
_FN_CACHE_MAX = 8


def _memoized(kind: str, spec, mesh, key_tail, build):
    key = (kind, id(spec), id(mesh)) + key_tail
    return memoized_program(_FN_CACHE, _FN_CACHE_MAX, key, (spec, mesh),
                            build)


def make_spatial_mesh(n_sp: int, n_dp: int = 1) -> Mesh:
    devs = jax.devices()
    need = n_sp * n_dp
    if need > len(devs):
        raise ValueError(f"need {need} devices, have {len(devs)}")
    arr = np.array(devs[:need]).reshape(n_dp, n_sp)
    return Mesh(arr, ("dp", "sp"))


def spatial_forward(
    params,
    spec: GraphSpec,
    tiles: jnp.ndarray,
    mesh: Mesh,
    img_dim: Optional[int] = None,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Run the detector forward with activations sharded (batch over dp,
    height over sp); returns decoded predictions (replicated).

    ``tiles``: (B, S, S, 3) float input (already normalized).  XLA inserts
    halo exchanges for every conv under the hood; the decoded output is
    small, so it is returned unsharded.
    """
    img_dim = img_dim or tiles.shape[1]
    x_sharding = NamedSharding(mesh, P("dp", "sp", None, None))
    rep = NamedSharding(mesh, P())
    folded = _is_folded(params)

    def build():
        @jax.jit
        def fwd(p, x):
            maps = darknet.apply_folded(p, spec, x, compute_dtype=compute_dtype) \
                if folded else darknet.apply(p, spec, x, compute_dtype=compute_dtype)[0]
            out = heads.decode_all(list(maps), spec, img_dim)
            return jax.lax.with_sharding_constraint(out, rep)
        return fwd

    fwd = _memoized(
        "forward", spec, mesh,
        (int(img_dim), jnp.dtype(compute_dtype).name, folded), build)
    x = jax.device_put(tiles, x_sharding)
    p = jax.device_put(params, rep)
    return fwd(p, x)


def _is_folded(params) -> bool:
    return not any(k.startswith("bn_") for k in params)


def spatial_detect(
    params,
    spec: GraphSpec,
    tiles_u8: jnp.ndarray,
    mesh: Mesh,
    conf_thres: float = 0.8,
    nms_thres: float = 0.4,
    capacity: int = 64,
    compute_dtype=jnp.float32,
):
    """Full detection pipeline at NATIVE (≥1536²) resolution on an sp mesh.

    The high-resolution inference path (r3 verdict #8 wiring): uint8 tiles
    → normalize → :func:`spatial_forward`-style sharded backbone (height
    over ``sp``, batch over ``dp``; GSPMD inserts conv halo exchanges) →
    decode + merging NMS on the replicated head outputs.  Boxes come back
    in the INPUT's own pixel space (no rescale: the input is the tile).

    Returns ``(dets (B, capacity, 7), valid (B, capacity), n_candidates)``
    — the same contract as ``Detector``'s compiled pipeline.
    """
    from ..ops import nms as nms_ops

    img_dim = int(tiles_u8.shape[1])
    x_sharding = NamedSharding(mesh, P("dp", "sp", None, None))
    rep = NamedSharding(mesh, P())
    folded = _is_folded(params)

    def build():
        @jax.jit
        def fwd(p, x_u8):
            x = x_u8.astype(jnp.float32) / 255.0
            maps = darknet.apply_folded(p, spec, x, compute_dtype=compute_dtype) \
                if folded else darknet.apply(p, spec, x,
                                             compute_dtype=compute_dtype)[0]
            pred = heads.decode_all(list(maps), spec, img_dim)
            pred = jax.lax.with_sharding_constraint(pred, rep)
            return nms_ops.non_max_suppression(pred, conf_thres, nms_thres,
                                               capacity, return_count=True)
        return fwd

    fwd = _memoized(
        "detect", spec, mesh,
        (img_dim, float(conf_thres), float(nms_thres), int(capacity),
         jnp.dtype(compute_dtype).name, folded), build)
    x = jax.device_put(tiles_u8, x_sharding)
    p = jax.device_put(params, rep)
    return fwd(p, x)


def spatial_image_sharding(mesh: Mesh) -> NamedSharding:
    """Batch over ``dp``, image HEIGHT over ``sp`` (NHWC uint8 input).

    The train step may transpose to planar (B, C, H, W) internally; GSPMD
    propagates the height partition through the transpose, so the same
    input sharding serves both layouts."""
    return NamedSharding(mesh, P("dp", "sp", None, None))


def shard_spatial_train_step(step_fn, mesh: Mesh):
    """Wrap a train step from :mod:`..parallel.steps` so activations run
    HEIGHT-sharded over ``sp`` (batch over ``dp``) — the spatially-sharded
    TRAINING step round 4's resolution experiments call for (BENCH.md
    "Spatial payoff": native-resolution detection needs scale-matched
    *training*, and at 1536² that training is exactly what spatial sharding
    makes fit).

    No step-function surgery is needed — that is the point of the global-
    semantics design: under one jitted program XLA partitions every conv
    with halo exchanges over ICI, reduces the BatchNorm *batch* statistics
    over the full (B, H, W) array (i.e. across ``sp`` × ``dp`` — sync-BN,
    same numbers as unsharded), and all-reduces the gradients, because loss
    and stat reductions are written as global-array means.  Gradient
    equivalence to the unsharded step is asserted in
    ``tests/test_spatial.py`` (same standard as ``tests/test_parallel.py``).

    Targets stay batch-sharded over ``dp`` only: the flat (B·cap, 6) rows
    divide by image, not by height.
    """
    img_sh = spatial_image_sharding(mesh)
    row_sh = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())

    def sharded(state, images_u8, targets, target_mask, rng, img_size):
        images_u8 = jax.device_put(images_u8, img_sh)
        targets = jax.device_put(targets, row_sh)
        target_mask = jax.device_put(target_mask, row_sh)
        state = jax.device_put(state, rep)
        return step_fn(state, images_u8, targets, target_mask, rng, img_size)

    return sharded


__all__ = ["make_spatial_mesh", "spatial_forward", "spatial_detect",
           "spatial_image_sharding", "shard_spatial_train_step"]
