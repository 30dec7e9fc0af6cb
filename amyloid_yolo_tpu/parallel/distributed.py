"""Multi-process (multi-host) data parallelism.

The reference is strictly single-process/single-GPU (SURVEY §2.3:
``train.py:48`` picks one device; no DDP/NCCL/MPI anywhere), so this module
is pure new capability: the same DP train step that runs over an ICI mesh
inside one process (``parallel/steps.shard_train_step``) extended across
*processes* — multiple TPU hosts on a pod slice, where the gradient
all-reduce rides ICI within a host and DCN between hosts.  JAX's runtime
owns the choreography: we initialize the distributed service, build ONE
global ``Mesh`` over all processes' devices, and assemble global batches
from per-host local data with ``jax.make_array_from_process_local_data``.
The jitted step itself is unchanged — the loss is a global-batch mean, so
XLA derives the cross-host psum exactly as it does the single-host one.

On CPU (tests / this box) the same code path runs with N processes × M
virtual devices using XLA's gloo collectives
(``jax_cpu_collectives_implementation``), so multi-host semantics are
testable without a pod: ``tests/test_distributed.py`` asserts a 2-process ×
2-device global step matches the 4-device single-process step bit-for-bit.

Semantics note (same as single-process DP): BatchNorm batch statistics are
computed over the GLOBAL batch (sync-BN) because the program is written at
global-batch scope — multi-host training at global batch B is numerically
the reference's single-device recipe at batch B.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import batch_sharding, replicated


_INITIALIZED = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    *,
    cpu_devices_per_process: Optional[int] = None,
) -> None:
    """Join (or start) the JAX distributed runtime.  Idempotent: a second
    call in the same process (e.g. a launcher initialized before handing
    off to ``Trainer(distributed=True)``) is a no-op.

    On a real TPU pod slice every argument may be ``None`` — JAX discovers
    the coordinator/topology from the TPU environment.  For CPU-hosted
    multi-process runs (tests, or DCN-only experiments) pass all three
    explicitly and optionally ``cpu_devices_per_process`` to carve N
    virtual devices per process; CPU cross-process collectives go through
    gloo.  Must be called before any other JAX device access in the
    process.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    if cpu_devices_per_process is not None:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", cpu_devices_per_process)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True


def global_mesh(axis: str = "dp") -> Mesh:
    """One dp mesh over every device of every process (ICI + DCN)."""
    return Mesh(np.array(jax.devices()), (axis,))


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    """This process's share of a dp-sharded global batch."""
    n_local = len(mesh.local_devices)
    n_total = mesh.devices.size
    if global_batch % n_total:
        raise ValueError(
            f"global batch {global_batch} must divide over {n_total} devices")
    return global_batch // n_total * n_local


def shard_train_step_multiprocess(step_fn, mesh: Mesh):
    """Multi-host variant of ``steps.shard_train_step``.

    Each process passes its LOCAL slice of the batch/targets (rows this
    host loaded); they are assembled into one global dp-sharded array.
    State and the RNG key are replicated — every process must pass the
    same values (true by construction: identical init + identical updates).
    """
    bs = batch_sharding(mesh)
    rep = replicated(mesh)

    def sharded(state, images_u8, targets, target_mask, rng, img_size):
        images_u8 = jax.make_array_from_process_local_data(
            bs, np.asarray(images_u8))
        targets = jax.make_array_from_process_local_data(
            bs, np.asarray(targets))
        target_mask = jax.make_array_from_process_local_data(
            bs, np.asarray(target_mask))
        state = jax.device_put(state, rep)
        rng = jax.device_put(rng, rep)
        return step_fn(state, images_u8, targets, target_mask, rng, img_size)

    return sharded


def process_shard(items: list, process_id: Optional[int] = None,
                  num_processes: Optional[int] = None) -> list:
    """Per-host file sharding for the input pipeline (SURVEY §2.3c): host i
    owns every num_processes-th item.  Uneven tails are dropped so every
    host contributes the same local batch count (collective programs must
    run in lockstep)."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    if n <= 1:
        return list(items)
    usable = len(items) - (len(items) % n)
    return [items[i] for i in range(pid, usable, n)]


def fetch_replicated(x: Any) -> np.ndarray:
    """Read a fully-replicated output on this process (loss, metrics)."""
    return np.asarray(jax.device_get(
        [s.data for s in x.addressable_shards][0]))


__all__ = [
    "initialize", "global_mesh", "local_batch_size",
    "shard_train_step_multiprocess", "process_shard", "fetch_replicated",
]
