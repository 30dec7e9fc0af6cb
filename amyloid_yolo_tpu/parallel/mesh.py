"""Device mesh construction and sharding helpers.

The reference has no distributed execution at all (SURVEY §2.3); this module
is the new capability: data parallelism across ICI within a slice via
``jax.sharding.Mesh`` + ``NamedSharding``.  Gradients all-reduce over the
``dp`` axis because the loss is a global-batch mean under one jitted program
— XLA inserts the psum; there is no hand-written NCCL-style choreography to
port.  The same code runs on a virtual-N CPU mesh for tests
(``xla_force_host_platform_device_count``) and on a real v5e slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading dimension across the dp axis — used both for
    (B, ...) image batches and for flat (B*cap, 6) padded target rows, whose
    per-image blocks divide evenly across dp."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


__all__ = ["make_mesh", "batch_sharding", "replicated"]
