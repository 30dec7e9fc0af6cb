"""Batch-norm training statistics and normalize on the MXU.

Semantics reproduced: torch ``nn.BatchNorm2d`` exactly as the reference
uses it (``/root/reference/models.py:43``, every darknet cfg block with
``batch_normalize=1``): the biased batch variance normalizes the
activation; the caller (``models/darknet.py``) derives the unbiased
variance for the running-stat update.

Why this module exists (performance, not semantics): profiler attribution
of the round-3 train step (``bench_artifacts/traces/train_r3``) shows the
vector-unit ``convert_reduce_fusion`` kernels that compute per-channel
sums — ~72 forward stat kernels plus ~71 backward ``Σdy``/``Σdy·x``
kernels — cost **9.2 ms of the 23.9 ms step** at batch 8 @ 416², running
at ~1/8 of HBM bandwidth (866 µs to reduce an 88 MB map ≈ 101 GB/s on an
819 GB/s part; the ~40 µs floor per tiny deep-stage kernel is pure
launch/underutilization).  A ``(M×N)·(N×C)`` matmul computes the same
per-channel sum while streaming the activation through the MXU at memory
speed.  This module provides:

* :func:`channel_sums` — Σx and Σx² per channel as two MXU dots;
* :func:`bn_normalize` — the affine normalize with a custom VJP whose
  backward pass computes its two reductions (Σdy, Σdy·x) as dots instead
  of the reduce kernels autodiff would emit for the broadcast transposes.

Gradients are mathematically identical to autodiff of the inline
composite: the VJP treats ``mean``/``inv`` as independent inputs and
returns their exact cotangents, which flow back through the caller's
stats chain — whose own transpose (dot by a ones vector) is
broadcast-only, so no slow reduction reappears in the backward graph.

``_LHS_ROWS = 8``: XLA's algebraic simplifier strength-reduces a 1-row
matvec back into the very reduce kernel this module exists to avoid; an
8-row ones block (one full sublane tile) keeps the op a real matmul.
Rows are redundant — row 0 is taken — and the extra lhs read is ≤8/C of
the rhs traffic.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

_LHS_ROWS = 8
_DN = (((1,), (0,)), ((), ()))  # contract lhs dim 1 with rhs dim 0


def _ones_dot(x2d: jnp.ndarray) -> jnp.ndarray:
    """Per-channel sum of ``x2d (N, C)`` as an ``(M×N)·(N×C)`` MXU dot,
    accumulated in f32."""
    ones = jnp.ones((_LHS_ROWS, x2d.shape[0]), x2d.dtype)
    return lax.dot_general(ones, x2d, _DN,
                           preferred_element_type=jnp.float32)[0]


@jax.custom_vjp
def channel_sums(x2d: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``(Σ_n x[n, c], Σ_n x[n, c]²)`` in f32 for ``x2d (N, C)``.

    The square is taken in ``x2d.dtype`` (one extra rounding in bf16,
    relative error ≤2⁻⁹ per element, unbiased over the ~10⁶-element sums
    — measured ≪ the 2e-4 torch-parity rtol; exact in f32).

    Custom VJP: the dots' autodiff transpose would be ``(N×8)·(8×C)``
    matmuls, each materializing an activation-sized array the fusion
    passes can't absorb; the hand-written cotangent is the plain
    broadcast ``ct_s + 2·x·ct_sq`` (what autodiff of a vector-reduce sum
    gives), which XLA fuses into the surrounding elementwise backward
    work — so the backward graph pays nothing for the fast forward.
    """
    return _ones_dot(x2d), _ones_dot(x2d * x2d)


def _channel_sums_fwd(x2d):
    return channel_sums(x2d), x2d


def _channel_sums_bwd(x2d, cts):
    ct_s, ct_sq = cts  # (C,) f32 each
    ct = ct_s + 2.0 * x2d.astype(jnp.float32) * ct_sq
    return (ct.astype(x2d.dtype),)


channel_sums.defvjp(_channel_sums_fwd, _channel_sums_bwd)


@jax.custom_vjp
def bn_normalize(x: jnp.ndarray, mean: jnp.ndarray, inv: jnp.ndarray,
                 gamma: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """``((x − mean) · gamma · inv + beta)`` in f32, cast back to x.dtype.

    ``mean``/``inv``/``gamma``/``beta`` are per-channel f32 vectors;
    ``inv = rsqrt(var + eps)`` is precomputed by the caller so the VJP
    never re-derives the stats chain.
    """
    y = (x.astype(jnp.float32) - mean) * (gamma * inv) + beta
    return y.astype(x.dtype)


def _bn_normalize_fwd(x, mean, inv, gamma, beta):
    return bn_normalize(x, mean, inv, gamma, beta), (x, mean, inv, gamma)


def _bn_normalize_bwd(res, g):
    x, mean, inv, gamma = res
    c = x.shape[-1]
    x2d = x.reshape(-1, c)
    g2d = g.reshape(-1, c)
    s1 = _ones_dot(g2d)                 # Σ dy           (C,) f32
    sgx = _ones_dot(g2d * x2d)          # Σ dy·x         (C,) f32
    k = gamma * inv                     # f32 (C,)
    ct_x = (g.astype(jnp.float32) * k).astype(x.dtype)
    ct_mean = -k * s1
    ct_inv = gamma * (sgx - mean * s1)  # Σ dy·(x−mean)·gamma
    ct_gamma = inv * (sgx - mean * s1)
    ct_beta = s1
    return ct_x, ct_mean, ct_inv, ct_gamma, ct_beta


bn_normalize.defvjp(_bn_normalize_fwd, _bn_normalize_bwd)
