"""Pallas TPU kernel: fused Darknet residual block (conv1x1+leaky →
conv3x3+leaky → shortcut add).

Reference semantics: one residual unit of Darknet-53
(``/root/reference/models.py:26-51`` conv+BN+LeakyReLU modules combined with
the shortcut add at ``models.py:246-248``); BN is pre-folded into the conv
weights (:func:`amyloid_yolo_tpu.models.darknet.fold_batchnorm`), so the
block computes

    y = x + leaky(conv3x3(leaky(conv1x1(x) + b1)) + b2)

The XLA lowering of this block runs three kernels with two full-size
intermediates round-tripping through HBM; in the high-resolution backbone
stages (208²/104² maps at batch 16) that traffic — not the MXU — is the
bound (BENCH.md).  This kernel keeps the whole unit in VMEM:

* grid over the batch; each step holds one image's (H, W, C) map on-chip
  (208²·64·bf16 = 5.5 MB ≪ v5e VMEM);
* the 1x1 conv is a single (H*W, C) @ (C, C/2) matmul on the MXU;
* the 3x3 conv accumulates 3 row-tap matmuls of the column-im2col'd
  hidden map — (H*W, 3·C/2) @ (3·C/2, C) — striking a balance between
  MXU contraction depth and VMEM footprint;
* leaky activations and the residual add fuse into the epilogue.

HBM sees exactly one read of ``x`` and one write of ``y`` (plus the tiny
weights), ~3x less traffic than the unfused path.

Validated bit-comparable (f32) / within-bf16-ulp against the XLA path in
interpreter mode (``tests/test_pallas_conv_block.py``) and on device when a
TPU is attached.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEAKY_SLOPE = 0.1


def _leaky(v):
    return jnp.where(v >= 0, v, LEAKY_SLOPE * v)


def _block_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    # x_ref:  (1, H, W, C)    input map (bf16 or f32)
    # w1_ref: (C, C2)         folded 1x1 weights
    # b1_ref: (1, C2) f32     folded 1x1 bias
    # w2_ref: (9, C2, C)      folded 3x3 weights, one (C2, C) matrix per tap
    # b2_ref: (1, C) f32
    # out_ref: (1, H, W, C)
    x = x_ref[0]
    h_, w_, c = x.shape
    c2 = w1_ref.shape[1]

    # 1x1 conv + leaky (f32 accumulate, back to input dtype for the 3x3)
    h = jnp.dot(x.reshape(h_ * w_, c), w1_ref[:],
                preferred_element_type=jnp.float32)
    h = _leaky(h + b1_ref[0]).astype(x.dtype).reshape(h_, w_, c2)

    # 3x3 conv as 9 shifted (H*W, C2) @ (C2, C) matmuls on the MXU
    # (a lane-dim im2col concat is not supported by Mosaic; per-tap slices
    # of the zero-padded map lower cleanly)
    hp = jnp.pad(h, ((1, 1), (1, 1), (0, 0)))
    acc = None
    for di in range(3):
        for dj in range(3):
            tap = hp[di:di + h_, dj:dj + w_].reshape(h_ * w_, c2)
            d = jnp.dot(tap, w2_ref[di * 3 + dj],
                        preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d

    y = _leaky(acc + b2_ref[0]).reshape(h_, w_, c)
    out_ref[0] = (x.astype(jnp.float32) + y).astype(x.dtype)


def pack_block_weights(w1, b1, w2, b2):
    """Fold the block's conv params into the kernel's layouts.

    w1: (1, 1, C, C2) HWIO → (C, C2);  w2: (3, 3, C2, C) HWIO →
    (9, C2, C), one contraction matrix per spatial tap in row-major tap
    order (matches the kernel's shifted-slice order).
    """
    c, c2 = np.asarray(w1).shape[2], np.asarray(w1).shape[3]
    w1p = jnp.asarray(w1).reshape(c, c2)
    w2p = jnp.asarray(w2).reshape(9, c2, c)
    b1p = jnp.asarray(b1, jnp.float32).reshape(1, c2)
    b2p = jnp.asarray(b2, jnp.float32).reshape(1, c)
    return w1p, b1p, w2p, b2p


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_residual_block(x, w1p, b1p, w2p, b2p, *, interpret: bool = False):
    """y = x + leaky(conv3x3(leaky(conv1x1(x)+b1))+b2), one fused kernel.

    Args:
      x: (B, H, W, C) feature map (bf16/f32).
      w1p/b1p/w2p/b2p: packed params from :func:`pack_block_weights`
        (cast w1p/w2p to ``x.dtype`` for bf16 MXU operands).
    """
    b, h_, w_, c = x.shape
    return pl.pallas_call(
        _block_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h_, w_, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec(w1p.shape, lambda i: (0, 0)),
            pl.BlockSpec(b1p.shape, lambda i: (0, 0)),
            pl.BlockSpec(w2p.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec(b2p.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h_, w_, c), lambda i: (i, 0, 0, 0)),
        interpret=interpret,
        # one image's maps + f32 accumulator + double-buffered in/out blocks
        # exceed the default 16 MB scoped-vmem budget at 208²x64; v5e has
        # 128 MB of VMEM, so raise the cap instead of spatially tiling
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, w1p.astype(x.dtype), b1p, w2p.astype(x.dtype), b2p)


__all__ = ["fused_residual_block", "pack_block_weights", "LEAKY_SLOPE"]
