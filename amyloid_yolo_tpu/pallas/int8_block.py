"""Pallas TPU kernel: strip-mined fused int8 Darknet residual block.

Reference semantics: one residual unit of Darknet-53
(``/root/reference/models.py:26-51`` conv+BN+LeakyReLU modules combined
with the shortcut add at ``models.py:246-248``), quantized exactly as the
shipped XLA int8 path (:func:`amyloid_yolo_tpu.models.darknet.
apply_folded_int8_full`): per-output-channel symmetric int8 weights,
per-layer static activation scales, requantization after every unit.

Why this kernel exists: the whole-image fused bf16 block
(``pallas/conv_block.py``) measured 16% SLOWER than XLA end-to-end — one
image per grid step serializes the batch and the 5.5 MB blocks defeat
double-buffering (BENCH.md "Fused Pallas residual blocks").  This is the
remaining unexplored shape called out there and in the round-2 verdict:
**strip-mined** (row-block) grid with small blocks that pipeline, and
**int8** operands end to end, so one unit costs one HBM read + one write
of int8 maps (the XLA path round-trips the hidden map and the shortcut
input through HBM).

Layout:

* grid = (B, H/strip); each step computes ``strip`` output rows of one
  image.
* The 3×3's one-row halo is fetched by passing the SAME input array three
  times with different BlockSpecs: the strip body, the row above, the row
  below (clamped at the image edge; the kernel masks the clamped copy to
  zero, matching conv zero-padding).  The halo rows' 1×1 hidden
  activations are recomputed per strip — 2 extra rows of a 1×1, ~2/strip
  overhead — which keeps every block read disjoint-free and Blocked-only.
* 1×1 and the nine 3×3 row-taps are int8×int8→int32 ``jnp.dot``s on the
  MXU; the f32 epilogue (dequant·leaky·requant) never leaves VMEM.

Exactness: integer accumulation makes this MORE exact than the shipped
XLA path (which accumulates in bf16 — darknet.py int8 conv epilogue);
``tests/test_pallas_int8_block.py`` checks bit-identity against an
integer-math reference in interpret mode.
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


def _requant(y, inv_s):
    return jnp.clip(jnp.round(y * inv_s), -127, 127).astype(jnp.int8)


def _block_kernel(x_ref, top_ref, bot_ref, w1_ref, a1_ref, b1_ref,
                  w2_ref, a2_ref, b2_ref, out_ref, *,
                  sx, inv_s1, inv_sout, nstrips):
    # x_ref:   (1, strip, W, C) int8   strip body
    # top_ref: (1, 1, W, C) int8       row above (edge-clamped; the edge
    #                                  case is masked at the HIDDEN map)
    # bot_ref: (1, 1, W, C) int8       row below
    # w1_ref:  (C, C2) int8            1x1 weights
    # a1_ref:  (1, C2) f32             sx*ws1 dequant scale
    # b1_ref:  (1, C2) f32
    # w2_ref:  (9, C2, C) int8         3x3 weights, one matrix per tap
    # a2_ref:  (1, C) f32              s1*ws2 dequant scale
    # b2_ref:  (1, C) f32
    # out_ref: (1, strip, W, C) int8
    i = pl.program_id(1)
    x = x_ref[0]
    strip, w_, c = x.shape
    c2 = w1_ref.shape[1]

    xfull = jnp.concatenate([top_ref[0], x, bot_ref[0]], axis=0)

    # 1x1 conv (int8 MXU, int32 accum) + leaky + requant, halo recomputed
    h = jnp.dot(xfull.reshape((strip + 2) * w_, c), w1_ref[:],
                preferred_element_type=jnp.int32)
    h = _leaky(h.astype(jnp.float32) * a1_ref[0] + b1_ref[0])
    hq = _requant(h, inv_s1).reshape(strip + 2, w_, c2)

    # The 3x3 zero-pads the HIDDEN map at the image edge: at the first /
    # last strip the (edge-clamped) halo row's hidden activation must be
    # zero — 1x1(0-input) is leaky(b1), NOT zero — so mask hq, not x.
    rows = jax.lax.broadcasted_iota(jnp.int32, (strip + 2, 1, 1), 0)
    valid = ((i > 0) | (rows > 0)) & ((i < nstrips - 1) | (rows < strip + 1))
    hq = jnp.where(valid, hq, jnp.int8(0))

    # 3x3 conv as 9 shifted (strip*W, C2) @ (C2, C) int8 matmuls
    hp = jnp.pad(hq, ((0, 0), (1, 1), (0, 0)))
    acc = None
    for di in range(3):
        for dj in range(3):
            tap = hp[di:di + strip, dj:dj + w_].reshape(strip * w_, c2)
            d = jnp.dot(tap, w2_ref[di * 3 + dj],
                        preferred_element_type=jnp.int32)
            acc = d if acc is None else acc + d

    y = _leaky(acc.astype(jnp.float32) * a2_ref[0] + b2_ref[0])
    y = y + x.reshape(strip * w_, c).astype(jnp.float32) * sx   # shortcut
    out_ref[0] = _requant(y, inv_sout).reshape(strip, w_, c)


def pack_int8_block(w1q, ws1, b1, w2q, ws2, b2):
    """Pack per-conv int8 weights/scales into the kernel layouts.

    w1q: (1, 1, C, C2) int8 HWIO → (C, C2); w2q: (3, 3, C2, C) int8 HWIO →
    (9, C2, C) row-major tap order; ws*/b* are the per-out-channel weight
    scales / folded biases from ``quantize_folded_int8_full``.
    """
    c, c2 = np.asarray(w1q).shape[2], np.asarray(w1q).shape[3]
    return (jnp.asarray(w1q).reshape(c, c2),
            jnp.asarray(ws1, jnp.float32).reshape(1, c2),
            jnp.asarray(b1, jnp.float32).reshape(1, c2),
            jnp.asarray(w2q).reshape(9, c2, c),
            jnp.asarray(ws2, jnp.float32).reshape(1, c),
            jnp.asarray(b2, jnp.float32).reshape(1, c))


@functools.partial(
    jax.jit,
    static_argnames=("sx", "s1", "s_out", "strip", "interpret"))
def fused_residual_block_int8(xq, w1p, a1p, b1p, w2p, a2p, b2p, *,
                              sx: float, s1: float, s_out: float,
                              strip: int = 26, interpret: bool = False):
    """One quantized residual unit, fused: int8 in → int8 out.

    Args:
      xq: (B, H, W, C) int8 activation (scale ``sx``).
      w1p..b2p: packed params; pass ``a1p`` PRE-multiplied by ``sx`` and
        ``a2p`` by ``s1`` (see :func:`pack_int8_block` + the call site) —
        i.e. ``a1p = ws1*sx``, ``a2p = ws2*s1``.
      sx/s1/s_out: static activation scales (input / hidden / output), the
        same ``act_scales`` floats the XLA path bakes in.
      strip: output rows per grid step; must divide H.
    """
    b, h_, w_, c = xq.shape
    if h_ % strip:
        raise ValueError(f"strip {strip} must divide H {h_}")
    nstrips = h_ // strip

    kern = functools.partial(
        _block_kernel, sx=sx, inv_s1=1.0 / s1, inv_sout=1.0 / s_out,
        nstrips=nstrips)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(xq.shape, jnp.int8),
        grid=(b, nstrips),
        in_specs=[
            pl.BlockSpec((1, strip, w_, c), lambda bi, i: (bi, i, 0, 0)),
            # one-row halos: block dim 1 row → the index map returns the
            # ROW index directly; edge rows are clamped and masked to zero
            # in the kernel (zero conv padding)
            pl.BlockSpec((1, 1, w_, c),
                         lambda bi, i: (bi, jnp.maximum(i * strip - 1, 0),
                                        0, 0)),
            pl.BlockSpec((1, 1, w_, c),
                         lambda bi, i: (bi,
                                        jnp.minimum((i + 1) * strip, h_ - 1),
                                        0, 0)),
            pl.BlockSpec(w1p.shape, lambda bi, i: (0, 0)),
            pl.BlockSpec(a1p.shape, lambda bi, i: (0, 0)),
            pl.BlockSpec(b1p.shape, lambda bi, i: (0, 0)),
            pl.BlockSpec(w2p.shape, lambda bi, i: (0, 0, 0)),
            pl.BlockSpec(a2p.shape, lambda bi, i: (0, 0)),
            pl.BlockSpec(b2p.shape, lambda bi, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, strip, w_, c),
                               lambda bi, i: (bi, i, 0, 0)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xq, xq, xq, w1p, a1p, b1p, w2p, a2p, b2p)


def reference_block_int8(xq, w1p, a1p, b1p, w2p, a2p, b2p, *,
                         sx, s1, s_out):
    """Plain-jnp mirror of the kernel's exact integer math (the oracle for
    interpret-mode bit-identity tests; also the XLA-lowered A/B arm when
    jitted — same int32 accumulation, unfused HBM round trips)."""
    b, h_, w_, c = xq.shape
    c2 = w1p.shape[1]
    h = jax.lax.conv_general_dilated(
        xq, w1p.reshape(1, 1, c, c2), (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    h = _leaky(h.astype(jnp.float32) * a1p[0] + b1p[0])
    hq = _requant(h, 1.0 / s1)
    w2 = w2p.reshape(3, 3, c2, c)
    acc = jax.lax.conv_general_dilated(
        hq, w2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = _leaky(acc.astype(jnp.float32) * a2p[0] + b2p[0])
    y = y + xq.astype(jnp.float32) * sx
    return _requant(y, 1.0 / s_out)


__all__ = ["fused_residual_block_int8", "pack_int8_block",
           "reference_block_int8", "LEAKY_SLOPE"]
