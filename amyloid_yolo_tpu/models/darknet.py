"""Functional Darknet/YOLOv3 executor for TPU.

Replaces the reference's per-step ``nn.ModuleList`` interpreter
(``/root/reference/models.py:225-255``) with a pure function over a static
:class:`~amyloid_yolo_tpu.graphspec.GraphSpec`:

* **Layout**: activations are NHWC and conv kernels HWIO — the layouts XLA's
  TPU convolution emitter tiles best onto the MXU (the reference is NCHW/OIHW
  because of cuDNN; we do not copy that).
* **Params are a pytree** ``{"conv_3": {"w": ...}, "bn_3": {...}}`` keyed by
  layer index, so weight import from darknet binaries / torch state_dicts is
  a pure relabeling (:mod:`amyloid_yolo_tpu.io.weights`).
* **Tracing**: the layer loop runs in Python *once* at trace time; XLA sees a
  flat graph and fuses BN + LeakyReLU into the convolutions.  For inference
  we additionally fold BN into the conv weights (:func:`fold_batchnorm`) so
  the compiled graph is conv+bias+leaky only.
* **BatchNorm** keeps torch semantics (eps 1e-5, momentum 0.9 per
  ``models.py:43``): biased batch variance normalizes, unbiased updates the
  running stats, ``running = (1-m)*running + m*batch``.

No torch is used anywhere in the compute path.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graphspec import (
    ConvSpec,
    GraphSpec,
    MaxPoolSpec,
    RouteSpec,
    ShortcutSpec,
    UpsampleSpec,
    YoloSpec,
)
from ..ops import bnstats

Params = Dict[str, Dict[str, jnp.ndarray]]

BN_EPS = 1e-5
BN_MOMENTUM = 0.9  # torch BatchNorm2d(momentum=0.9) — reference models.py:43
LEAKY_SLOPE = 0.1

# Training-mode BN statistics form (see apply() docstring).  "matmul"
# streams the per-channel sums through the MXU — the trace-attributed fix
# for the slow vector reduce kernels (ops/bnstats.py); "reduce" is the
# plain vector-reduction form (kept for A/B and as the CPU-backend
# fallback if ever needed).  Same math either way, tested equivalent;
# resolved at trace time, override per-call via apply(bn_form=...).
BN_FORM = os.environ.get("AMYOLO_BN_FORM", "reduce")


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def init_params(rng: jax.Array, spec: GraphSpec) -> Params:
    """Initialize parameters with the reference's init scheme.

    ``weights_init_normal`` (``utils/utils.py:27-33``): conv weights
    ~N(0, 0.02); BN scale ~N(1, 0.02), BN shift 0.  Running stats start at
    mean 0 / var 1.  Biases of BN-free convs start at 0 (the reference leaves
    torch's default uniform init on those two head biases; zero is the
    conventional JAX choice and is irrelevant after any training).
    """
    params: Params = {}
    for i in spec.conv_indices:
        layer: ConvSpec = spec.layers[i]  # type: ignore[assignment]
        rng, wkey, gkey = jax.random.split(rng, 3)
        w = 0.02 * jax.random.normal(
            wkey, (layer.kernel, layer.kernel, layer.in_ch, layer.out_ch), jnp.float32
        )
        entry: Dict[str, jnp.ndarray] = {"w": w}
        if layer.batch_normalize:
            params[f"bn_{i}"] = {
                "scale": 1.0 + 0.02 * jax.random.normal(gkey, (layer.out_ch,), jnp.float32),
                "bias": jnp.zeros((layer.out_ch,), jnp.float32),
                "mean": jnp.zeros((layer.out_ch,), jnp.float32),
                "var": jnp.ones((layer.out_ch,), jnp.float32),
            }
        else:
            entry["b"] = jnp.zeros((layer.out_ch,), jnp.float32)
        params[f"conv_{i}"] = entry
    return params


# ---------------------------------------------------------------------------
# Layer primitives
# ---------------------------------------------------------------------------

def _conv(x: jnp.ndarray, w: jnp.ndarray, stride: int, pad: int,
          widen_output: bool = True) -> jnp.ndarray:
    """NHWC/HWIO conv.  ``widen_output`` emits f32 for bf16 inputs
    (inference path: exact epilogues); differentiable paths must pass
    ``False`` — a widened output breaks the conv transpose rule with mixed
    operand dtypes (the MXU accumulates wide internally either way)."""
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=(jnp.float32 if widen_output
                                and x.dtype == jnp.bfloat16 else None),
    )


def _leaky(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x >= 0, x, LEAKY_SLOPE * x)


def _wide(x: jnp.ndarray) -> jnp.ndarray:
    """At-least-f32 cast: widens bf16 epilogues without DOWNcasting an f64
    trace (the x64 gradient-equivalence tests, tests/test_s2d_train.py)."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


def _maxpool(x: jnp.ndarray, kernel: int, stride: int) -> jnp.ndarray:
    # kernel-2/stride-1 pools get the reference's (0,1,0,1) ZERO pad
    # (models.py:50-51, nn.ZeroPad2d) — edge maxima clamp at 0 for
    # all-negative neighborhoods; symmetric (k-1)//2 padding otherwise.
    if kernel == 2 and stride == 1:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)), constant_values=0.0)
        pads = ((0, 0), (0, 0))
    else:
        p = (kernel - 1) // 2
        pads = ((p, p), (p, p))
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0),) + pads + ((0, 0),),
    )


def _upsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    # nearest-neighbor integer upsampling == per-pixel repeat
    x = jnp.repeat(x, factor, axis=1)
    return jnp.repeat(x, factor, axis=2)


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------

def apply(
    params: Params,
    spec: GraphSpec,
    x: jnp.ndarray,
    *,
    train: bool = False,
    compute_dtype: jnp.dtype = jnp.float32,
    bn_form: Optional[str] = None,
    s2d_stem: bool = False,
    input_layout: str = "nhwc",
) -> Tuple[List[jnp.ndarray], Optional[Params]]:
    """Run the backbone+heads; return raw NHWC maps at each yolo layer.

    ``input_layout="planar"`` accepts a (B, C, H, W) image — the planar
    training pipeline's native layout.  With the s2d stem it folds directly
    into the space-to-depth transpose (:func:`_space_to_depth_planar`);
    otherwise it is transposed to NHWC at entry.

    ``s2d_stem=True`` computes layers 0-1 (the reference's 3x3/s1 RGB conv
    into the 3x3/s2 downsample, ``models.py:237-243``) on the space-to-depth
    grid — the training-path counterpart of :func:`make_s2d_stem`.  The
    weight relabel runs INSIDE the trace (:func:`_s2d_relabel`), so autodiff
    returns gradients in the standard 3x3 parameterization and the optimizer
    geometry is unchanged; BN batch stats reduce over the phase axis too
    (same value population, different summation order).  Same function up to
    float summation order — the 3-deep input contraction otherwise runs the
    MXU at ~1% utilization in the forward AND both backward convs (trace
    ``bench_artifacts/traces/train_r3``: ~4.7 of 25.6 ms/step in the stem
    region at batch 8).

    Returns ``(head_maps, new_bn_stats)`` — ``new_bn_stats`` is ``None`` in
    eval mode, else a dict ``{"bn_i": {"mean": ..., "var": ...}}`` of updated
    running statistics (functional counterpart of torch's in-place BN state).

    ``bn_form`` selects how training-mode BN statistics (and the normalize
    backward reductions) are computed: ``"matmul"`` streams them through
    the MXU (:mod:`amyloid_yolo_tpu.ops.bnstats`), ``"reduce"`` uses plain
    vector reductions.  Same math, different summation order; ``None``
    defers to the module default ``BN_FORM``.

    Decoding the raw maps into boxes is a separate concern
    (:mod:`amyloid_yolo_tpu.models.heads`) so that training can fuse decode
    into the loss and inference can fuse it into NMS.
    """
    if x.dtype != compute_dtype:
        x = x.astype(compute_dtype)
    if bn_form is None:
        bn_form = BN_FORM

    # liveness: keep an activation only while a later route/shortcut needs it
    last_use: Dict[int, int] = {}
    for i, cons in enumerate(spec.consumers):
        if cons:
            last_use[i] = max(cons)

    new_stats: Params = {}
    saved: Dict[int, jnp.ndarray] = {}
    head_maps: List[jnp.ndarray] = []
    prev: Optional[jnp.ndarray] = x

    if input_layout == "planar" and not s2d_stem:
        prev = jnp.transpose(prev, (0, 2, 3, 1))

    start_index = 0
    if s2d_stem:
        _check_s2d_spec(spec)
        l0: ConvSpec = spec.layers[0]  # type: ignore[assignment]
        l1: ConvSpec = spec.layers[1]  # type: ignore[assignment]
        if not (l0.batch_normalize and l1.batch_normalize):
            raise ValueError("s2d training stem requires BN on layers 0-1")
        wa = _s2d_relabel(params["conv_0"]["w"].astype(compute_dtype),
                          _s2d_gather_indices_a(l0.in_ch, l0.out_ch))
        xs = (_space_to_depth_planar(prev) if input_layout == "planar"
              else _space_to_depth(prev))
        a = _conv(xs, wa, 1, 1, widen_output=False)
        a = _leaky(_s2d_bn(a, params["bn_0"], "bn_0", new_stats,
                           train, compute_dtype, groups=4))
        wb = _s2d_relabel(params["conv_1"]["w"].astype(compute_dtype),
                          _s2d_gather_indices_b(l1.in_ch, l1.out_ch))
        out = _conv_b(a, wb)
        out = _leaky(_s2d_bn(out, params["bn_1"], "bn_1", new_stats,
                             train, compute_dtype, groups=1))
        if 1 in last_use:
            saved[1] = out
        prev = out
        start_index = 2

    for i, layer in enumerate(spec.layers):
        if i < start_index:
            continue
        if isinstance(layer, ConvSpec):
            w = params[f"conv_{i}"]["w"].astype(compute_dtype)
            out = _conv(prev, w, layer.stride, layer.pad, widen_output=False)
            if layer.batch_normalize:
                bn = params[f"bn_{i}"]
                if train:
                    # one-pass batch stats: mean and E[x²] are INDEPENDENT
                    # reductions over the same tensor (the two-pass
                    # E[(x-μ)²] form re-reads the activation after the
                    # mean) and, under a dp-sharded batch, emit adjacent
                    # all-reduces XLA's combiner pass merges — one
                    # collective per BN layer instead of two serialized
                    # rendezvous (the r02 multichip-dryrun abort was
                    # rendezvous-bound).  max(·,0) guards f32 cancellation;
                    # activations are O(1) so the torch-parity delta stays
                    # ≪ the 2e-4 test rtol.
                    n = out.shape[0] * out.shape[1] * out.shape[2]
                    if bn_form == "matmul":
                        # MXU-form sums + custom-VJP normalize: the trace-
                        # attributed fix for the vector reduce kernels that
                        # cost 9.2 of 23.9 ms/step (ops/bnstats.py).
                        s, sq = bnstats.channel_sums(
                            out.reshape(-1, out.shape[-1]))
                        mean, msq = s / n, sq / n
                    else:
                        out32 = _wide(out)
                        mean = jnp.mean(out32, axis=(0, 1, 2))
                        msq = jnp.mean(out32 * out32, axis=(0, 1, 2))
                    var = jnp.maximum(msq - mean * mean, 0.0)
                    unbiased = var * (n / max(n - 1, 1))
                    new_stats[f"bn_{i}"] = {
                        "mean": (1 - BN_MOMENTUM) * bn["mean"] + BN_MOMENTUM * mean,
                        "var": (1 - BN_MOMENTUM) * bn["var"] + BN_MOMENTUM * unbiased,
                    }
                else:
                    mean, var = bn["mean"], bn["var"]
                inv = jax.lax.rsqrt(var.astype(jnp.float32) + BN_EPS)
                if train and bn_form == "matmul":
                    out = bnstats.bn_normalize(
                        out, mean, inv,
                        bn["scale"].astype(jnp.float32),
                        bn["bias"].astype(jnp.float32))
                else:
                    out = (_wide(out) - mean) \
                        * (bn["scale"] * inv) + bn["bias"]
                    out = out.astype(compute_dtype)
            else:
                out = out + params[f"conv_{i}"]["b"].astype(compute_dtype)
            if layer.activation == "leaky":
                out = _leaky(out)
        elif isinstance(layer, MaxPoolSpec):
            out = _maxpool(prev, layer.kernel, layer.stride)
        elif isinstance(layer, UpsampleSpec):
            out = _upsample(prev, layer.factor)
        elif isinstance(layer, RouteSpec):
            srcs = [saved[s] if s in saved else prev for s in layer.layers]
            out = jnp.concatenate(srcs, axis=-1)
        elif isinstance(layer, ShortcutSpec):
            out = prev + saved[layer.from_index]
        elif isinstance(layer, YoloSpec):
            head_maps.append(_wide(prev))
            out = prev
        else:  # pragma: no cover
            raise TypeError(f"unknown layer spec {layer!r}")

        if i in last_use:
            saved[i] = out
        # free activations whose last consumer has run
        for k in [k for k, lu in last_use.items() if lu == i and k in saved]:
            if k != i:
                del saved[k]
        prev = out

    return head_maps, (new_stats if train else None)


def fold_batchnorm(params: Params, spec: GraphSpec) -> Params:
    """Fold BN running stats into conv weights for inference.

    conv+BN(+leaky) becomes conv(+bias)(+leaky):
    ``w' = w * gamma/sqrt(var+eps)``, ``b' = beta - mean*gamma/sqrt(var+eps)``.
    Halves HBM traffic for the parameters and removes every BN op from the
    compiled inference graph.  Matches the eval-mode math bit-for-bit in f32.
    """
    folded: Params = {}
    for i in spec.conv_indices:
        layer: ConvSpec = spec.layers[i]  # type: ignore[assignment]
        entry = dict(params[f"conv_{i}"])
        if layer.batch_normalize:
            bn = params[f"bn_{i}"]
            inv = 1.0 / np.sqrt(np.asarray(bn["var"], np.float32) + BN_EPS)
            g = np.asarray(bn["scale"], np.float32) * inv
            folded[f"conv_{i}"] = {
                "w": jnp.asarray(np.asarray(entry["w"], np.float32) * g[None, None, None, :]),
                "b": jnp.asarray(np.asarray(bn["bias"], np.float32)
                                 - np.asarray(bn["mean"], np.float32) * g),
            }
        else:
            folded[f"conv_{i}"] = {"w": entry["w"], "b": entry["b"]}
    return folded


def fusible_residual_blocks(spec: GraphSpec) -> Dict[int, Tuple[int, int, int]]:
    """Map start-index → (conv1x1, conv3x3, shortcut) for Darknet residual
    units the fused Pallas kernel can replace.

    A unit is fusible when it is the exact reference pattern
    (``models.py:26-51`` + shortcut at ``:246-248``): 1x1/s1 conv+BN+leaky,
    3x3/s1 conv+BN+leaky, shortcut from the block input — and neither
    intermediate is read by any later route/shortcut.
    """
    blocks: Dict[int, Tuple[int, int, int]] = {}
    for i, layer in enumerate(spec.layers):
        if i + 2 >= len(spec.layers):
            break
        c1, c2, sc = layer, spec.layers[i + 1], spec.layers[i + 2]
        if not (isinstance(c1, ConvSpec) and c1.kernel == 1 and c1.stride == 1
                and c1.batch_normalize and c1.activation == "leaky"):
            continue
        if not (isinstance(c2, ConvSpec) and c2.kernel == 3 and c2.stride == 1
                and c2.batch_normalize and c2.activation == "leaky"
                and c2.in_ch == c1.out_ch and c2.out_ch == c1.in_ch):
            continue
        if not (isinstance(sc, ShortcutSpec) and sc.from_index == i - 1):
            continue
        # intermediates must not escape the block (conv2's output is read by
        # the block's own shortcut, which the consumer sets record)
        if spec.consumers[i] - {i + 1} or spec.consumers[i + 1] - {i + 2}:
            continue
        blocks[i] = (i, i + 1, i + 2)
    return blocks


def pack_pallas_blocks(folded: Params, spec: GraphSpec,
                       upto: Optional[int] = None,
                       min_ch: int = 0) -> Dict[int, tuple]:
    """Pack folded weights of every fusible residual unit (< ``upto``,
    block channels >= ``min_ch``) into the fused kernel's layouts
    (:mod:`amyloid_yolo_tpu.pallas.conv_block`).

    ``min_ch`` skips the highest-resolution stages whose whole-image maps
    exceed the kernel's VMEM budget (208² x 64ch at batch-16 needs a strip
    variant; 104²+/128ch+ fit on v5e).
    """
    from ..pallas.conv_block import pack_block_weights

    packs: Dict[int, tuple] = {}
    for i in fusible_residual_blocks(spec):
        if upto is not None and i >= upto:
            continue
        if spec.layers[i].in_ch < min_ch:  # type: ignore[union-attr]
            continue
        packs[i] = pack_block_weights(
            folded[f"conv_{i}"]["w"], folded[f"conv_{i}"]["b"],
            folded[f"conv_{i + 1}"]["w"], folded[f"conv_{i + 1}"]["b"])
    return packs


def apply_folded(
    folded: Params,
    spec: GraphSpec,
    x: jnp.ndarray,
    *,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    pallas_packs: Optional[Dict[int, tuple]] = None,
    pallas_interpret: bool = False,
    s2d_stem: Optional[Params] = None,
) -> List[jnp.ndarray]:
    """Inference-only forward over BN-folded params (bf16 by default).

    Conv outputs accumulate to f32 (``_conv`` preferred_element_type);
    emitting bf16 conv outputs was measured on v5e and saved nothing
    (12.64 vs 12.65 ms — XLA already fuses the convert), so the exact
    variant stays.

    ``pallas_packs`` (from :func:`pack_pallas_blocks`) replaces each packed
    residual unit with the single fused Pallas kernel — one HBM read/write
    per unit instead of three.

    ``s2d_stem`` (from :func:`make_s2d_stem`) replaces layers 0-1 with the
    space-to-depth restructure (same function, MXU-shaped — see the section
    comment above :func:`make_s2d_stem`).
    """
    if x.dtype != compute_dtype:
        x = x.astype(compute_dtype)

    last_use: Dict[int, int] = {}
    for i, cons in enumerate(spec.consumers):
        if cons:
            last_use[i] = max(cons)

    saved: Dict[int, jnp.ndarray] = {}
    head_maps: List[jnp.ndarray] = []
    prev = x
    skip_until = -1
    if s2d_stem is not None:
        prev = s2d_stem_forward(s2d_stem, x, compute_dtype)
        if 1 in last_use:
            saved[1] = prev
        skip_until = 2
    for i, layer in enumerate(spec.layers):
        if i < skip_until:
            continue
        if pallas_packs is not None and i in pallas_packs:
            from ..pallas.conv_block import fused_residual_block

            out = fused_residual_block(prev, *pallas_packs[i],
                                       interpret=pallas_interpret)
            i_sc = i + 2  # liveness bookkeeping happens at the shortcut index
            if i_sc in last_use:
                saved[i_sc] = out
            for k in [k for k, lu in last_use.items()
                      if i <= lu <= i_sc and k in saved and k != i_sc]:
                del saved[k]
            prev = out
            skip_until = i + 3
            continue
        if isinstance(layer, ConvSpec):
            w = folded[f"conv_{i}"]["w"].astype(compute_dtype)
            out = _conv(prev, w, layer.stride, layer.pad)
            out = out.astype(compute_dtype) + folded[f"conv_{i}"]["b"].astype(compute_dtype)
            if layer.activation == "leaky":
                out = _leaky(out)
        elif isinstance(layer, MaxPoolSpec):
            out = _maxpool(prev, layer.kernel, layer.stride)
        elif isinstance(layer, UpsampleSpec):
            out = _upsample(prev, layer.factor)
        elif isinstance(layer, RouteSpec):
            out = jnp.concatenate(
                [saved[s] if s in saved else prev for s in layer.layers], axis=-1
            )
        elif isinstance(layer, ShortcutSpec):
            out = prev + saved[layer.from_index]
        elif isinstance(layer, YoloSpec):
            head_maps.append(prev.astype(jnp.float32))
            out = prev
        else:  # pragma: no cover
            raise TypeError(f"unknown layer spec {layer!r}")
        if i in last_use:
            saved[i] = out
        for k in [k for k, lu in last_use.items() if lu == i and k in saved]:
            if k != i:
                del saved[k]
        prev = out
    return head_maps


# ---------------------------------------------------------------------------
# Space-to-depth stem (perf restructure of layers 0-1)
#
# The reference's first conv (``models.py:237-243`` first block of
# ``yolov3-custom.cfg``) is 3x3/s1 over a 416²x3 input: with only a
# 3·3·3 = 27-deep contraction the MXU runs it at ~1% utilization (measured
# 1.27 ms for 1.6 GFLOP on v5e).  The space-to-depth restructure computes
# the SAME function as layers 0+1 with MXU-shaped matmuls:
#
#   x (416²,3) --s2d--> (208²,12)
#     conv_a 3x3/s1x(12→128)   ≡ conv0 with outputs phase-encoded in
#                                 channels: a[H,W,(ph·2+pw)·C0+o]
#                                 = conv0(x)[2H+ph, 2W+pw, o]
#     leaky (commutes with the relabeling)
#     conv_b 2x2/s1, pad (1,0)x(128→64) ≡ conv1 (3x3/s2): its taps read
#                                 conv0 rows 2H'-1..2H'+1, i.e. s2d rows
#                                 H'-1..H' across phases
#     (+b1, leaky) → exactly layer 1's output at 208², never
#     materializing the 416²x32 map (the largest activation in the graph).
#
# Pure weight relabeling with zero padding — no approximation; the only
# numeric delta vs the direct path is float summation order (int8 conv_b
# reuses conv_1's already-quantized integer weights, so the integer
# products are identical).
# ---------------------------------------------------------------------------

def _check_s2d_spec(spec: GraphSpec) -> None:
    l0, l1 = spec.layers[0], spec.layers[1]
    ok = (isinstance(l0, ConvSpec) and l0.kernel == 3 and l0.stride == 1
          and l0.activation == "leaky"
          and isinstance(l1, ConvSpec) and l1.kernel == 3 and l1.stride == 2
          and l1.activation == "leaky"
          # no route/shortcut may read layer 0 (sequential flow into layer 1
          # is implicit; spec.consumers records only route/shortcut readers)
          and not spec.consumers[0])
    if not ok:
        raise ValueError(
            "s2d stem needs the YOLOv3 stem shape: conv 3x3/s1 leaky into "
            "conv 3x3/s2 leaky with layer 0 consumed only by layer 1")


def _space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, 2H, 2W, C) → (B, H, W, 4C); channel = (ph·2+pw)·C + c."""
    B, H2, W2, C = x.shape
    x = x.reshape(B, H2 // 2, 2, W2 // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H2 // 2, W2 // 2, 4 * C)


def _space_to_depth_planar(x: jnp.ndarray) -> jnp.ndarray:
    """(B, C, 2H, 2W) planar → (B, H, W, 4C) with the SAME channel layout
    as :func:`_space_to_depth` ((ph·2+pw)·C + c) — the planar training
    pipeline feeds the s2d stem with ONE transpose, never materializing
    the NHWC image."""
    B, C, H2, W2 = x.shape
    x = x.reshape(B, C, H2 // 2, 2, W2 // 2, 2)
    x = x.transpose(0, 2, 4, 3, 5, 1)          # B, H, W, ph, pw, C
    return x.reshape(B, H2 // 2, W2 // 2, 4 * C)


def _s2d_transform_conv_a(w0: np.ndarray, b0: np.ndarray):
    """3x3/s1 (Cin→C0) → 3x3/s1 on the s2d grid (4·Cin → 4·C0)."""
    kh, kw, cin, c0 = w0.shape
    assert (kh, kw) == (3, 3)
    wa = np.zeros((3, 3, 4 * cin, 4 * c0), np.float32)
    for ph in range(2):
        for pw in range(2):
            for dh in range(3):
                for dw in range(3):
                    qh, rh = divmod(ph + dh - 1, 2)
                    qw, rw = divmod(pw + dw - 1, 2)
                    wa[qh + 1, qw + 1,
                       (rh * 2 + rw) * cin:(rh * 2 + rw) * cin + cin,
                       (ph * 2 + pw) * c0:(ph * 2 + pw) * c0 + c0] = \
                        np.asarray(w0[dh, dw], np.float32)
    ba = np.tile(np.asarray(b0, np.float32), 4)
    return wa, ba


def _s2d_transform_conv_b(w1: np.ndarray):
    """3x3/s2 (C0→C1) → 2x2/s1 pad-(1,0) over phase-encoded channels.

    Zero-fill relabeling — works for float OR already-quantized int8
    weights (the zeros contribute exactly zero either way)."""
    kh, kw, c0, c1 = w1.shape
    assert (kh, kw) == (3, 3)
    wb = np.zeros((2, 2, 4 * c0, c1), w1.dtype)
    for k_h in range(2):
        for k_w in range(2):
            for rh in range(2):
                for rw in range(2):
                    dh = 2 * k_h + rh - 1
                    dw = 2 * k_w + rw - 1
                    if 0 <= dh < 3 and 0 <= dw < 3:
                        wb[k_h, k_w,
                           (rh * 2 + rw) * c0:(rh * 2 + rw) * c0 + c0] = \
                            np.asarray(w1[dh, dw])
    return wb


def make_s2d_stem(folded: Params, spec: GraphSpec) -> Params:
    """Pack the bf16-path s2d stem params from folded conv_0 / conv_1."""
    _check_s2d_spec(spec)
    wa, ba = _s2d_transform_conv_a(np.asarray(folded["conv_0"]["w"]),
                                   np.asarray(folded["conv_0"]["b"]))
    wb = _s2d_transform_conv_b(np.asarray(folded["conv_1"]["w"], np.float32))
    return {"wa": jnp.asarray(wa), "ba": jnp.asarray(ba),
            "wb": jnp.asarray(wb),
            "bb": jnp.asarray(np.asarray(folded["conv_1"]["b"], np.float32))}


def make_s2d_stem_int8(folded: Params, qparams: Params,
                       spec: GraphSpec) -> Params:
    """s2d stem for the int8_full path: conv_a stays bf16 (the stem
    exclusion), conv_b reuses conv_1's per-channel int8 weights verbatim
    (relabeled + zero-filled, so the integer dot products are identical)."""
    _check_s2d_spec(spec)
    if "conv_1" not in qparams:
        raise ValueError("conv_1 is not quantized in these qparams")
    wa, ba = _s2d_transform_conv_a(np.asarray(folded["conv_0"]["w"]),
                                   np.asarray(folded["conv_0"]["b"]))
    wbq = _s2d_transform_conv_b(np.asarray(qparams["conv_1"]["wq"]))
    return {"wa": jnp.asarray(wa), "ba": jnp.asarray(ba),
            "wbq": jnp.asarray(wbq),
            "wbs": qparams["conv_1"]["ws"], "bb": qparams["conv_1"]["b"]}


def make_s2d_down_int8(qparams: Params, spec: GraphSpec,
                       max_in_ch: int = 64) -> Dict[int, jnp.ndarray]:
    """Relabeled weights for narrow-input stride-2 downsample convs.

    The post-s2d trace (`bench_artifacts/traces/int8full_s2d_b16`) shows
    the 3×3/s2 64→128 conv at 208² as the single largest op (0.84 ms of
    the 7.7 ms batch, ~30 TOPS): 64 input channels and the strided access
    tile the MXU poorly, exactly like the stem did.  The same cure
    applies: space-to-depth the input to 104²×256 and run conv_1's
    relabeling (:func:`_s2d_transform_conv_b`) — a 2×2 pad-(1,0) conv
    whose zero-filled int8 weights produce IDENTICAL integer dot
    products.  Returns {layer_index: relabeled wq}; scales/biases are the
    original per-channel entries in ``qparams``.  Deeper downsample convs
    (in_ch ≥ 128) already tile well and are left alone.
    """
    out: Dict[int, jnp.ndarray] = {}
    for i, layer in enumerate(spec.layers):
        if (isinstance(layer, ConvSpec) and layer.kernel == 3
                and layer.stride == 2 and layer.pad == 1 and i != 1
                and layer.in_ch <= max_in_ch and f"conv_{i}" in qparams):
            out[i] = jnp.asarray(
                _s2d_transform_conv_b(np.asarray(qparams[f"conv_{i}"]["wq"])))
    return out


# -- differentiable relabel (training path) --------------------------------
#
# The fold-time transforms above produce STATIC relabeled weights; training
# needs the relabel INSIDE the traced step so autodiff maps gradients back
# onto the standard 3x3 kernels (the optimizer keeps operating on the
# reference parameterization — Adam is not invariant under reparameterization,
# so training *in* s2d space would diverge from reference semantics).  Each
# relabeled position holds either zero or exactly one element of the source
# kernel, so the relabel is a gather from ``w.flat`` (+ one appended zero);
# its VJP is a scatter-add — both weight-sized, negligible next to the convs.

@functools.lru_cache(maxsize=None)
def _s2d_gather_indices_a(cin: int, c0: int) -> np.ndarray:
    """Flat-index map (3,3,4cin,4c0) into conv0's ``w.flat`` (sentinel
    ``9*cin*c0`` = the appended zero); mirrors `_s2d_transform_conv_a`."""
    idx = np.full((3, 3, 4 * cin, 4 * c0), 9 * cin * c0, np.int32)
    co = np.arange(c0, dtype=np.int32)
    for ph in range(2):
        for pw in range(2):
            for dh in range(3):
                for dw in range(3):
                    qh, rh = divmod(ph + dh - 1, 2)
                    qw, rw = divmod(pw + dw - 1, 2)
                    for ci in range(cin):
                        idx[qh + 1, qw + 1, (rh * 2 + rw) * cin + ci,
                            (ph * 2 + pw) * c0:(ph * 2 + pw) * c0 + c0] = \
                            ((dh * 3 + dw) * cin + ci) * c0 + co
    return idx


@functools.lru_cache(maxsize=None)
def _s2d_gather_indices_b(c0: int, c1: int) -> np.ndarray:
    """Flat-index map (2,2,4c0,c1) into conv1's ``w.flat``; mirrors
    `_s2d_transform_conv_b`."""
    idx = np.full((2, 2, 4 * c0, c1), 9 * c0 * c1, np.int32)
    co = np.arange(c1, dtype=np.int32)
    for k_h in range(2):
        for k_w in range(2):
            for rh in range(2):
                for rw in range(2):
                    dh = 2 * k_h + rh - 1
                    dw = 2 * k_w + rw - 1
                    if 0 <= dh < 3 and 0 <= dw < 3:
                        for c in range(c0):
                            idx[k_h, k_w, (rh * 2 + rw) * c0 + c] = \
                                ((dh * 3 + dw) * c0 + c) * c1 + co
    return idx


def _s2d_relabel(w: jnp.ndarray, idx: np.ndarray) -> jnp.ndarray:
    """Differentiable zero-filled relabel: gather from ``w.flat`` plus one
    appended zero (the sentinel target).  Bit-identical to the numpy
    fold-time transforms (tests/test_s2d_train.py)."""
    flat = jnp.concatenate([w.reshape(-1), jnp.zeros((1,), w.dtype)])
    return flat[idx]


def _s2d_bn(out: jnp.ndarray, bn: Params, key: str, new_stats: Params,
            train: bool, compute_dtype, groups: int) -> jnp.ndarray:
    """BN for a phase-encoded map: channel axis is ``groups`` s2d phase
    copies of the real C channels.  Batch stats reduce over the phase axis
    too — the SAME value population as the standard 2x-resolution layout,
    summed in a different order; scale/bias/stat vectors are phase-tiled.
    One-pass E[x²]−E[x]² form (see apply() for the dp-collective rationale).
    """
    B, H, W, CC = out.shape
    C = CC // groups
    out32 = _wide(out)
    if train:
        n = B * H * W * groups
        v = out32.reshape(B, H, W, groups, C) if groups > 1 else out32
        axes = (0, 1, 2, 3) if groups > 1 else (0, 1, 2)
        mean = jnp.mean(v, axis=axes)
        msq = jnp.mean(v * v, axis=axes)
        var = jnp.maximum(msq - mean * mean, 0.0)
        unbiased = var * (n / max(n - 1, 1))
        new_stats[key] = {
            "mean": (1 - BN_MOMENTUM) * bn["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * bn["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = bn["mean"], bn["var"]
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + BN_EPS)
    g = bn["scale"] * inv
    b = bn["bias"]
    if groups > 1:
        mean, g, b = jnp.tile(mean, groups), jnp.tile(g, groups), jnp.tile(b, groups)
    # same affine form as the standard path (apply() BN epilogue)
    return ((out32 - mean) * g + b).astype(compute_dtype)


def _conv_b(x: jnp.ndarray, w: jnp.ndarray, preferred=None) -> jnp.ndarray:
    """2x2/s1 conv with (1,0) top/left zero pad (the s2d image of conv1's
    symmetric pad-1: output H' reads s2d rows H'-1, H')."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred)


def s2d_stem_forward(stem: Params, x: jnp.ndarray,
                     compute_dtype: jnp.dtype) -> jnp.ndarray:
    """bf16-path fused stem: x (B,S,S,Cin) → layer-1 output (B,S/2,S/2,C1)."""
    xs = _space_to_depth(x.astype(compute_dtype))
    a = _conv(xs, stem["wa"].astype(compute_dtype), 1, 1)
    a = a.astype(compute_dtype) + stem["ba"].astype(compute_dtype)
    a = _leaky(a)
    b = _conv_b(a, stem["wb"].astype(compute_dtype),
                preferred=(jnp.float32 if a.dtype == jnp.bfloat16 else None))
    b = b.astype(compute_dtype) + stem["bb"].astype(compute_dtype)
    return _leaky(b)


# ---------------------------------------------------------------------------
# int8 early backbone (non-parity fast path)
#
# BENCH r1: layers 0-26 (416²-104² maps, 32-256 ch) are HBM-bandwidth bound —
# 8.5 of 12.1 ms of the bf16 forward.  Storing those activations as int8 with
# static per-layer scales halves the traffic, and int8×int8→int32 convs run
# the MXU at 2× bf16 throughput on v5e.  Opt-in via Detector(precision=
# "int8_early"); default stays bf16 for box-for-box parity.
# ---------------------------------------------------------------------------

def int8_region(spec: GraphSpec, max_downsample: int = 4) -> int:
    """Last-exclusive layer index of the high-resolution region: every layer
    whose INPUT feature map is at downsample factor <= ``max_downsample``
    (416² input: 416..104 px maps — the HBM-bound region)."""
    factor = 1
    for i, layer in enumerate(spec.layers):
        if factor > max_downsample:
            return i
        if isinstance(layer, (RouteSpec, YoloSpec)):
            return i  # int8 region stays within the plain backbone prefix
        if isinstance(layer, ConvSpec) and layer.stride > 1:
            factor *= layer.stride
        elif isinstance(layer, MaxPoolSpec) and layer.stride > 1:
            factor *= layer.stride
        elif isinstance(layer, UpsampleSpec):
            factor = max(1, factor // layer.factor)
    return len(spec.layers)


def quantize_folded_int8(folded: Params, spec: GraphSpec, upto: int) -> Params:
    """Per-output-channel symmetric int8 quantization of folded conv weights
    for layers < ``upto``; biases stay f32."""
    q: Params = {}
    for i in spec.conv_indices:
        if i >= upto:
            continue
        w = np.asarray(folded[f"conv_{i}"]["w"], np.float32)
        s = np.abs(w).max(axis=(0, 1, 2)) / 127.0
        s = np.maximum(s, 1e-12)
        wq = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        q[f"conv_{i}"] = {
            "wq": jnp.asarray(wq),
            "ws": jnp.asarray(s.astype(np.float32)),
            "b": jnp.asarray(np.asarray(folded[f"conv_{i}"]["b"], np.float32)),
        }
    return q


def _act_stat(t: jnp.ndarray, percentile: float) -> jnp.ndarray:
    """Per-layer activation range statistic for int8 calibration.

    ``percentile=100`` is the classic amax; below 100 the scale comes from
    that percentile of |activations| instead, so a handful of outliers no
    longer widen the whole layer's quantization grid (outliers saturate at
    ±127 — both quantizers clip).  One-time f32 probe cost only."""
    a = jnp.abs(t)
    if percentile >= 100.0:
        return jnp.max(a)
    return jnp.quantile(a.astype(jnp.float32).ravel(), percentile / 100.0)


def calibrate_act_scales(folded: Params, spec: GraphSpec, x: jnp.ndarray,
                         upto: int, percentile: float = 100.0) -> Dict[str, float]:
    """Static activation scales (amax/127 per layer output, f32 forward) for
    the int8 region, from a representative sample batch."""
    @jax.jit
    def probe(params, xin):
        amax: Dict[str, jnp.ndarray] = {"in": _act_stat(xin, percentile)}
        saved: Dict[int, jnp.ndarray] = {}
        prev = xin
        for i, layer in enumerate(spec.layers[:upto]):
            if isinstance(layer, ConvSpec):
                out = _conv(prev, params[f"conv_{i}"]["w"], layer.stride, layer.pad)
                out = out + params[f"conv_{i}"]["b"]
                if layer.activation == "leaky":
                    out = _leaky(out)
            elif isinstance(layer, ShortcutSpec):
                out = prev + saved[layer.from_index]
            elif isinstance(layer, MaxPoolSpec):
                out = _maxpool(prev, layer.kernel, layer.stride)
            elif isinstance(layer, UpsampleSpec):
                out = _upsample(prev, layer.factor)
            else:  # routes/yolo do not appear in the early backbone
                raise TypeError(f"int8 region cannot contain {layer!r}")
            amax[str(i)] = _act_stat(out, percentile)
            saved[i] = out
            prev = out
        return amax

    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    amax = jax.device_get(probe(folded, x))
    return {k: float(v) / 127.0 + 1e-12 for k, v in amax.items()}


def apply_folded_int8(
    folded: Params,
    qparams: Params,
    act_scales: Dict[str, float],
    spec: GraphSpec,
    x: jnp.ndarray,
    *,
    upto: int,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    int8_compute: bool = True,
) -> List[jnp.ndarray]:
    """Inference forward with int8 activations (and optionally int8 convs)
    through layers < ``upto``, then the standard folded path.

    Activations between early layers are stored int8 with the static
    ``act_scales``; dequantize/requantize are elementwise and fuse into the
    convolutions, so HBM sees half the bytes.  ``int8_compute=True``
    additionally runs the early convs as int8×int8→int32 on the MXU.
    """
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)

    last_use: Dict[int, int] = {}
    for i, cons in enumerate(spec.consumers):
        if cons:
            last_use[i] = max(cons)

    def quant(y, s):
        return jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)

    xs = act_scales["in"]
    xq = quant(x, xs)
    saved_q: Dict[int, Tuple[jnp.ndarray, float]] = {}
    prev_q, prev_s = xq, xs

    for i, layer in enumerate(spec.layers[:upto]):
        if isinstance(layer, ConvSpec):
            qp = qparams[f"conv_{i}"]
            if int8_compute:
                # bf16 conv output (vs exact int32): measured 27% faster on
                # the hottest early conv (the epilogue reads half the bytes)
                # with no detection-level accuracy change on the real-data
                # gate — the bf16 rounding of the accumulator is the same
                # order as the int8 quantization error itself
                y = jax.lax.conv_general_dilated(
                    prev_q, qp["wq"],
                    window_strides=(layer.stride, layer.stride),
                    padding=((layer.pad, layer.pad), (layer.pad, layer.pad)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.bfloat16,
                ).astype(jnp.float32) * (prev_s * qp["ws"]) + qp["b"]
            else:  # int8 storage only: dequant fuses into the bf16 conv
                xf = (prev_q.astype(compute_dtype)
                      * jnp.asarray(prev_s, compute_dtype))
                w = folded[f"conv_{i}"]["w"].astype(compute_dtype)
                y = _conv(xf, w, layer.stride, layer.pad).astype(jnp.float32) \
                    + folded[f"conv_{i}"]["b"]
            if layer.activation == "leaky":
                y = _leaky(y)
        elif isinstance(layer, ShortcutSpec):
            aq, as_ = saved_q[layer.from_index]
            y = (prev_q.astype(jnp.float32) * prev_s
                 + aq.astype(jnp.float32) * as_)
        elif isinstance(layer, MaxPoolSpec):
            y = _maxpool(prev_q.astype(jnp.float32) * prev_s,
                         layer.kernel, layer.stride)
        elif isinstance(layer, UpsampleSpec):
            y = None
            out_q = _upsample(prev_q, layer.factor)
            out_s = prev_s
        else:  # pragma: no cover
            raise TypeError(f"int8 region cannot contain {layer!r}")
        if y is not None:
            out_s = act_scales[str(i)]
            out_q = quant(y, out_s)
        if i in last_use:
            saved_q[i] = (out_q, out_s)
        for k in [k for k, lu in last_use.items() if lu == i and k in saved_q]:
            if k != i:
                del saved_q[k]
        prev_q, prev_s = out_q, out_s

    # boundary: dequantize and hand off to the standard folded path
    x = prev_q.astype(compute_dtype) * jnp.asarray(prev_s, compute_dtype)
    saved: Dict[int, jnp.ndarray] = {
        k: (q.astype(compute_dtype) * jnp.asarray(s, compute_dtype))
        for k, (q, s) in saved_q.items()
    }
    head_maps: List[jnp.ndarray] = []
    prev = x
    for j, layer in enumerate(spec.layers[upto:]):
        i = upto + j
        if isinstance(layer, ConvSpec):
            w = folded[f"conv_{i}"]["w"].astype(compute_dtype)
            out = _conv(prev, w, layer.stride, layer.pad)
            out = out.astype(compute_dtype) + folded[f"conv_{i}"]["b"].astype(compute_dtype)
            if layer.activation == "leaky":
                out = _leaky(out)
        elif isinstance(layer, MaxPoolSpec):
            out = _maxpool(prev, layer.kernel, layer.stride)
        elif isinstance(layer, UpsampleSpec):
            out = _upsample(prev, layer.factor)
        elif isinstance(layer, RouteSpec):
            out = jnp.concatenate(
                [saved[s] if s in saved else prev for s in layer.layers], axis=-1
            )
        elif isinstance(layer, ShortcutSpec):
            out = prev + saved[layer.from_index]
        elif isinstance(layer, YoloSpec):
            head_maps.append(prev.astype(jnp.float32))
            out = prev
        else:  # pragma: no cover
            raise TypeError(f"unknown layer spec {layer!r}")
        if i in last_use:
            saved[i] = out
        for k in [k for k, lu in last_use.items() if lu == i and k in saved]:
            if k != i:
                del saved[k]
        prev = out
    return head_maps


# ---------------------------------------------------------------------------
# int8 full graph (non-parity fast path, one step past int8_early)
#
# Quantizes every conv+BN+leaky unit in the WHOLE graph — backbone AND the
# FPN tail — keeping only the three linear 1x1 head convs in bf16 (their
# outputs feed the box decode directly, so quantization error there moves
# boxes first).  Routes concatenate in int8 by rescaling each branch to the
# route output's calibrated scale; upsample passes int8 through; shortcuts
# dequant-add-requant.  Same reference semantics being accelerated as
# apply_folded (``/root/reference/models.py:237-255``).
# ---------------------------------------------------------------------------

def int8_full_conv_indices(spec: GraphSpec) -> set:
    """Conv indices to quantize for the full-graph path: every conv except
    (a) the linear head convs (activation != leaky — their outputs feed the
    box decode directly) and (b) tiny-input-channel stems (in_ch < 8, i.e.
    the RGB 3→32 conv): the int8 MXU tile utilization there is terrible —
    measured 1.27 ms for a 1.6 GFLOP conv (1.3 TFLOP/s); running the stem
    in bf16 and requantizing its output is 0.18 ms/batch faster end-to-end.
    """
    keep_bf16 = set()
    for i, layer in enumerate(spec.layers):
        if isinstance(layer, ConvSpec) and (layer.activation != "leaky"
                                            or layer.in_ch < 8):
            keep_bf16.add(i)
    return {i for i in spec.conv_indices if i not in keep_bf16}


def quantize_folded_int8_full(folded: Params, spec: GraphSpec) -> Params:
    """Per-output-channel symmetric int8 weights for every quantized conv."""
    q: Params = {}
    for i in int8_full_conv_indices(spec):
        w = np.asarray(folded[f"conv_{i}"]["w"], np.float32)
        s = np.abs(w).max(axis=(0, 1, 2)) / 127.0
        s = np.maximum(s, 1e-12)
        wq = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        q[f"conv_{i}"] = {
            "wq": jnp.asarray(wq),
            "ws": jnp.asarray(s, jnp.float32),
            "b": jnp.asarray(np.asarray(folded[f"conv_{i}"]["b"], np.float32)),
        }
    return q


def calibrate_act_scales_full(folded: Params, spec: GraphSpec,
                              x: jnp.ndarray,
                              percentile: float = 100.0) -> Dict[str, float]:
    """amax/127 per layer output over the full graph (f32 probe forward)."""
    @jax.jit
    def probe(params, xin):
        amax: Dict[str, jnp.ndarray] = {"in": _act_stat(xin, percentile)}
        saved: Dict[int, jnp.ndarray] = {}
        prev = xin
        for i, layer in enumerate(spec.layers):
            if isinstance(layer, ConvSpec):
                out = _conv(prev, params[f"conv_{i}"]["w"], layer.stride,
                            layer.pad)
                out = out + params[f"conv_{i}"]["b"]
                if layer.activation == "leaky":
                    out = _leaky(out)
            elif isinstance(layer, ShortcutSpec):
                out = prev + saved[layer.from_index]
            elif isinstance(layer, MaxPoolSpec):
                out = _maxpool(prev, layer.kernel, layer.stride)
            elif isinstance(layer, UpsampleSpec):
                out = _upsample(prev, layer.factor)
            elif isinstance(layer, RouteSpec):
                out = jnp.concatenate(
                    [saved[s] if s in saved else prev for s in layer.layers],
                    axis=-1)
            elif isinstance(layer, YoloSpec):
                out = prev
            else:  # pragma: no cover
                raise TypeError(f"unknown layer spec {layer!r}")
            amax[str(i)] = _act_stat(out, percentile)
            saved[i] = out
            prev = out
        return amax

    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    amax = jax.device_get(probe(folded, x))
    return {k: float(v) / 127.0 + 1e-12 for k, v in amax.items()}


def apply_folded_int8_full(
    folded: Params,
    qparams: Params,
    act_scales: Dict[str, float],
    spec: GraphSpec,
    x: jnp.ndarray,
    *,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    s2d_stem: Optional[Params] = None,
    s2d_downs: Optional[Dict[int, jnp.ndarray]] = None,
    int32_accum_max_hw: int = 0,
) -> List[jnp.ndarray]:
    """Full-graph int8 inference forward (head convs bf16).

    Every inter-layer activation is stored int8 with static calibrated
    scales — half the HBM traffic of bf16 everywhere, int8×int8 MXU convs
    at 2× bf16 peak — including the FPN tail that ``apply_folded_int8``
    leaves in bf16.  Route branches are rescaled int8→int8 to the route
    output's scale so the concat itself stays 1 byte/element.

    ``s2d_stem`` (from :func:`make_s2d_stem_int8`) replaces layers 0-1
    with the space-to-depth restructure: conv_a bf16 on the raw input,
    requantize at conv_0's calibrated scale, int8 conv_b with conv_1's
    relabeled integer weights (identical products), requantize at
    conv_1's scale — numerically the unfused path up to summation order.

    ``int32_accum_max_hw``: quantized convs whose OUTPUT map is at most
    this wide accumulate in exact int32 instead of bf16.  Isolated-unit
    A/B says int32 wins at the deep stages (26²: 0.409 vs 0.514
    ms/unit-batch-16, 13²: 0.407 vs 0.431; ``tools/bench_int8_block.py``)
    but end-to-end the full pipeline measures a wash (7.87 vs 7.85
    ms/batch-16 — XLA fuses the epilogues differently in graph context),
    so the default stays 0: the exact configuration the accuracy gate
    passed (BENCH.md "Deep-stage accumulator").
    """
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)

    last_use: Dict[int, int] = {}
    for i, cons in enumerate(spec.consumers):
        if cons:
            last_use[i] = max(cons)

    def quant(y, s):
        return jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)

    quantized = int8_full_conv_indices(spec)
    xs = act_scales["in"]
    # saved values are (int8 q, scale) pairs; scale None marks a bf16/f32
    # tensor (head-conv outputs, or the raw network input: when the stem is
    # excluded to bf16 it must see the full-precision input, not a 127-level
    # requantization of it — quantize lazily only if conv_0 is int8)
    saved: Dict[int, Tuple[jnp.ndarray, Optional[float]]] = {}
    head_maps: List[jnp.ndarray] = []
    prev_q, prev_s = x, None

    skip_until = -1
    if s2d_stem is not None:
        xsd = _space_to_depth(x.astype(compute_dtype))
        a = _conv(xsd, s2d_stem["wa"].astype(compute_dtype), 1, 1)
        a = _leaky(a.astype(jnp.float32) + s2d_stem["ba"])
        s0 = act_scales["0"]
        aq = quant(a, s0)
        y = _conv_b(aq, s2d_stem["wbq"], preferred=jnp.bfloat16
                    ).astype(jnp.float32) * (s0 * s2d_stem["wbs"]) \
            + s2d_stem["bb"]
        y = _leaky(y)
        prev_s = act_scales["1"]
        prev_q = quant(y, prev_s)
        if 1 in last_use:
            saved[1] = (prev_q, prev_s)
        skip_until = 2

    for i, layer in enumerate(spec.layers):
        if i < skip_until:
            continue
        out_q, out_s = None, None
        if isinstance(layer, ConvSpec):
            if i in quantized:
                if prev_s is None:  # raw input into a quantized conv
                    prev_q, prev_s = quant(prev_q, xs), xs
                qp = qparams[f"conv_{i}"]
                out_hw = prev_q.shape[1] // layer.stride
                accum = (jnp.int32 if out_hw <= int32_accum_max_hw
                         else jnp.bfloat16)
                if s2d_downs and i in s2d_downs:
                    # narrow-input stride-2 conv on the s2d grid: identical
                    # integer products (make_s2d_down_int8), MXU-shaped
                    y = _conv_b(_space_to_depth(prev_q), s2d_downs[i],
                                preferred=accum)
                else:
                    y = jax.lax.conv_general_dilated(
                        prev_q, qp["wq"],
                        window_strides=(layer.stride, layer.stride),
                        padding=((layer.pad, layer.pad),
                                 (layer.pad, layer.pad)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=accum,
                    )
                y = y.astype(jnp.float32) * (prev_s * qp["ws"]) + qp["b"]
                if layer.activation == "leaky":
                    y = _leaky(y)
                out_s = act_scales[str(i)]
                out_q = quant(y, out_s)
            else:  # bf16 conv (linear head conv, or an excluded leaky conv
                #       — e.g. the 3-channel stem, whose int8 MXU tile
                #       utilization is terrible)
                if prev_s is None:  # raw f32 input (bf16 stem) or bf16 map
                    xf = prev_q.astype(compute_dtype)
                else:
                    xf = (prev_q.astype(compute_dtype)
                          * jnp.asarray(prev_s, compute_dtype))
                w = folded[f"conv_{i}"]["w"].astype(compute_dtype)
                y = _conv(xf, w, layer.stride, layer.pad).astype(jnp.float32) \
                    + folded[f"conv_{i}"]["b"]
                if layer.activation == "leaky":
                    y = _leaky(y)
                    out_s = act_scales[str(i)]  # back to int8 downstream
                    out_q = quant(y, out_s)
                else:
                    out_q, out_s = y, None  # f32 map feeds the decode
        elif isinstance(layer, ShortcutSpec):
            aq, as_ = saved[layer.from_index]
            y = (prev_q.astype(jnp.float32) * prev_s
                 + aq.astype(jnp.float32) * as_)
            out_s = act_scales[str(i)]
            out_q = quant(y, out_s)
        elif isinstance(layer, MaxPoolSpec):
            # max commutes with the positive scale: pool int8 directly
            out_q = _maxpool_int8(prev_q, layer.kernel, layer.stride)
            out_s = prev_s
        elif isinstance(layer, UpsampleSpec):
            out_q = _upsample(prev_q, layer.factor)
            out_s = prev_s
        elif isinstance(layer, RouteSpec):
            out_s = act_scales[str(i)]
            parts = []
            for s_idx in layer.layers:
                q, s = saved[s_idx] if s_idx in saved else (prev_q, prev_s)
                if s is None:  # pragma: no cover — routes carry leaky outs
                    parts.append(quant(q, out_s))
                else:
                    parts.append(quant(q.astype(jnp.float32) * s, out_s))
            out_q = jnp.concatenate(parts, axis=-1)
        elif isinstance(layer, YoloSpec):
            assert prev_s is None, "yolo input must be the bf16 head conv"
            head_maps.append(prev_q)
            out_q, out_s = prev_q, prev_s
        else:  # pragma: no cover
            raise TypeError(f"unknown layer spec {layer!r}")
        if i in last_use:
            saved[i] = (out_q, out_s)
        for k in [k for k, lu in last_use.items() if lu == i and k in saved]:
            if k != i:
                del saved[k]
        prev_q, prev_s = out_q, out_s
    return head_maps


def _maxpool_int8(x: jnp.ndarray, kernel: int, stride: int) -> jnp.ndarray:
    """reduce_window max over int8 (same padding rules as _maxpool)."""
    if kernel == 2 and stride == 1:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)),
                    constant_values=np.int8(0))
        pads = ((0, 0), (0, 0))
    else:
        p = (kernel - 1) // 2
        pads = ((p, p), (p, p))
    return jax.lax.reduce_window(
        x, jnp.asarray(-128, x.dtype), jax.lax.max,
        (1, kernel, kernel, 1), (1, stride, stride, 1),
        ((0, 0),) + pads + ((0, 0),))


__all__ = [
    "Params", "init_params", "apply", "apply_folded", "fold_batchnorm",
    "int8_region", "quantize_folded_int8", "calibrate_act_scales",
    "apply_folded_int8", "fusible_residual_blocks", "pack_pallas_blocks",
    "int8_full_conv_indices", "quantize_folded_int8_full",
    "calibrate_act_scales_full", "apply_folded_int8_full",
    "make_s2d_stem", "make_s2d_stem_int8", "make_s2d_down_int8",
    "s2d_stem_forward",
    "BN_EPS", "BN_MOMENTUM", "LEAKY_SLOPE",
]
