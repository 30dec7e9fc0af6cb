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

Params = Dict[str, Dict[str, jnp.ndarray]]

BN_EPS = 1e-5
BN_MOMENTUM = 0.9  # torch BatchNorm2d(momentum=0.9) — reference models.py:43
LEAKY_SLOPE = 0.1


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

def _conv(x: jnp.ndarray, w: jnp.ndarray, stride: int, pad: int) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32 if x.dtype == jnp.bfloat16 else None,
    )


def _leaky(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x >= 0, x, LEAKY_SLOPE * x)


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
) -> Tuple[List[jnp.ndarray], Optional[Params]]:
    """Run the backbone+heads; return raw NHWC maps at each yolo layer.

    Returns ``(head_maps, new_bn_stats)`` — ``new_bn_stats`` is ``None`` in
    eval mode, else a dict ``{"bn_i": {"mean": ..., "var": ...}}`` of updated
    running statistics (functional counterpart of torch's in-place BN state).

    Decoding the raw maps into boxes is a separate concern
    (:mod:`amyloid_yolo_tpu.models.heads`) so that training can fuse decode
    into the loss and inference can fuse it into NMS.
    """
    if x.dtype != compute_dtype:
        x = x.astype(compute_dtype)

    # liveness: keep an activation only while a later route/shortcut needs it
    last_use: Dict[int, int] = {}
    for i, cons in enumerate(spec.consumers):
        if cons:
            last_use[i] = max(cons)

    new_stats: Params = {}
    saved: Dict[int, jnp.ndarray] = {}
    head_maps: List[jnp.ndarray] = []
    prev: Optional[jnp.ndarray] = x

    for i, layer in enumerate(spec.layers):
        if isinstance(layer, ConvSpec):
            w = params[f"conv_{i}"]["w"].astype(compute_dtype)
            out = _conv(prev, w, layer.stride, layer.pad)
            if layer.batch_normalize:
                bn = params[f"bn_{i}"]
                if train:
                    out32 = out.astype(jnp.float32)
                    mean = jnp.mean(out32, axis=(0, 1, 2))
                    var = jnp.mean((out32 - mean) ** 2, axis=(0, 1, 2))
                    n = out32.shape[0] * out32.shape[1] * out32.shape[2]
                    unbiased = var * (n / max(n - 1, 1))
                    new_stats[f"bn_{i}"] = {
                        "mean": (1 - BN_MOMENTUM) * bn["mean"] + BN_MOMENTUM * mean,
                        "var": (1 - BN_MOMENTUM) * bn["var"] + BN_MOMENTUM * unbiased,
                    }
                else:
                    mean, var = bn["mean"], bn["var"]
                inv = jax.lax.rsqrt(var.astype(jnp.float32) + BN_EPS)
                out = (out.astype(jnp.float32) - mean) * (bn["scale"] * inv) + bn["bias"]
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
            head_maps.append(prev.astype(jnp.float32))
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


def apply_folded(
    folded: Params,
    spec: GraphSpec,
    x: jnp.ndarray,
    *,
    compute_dtype: jnp.dtype = jnp.bfloat16,
) -> List[jnp.ndarray]:
    """Inference-only forward over BN-folded params (bf16 by default)."""
    if x.dtype != compute_dtype:
        x = x.astype(compute_dtype)

    last_use: Dict[int, int] = {}
    for i, cons in enumerate(spec.consumers):
        if cons:
            last_use[i] = max(cons)

    saved: Dict[int, jnp.ndarray] = {}
    head_maps: List[jnp.ndarray] = []
    prev = x
    for i, layer in enumerate(spec.layers):
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


__all__ = [
    "Params", "init_params", "apply", "apply_folded", "fold_batchnorm",
    "BN_EPS", "BN_MOMENTUM", "LEAKY_SLOPE",
]
