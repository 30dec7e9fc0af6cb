"""On-device image preprocessing: letterbox, nearest resize, normalize, crops.

The reference preprocesses on the host per image (PIL + imgaug +
``F.interpolate``, ``utils/datasets.py:22-37`` / ``utils/transforms.py``);
here the batched uint8 tiles go straight to the device and letterbox +
resize + scale fuse into the jitted inference graph, so the host↔device
boundary carries uint8 pixels once and nothing else.

Numerical parity notes:

* nearest resize uses the same index rule as ``torch.nn.functional.
  interpolate(mode="nearest")``: ``src = floor(dst * in/out)``;
* pad-to-square splits the padding ``(diff//2, diff - diff//2)`` like
  ``pad_to_square`` (``utils/datasets.py:22-32``);
* :func:`crop256_window` reproduces ``get256Img``'s edge-clamped 256×256
  crop (``core.py:109-159``) — the branchy reference logic reduces to a
  clip of the centered window into ``[0, 1536-256]``, which we prove in
  tests against a direct transcription.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def nearest_indices(out_size: int, in_size: int) -> np.ndarray:
    """F.interpolate(nearest) source index per output position."""
    scale = in_size / out_size
    idx = np.floor(np.arange(out_size) * scale).astype(np.int32)
    return np.minimum(idx, in_size - 1)


def resize_nearest(x: jnp.ndarray, size: int, *,
                   layout: str = "nhwc") -> jnp.ndarray:
    """Nearest-neighbor resize to (size, size).

    ``layout="nhwc"`` (default): NHWC or HWC — H/W are the two axes before
    the channel axis.  ``layout="planar"``: (B, C, H, W) or (C, H, W) — H/W
    are the LAST two axes, so the takes stream W-minor tiles at full lane
    width (the training pipeline's planar fast path)."""
    if layout == "planar":
        h_axis, w_axis = x.ndim - 2, x.ndim - 1
    else:
        h_axis, w_axis = x.ndim - 3, x.ndim - 2
    hi = jnp.asarray(nearest_indices(size, x.shape[h_axis]))
    wi = jnp.asarray(nearest_indices(size, x.shape[w_axis]))
    x = jnp.take(x, hi, axis=h_axis)
    return jnp.take(x, wi, axis=w_axis)


def pad_to_square(x: jnp.ndarray, pad_value: float = 0.0) -> Tuple[jnp.ndarray, Tuple[int, int, int, int]]:
    """Center-pad an HWC (or NHWC) image to square; returns (img, pad).

    ``pad`` is (top, bottom, left, right) — the reference returns torch's
    (left, right, top, bottom) for its label math; use :func:`pad_amounts`
    when reproducing that.
    """
    h = x.shape[-3]
    w = x.shape[-2]
    diff = abs(h - w)
    p1, p2 = diff // 2, diff - diff // 2
    if h <= w:
        pads = (p1, p2, 0, 0)
    else:
        pads = (0, 0, p1, p2)
    cfg = [(0, 0)] * x.ndim
    cfg[-3] = (pads[0], pads[1])
    cfg[-2] = (pads[2], pads[3])
    return jnp.pad(x, cfg, constant_values=pad_value), pads


def pad_amounts(h: int, w: int) -> Tuple[int, int, int, int]:
    """(left, right, top, bottom) padding as produced by ``pad_to_square``
    in the reference (``utils/datasets.py:26-28``)."""
    diff = abs(h - w)
    p1, p2 = diff // 2, diff - diff // 2
    return (0, 0, p1, p2) if h <= w else (p1, p2, 0, 0)


@functools.partial(jax.jit, static_argnames=("model_size",))
def preprocess_tiles(tiles_u8: jnp.ndarray, model_size: int = 416) -> jnp.ndarray:
    """uint8 NHWC square tiles → float32 NHWC model input in [0, 1].

    Resize-then-scale (on uint8, then /255) is exactly equivalent to the
    reference's ToTensor-then-nearest-resize because nearest interpolation
    only gathers values.
    """
    x = resize_nearest(tiles_u8, model_size)
    return x.astype(jnp.float32) / 255.0


def crop256_window(bbox_xywh) -> Tuple[int, int]:
    """Top-left (x0, y0) of the 256² crop centered on a bbox, clamped to a
    1536² tile.  Closed form of ``get256Img``'s branch ladder
    (``core.py:109-159``)."""
    x, y, w, h = bbox_xywh
    cx = int(x + (w / 2))
    cy = int(y + (h / 2))
    x0 = min(max(cx - 128, 0), 1536 - 256)
    y0 = min(max(cy - 128, 0), 1536 - 256)
    return x0, y0


def crop256(img: np.ndarray, bbox_xywh) -> np.ndarray:
    """Host 256² crop (HWC) — parity with ``get256Img``."""
    x0, y0 = crop256_window(bbox_xywh)
    return img[y0:y0 + 256, x0:x0 + 256]


@functools.partial(jax.jit, static_argnames=())
def batched_crop256(tile_u8: jnp.ndarray, origins: jnp.ndarray) -> jnp.ndarray:
    """Extract K 256² crops from one 1536² HWC tile on device.

    ``origins``: (K, 2) int32 rows (x0, y0).  Replaces the reference's
    per-box cv2 crops + per-crop model reloads (``core.py:425-452``) with a
    single gather + one batched classifier call.
    """
    def one(origin):
        return jax.lax.dynamic_slice(
            tile_u8, (origin[1], origin[0], 0), (256, 256, tile_u8.shape[-1])
        )
    return jax.vmap(one)(origins)


def normalize_crops(crops_u8: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray) -> jnp.ndarray:
    """ToTensor + Normalize(mean, std) for the CAA-filter classifier
    (``core.py:50``, ``core.py:435``): x/255 then per-channel (x-mean)/std."""
    x = crops_u8.astype(jnp.float32) / 255.0
    return (x - mean[None, None, None, :]) / std[None, None, None, :]


__all__ = [
    "nearest_indices", "resize_nearest", "pad_to_square", "pad_amounts",
    "preprocess_tiles", "crop256_window", "crop256", "batched_crop256",
    "normalize_crops",
]
