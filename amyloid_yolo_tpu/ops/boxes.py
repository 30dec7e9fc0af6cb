"""Box coordinate and IoU primitives.

Two IoU conventions coexist in the reference and BOTH are preserved:

* :func:`bbox_iou` — the detection-ops convention with the **+1 pixel** term
  on widths/heights (``utils/utils.py:202-232``), used by NMS, target
  assignment and batch statistics.
* :func:`iou_xyxy` in :mod:`amyloid_yolo_tpu.domain` — the study-layer scalar
  IOU (``core.py:497-518``), also +1, but float division without the 1e-16
  epsilon.

All functions here are pure jnp and safe under ``jit``/``vmap``; numpy
mirrors with ``_np`` suffix serve host-side analysis code.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def xywh2xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) → (x1, y1, x2, y2); parity ``utils/utils.py:53-59``."""
    cx, cy, w, h = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xywh2xyxy_np(x: np.ndarray) -> np.ndarray:
    y = np.zeros_like(x)
    y[..., 0] = x[..., 0] - x[..., 2] / 2
    y[..., 1] = x[..., 1] - x[..., 3] / 2
    y[..., 2] = x[..., 0] + x[..., 2] / 2
    y[..., 3] = x[..., 1] + x[..., 3] / 2
    return y


def xyxy2xywh_np(x: np.ndarray) -> np.ndarray:
    y = np.zeros_like(x)
    y[..., 0] = (x[..., 0] + x[..., 2]) / 2
    y[..., 1] = (x[..., 1] + x[..., 3]) / 2
    y[..., 2] = x[..., 2] - x[..., 0]
    y[..., 3] = x[..., 3] - x[..., 1]
    return y


def bbox_iou(box1: jnp.ndarray, box2: jnp.ndarray, x1y1x2y2: bool = True) -> jnp.ndarray:
    """Elementwise IoU with the reference's +1-pixel area convention.

    Broadcasts over leading dims. Parity: ``utils/utils.py:202-232``
    (intersection and areas both add +1 to width/height; epsilon 1e-16).
    """
    if not x1y1x2y2:
        b1 = xywh2xyxy(box1)
        b2 = xywh2xyxy(box2)
    else:
        b1, b2 = box1, box2
    ix1 = jnp.maximum(b1[..., 0], b2[..., 0])
    iy1 = jnp.maximum(b1[..., 1], b2[..., 1])
    ix2 = jnp.minimum(b1[..., 2], b2[..., 2])
    iy2 = jnp.minimum(b1[..., 3], b2[..., 3])
    inter = jnp.clip(ix2 - ix1 + 1, 0, None) * jnp.clip(iy2 - iy1 + 1, 0, None)
    a1 = (b1[..., 2] - b1[..., 0] + 1) * (b1[..., 3] - b1[..., 1] + 1)
    a2 = (b2[..., 2] - b2[..., 0] + 1) * (b2[..., 3] - b2[..., 1] + 1)
    return inter / (a1 + a2 - inter + 1e-16)


def bbox_iou_np(box1: np.ndarray, box2: np.ndarray) -> np.ndarray:
    """Numpy mirror of :func:`bbox_iou` (xyxy only), broadcasting."""
    ix1 = np.maximum(box1[..., 0], box2[..., 0])
    iy1 = np.maximum(box1[..., 1], box2[..., 1])
    ix2 = np.minimum(box1[..., 2], box2[..., 2])
    iy2 = np.minimum(box1[..., 3], box2[..., 3])
    inter = np.clip(ix2 - ix1 + 1, 0, None) * np.clip(iy2 - iy1 + 1, 0, None)
    a1 = (box1[..., 2] - box1[..., 0] + 1) * (box1[..., 3] - box1[..., 1] + 1)
    a2 = (box2[..., 2] - box2[..., 0] + 1) * (box2[..., 3] - box2[..., 1] + 1)
    return inter / (a1 + a2 - inter + 1e-16)


def bbox_wh_iou(wh1: jnp.ndarray, wh2: jnp.ndarray) -> jnp.ndarray:
    """IoU of (w,h) pairs assuming shared centers; parity ``utils/utils.py:193-199``.

    ``wh1``: (A, 2) anchors, ``wh2``: (T, 2) targets → (A, T).
    Note the reference's asymmetric epsilon (added to the *first* area only).
    """
    w1, h1 = wh1[:, 0:1], wh1[:, 1:2]  # (A,1)
    w2, h2 = wh2[None, :, 0], wh2[None, :, 1]  # (1,T)
    inter = jnp.minimum(w1, w2) * jnp.minimum(h1, h2)
    union = (w1 * h1 + 1e-16) + w2 * h2 - inter
    return inter / union


def rescale_boxes(boxes: np.ndarray, current_dim: int, original_shape) -> np.ndarray:
    """Undo letterbox padding back to original pixel space.

    Parity: ``utils/utils.py:36-50`` including the ``// 2`` floor on the pad
    and its implicit square-pad assumption.  Host-side numpy (this runs on
    ragged per-image detections); :func:`rescale_boxes_jnp` is the batched
    on-device variant used inside the jitted inference pipeline.
    """
    boxes = np.array(boxes, dtype=np.float64, copy=True)
    orig_h, orig_w = original_shape
    pad_x = max(orig_h - orig_w, 0) * (current_dim / max(original_shape))
    pad_y = max(orig_w - orig_h, 0) * (current_dim / max(original_shape))
    unpad_h = current_dim - pad_y
    unpad_w = current_dim - pad_x
    boxes[:, 0] = ((boxes[:, 0] - pad_x // 2) / unpad_w) * orig_w
    boxes[:, 1] = ((boxes[:, 1] - pad_y // 2) / unpad_h) * orig_h
    boxes[:, 2] = ((boxes[:, 2] - pad_x // 2) / unpad_w) * orig_w
    boxes[:, 3] = ((boxes[:, 3] - pad_y // 2) / unpad_h) * orig_h
    return boxes


def rescale_boxes_jnp(boxes: jnp.ndarray, current_dim: int, orig_h: int, orig_w: int) -> jnp.ndarray:
    """Batched on-device rescale for fixed-size outputs (B, K, ≥4)."""
    pad_x = max(orig_h - orig_w, 0) * (current_dim / max(orig_h, orig_w))
    pad_y = max(orig_w - orig_h, 0) * (current_dim / max(orig_h, orig_w))
    unpad_h = current_dim - pad_y
    unpad_w = current_dim - pad_x
    sx = orig_w / unpad_w
    sy = orig_h / unpad_h
    px = pad_x // 2
    py = pad_y // 2
    x1 = (boxes[..., 0] - px) * sx
    y1 = (boxes[..., 1] - py) * sy
    x2 = (boxes[..., 2] - px) * sx
    y2 = (boxes[..., 3] - py) * sy
    return jnp.concatenate(
        [jnp.stack([x1, y1, x2, y2], axis=-1), boxes[..., 4:]], axis=-1
    )


def rescale_from_tile_frame(dets: np.ndarray, tile_size: int,
                            original_shape) -> np.ndarray:
    """Map detections from the square tile frame back to an image's original
    pixel space.

    ``ImageFolder`` frames a non-square / undersized tile by center-padding
    to ``side = max(h, w)`` and nearest-resizing that square to
    ``tile_size`` (the reference instead feeds each image's own square to
    the model and undoes it per image via ``rescale_boxes``,
    ``utils/utils.py:36-50`` — same geometry, different frame).  Inverse:
    scale by ``side / tile_size``, subtract the center pads.  No-op for
    standard ``(tile_size, tile_size)`` tiles.
    """
    h, w = int(original_shape[0]), int(original_shape[1])
    if (h, w) == (tile_size, tile_size):
        return np.asarray(dets)
    side = max(h, w)
    diff = abs(h - w)
    p1 = diff // 2
    # h < w: vertical pad (top = p1); w < h: horizontal pad (left = p1)
    pad_l, pad_t = (0, p1) if h < w else (p1, 0) if w < h else (0, 0)
    s = side / float(tile_size)
    out = np.array(dets, np.float32, copy=True)
    out[:, [0, 2]] = out[:, [0, 2]] * s - pad_l
    out[:, [1, 3]] = out[:, [1, 3]] * s - pad_t
    return out


__all__ = [
    "xywh2xyxy", "xywh2xyxy_np", "xyxy2xywh_np", "bbox_iou", "bbox_iou_np",
    "bbox_wh_iou", "rescale_boxes", "rescale_boxes_jnp",
    "rescale_from_tile_frame",
]
