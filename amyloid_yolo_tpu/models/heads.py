"""YOLO head decoding — anchor transform fused into the jitted graph.

Parity target: ``YOLOLayer.forward`` inference path
(``/root/reference/models.py:127-169``):

* sigmoid on x, y, objectness and class logits;
* box center = sigmoid(x,y) + integer grid offset;
* box size = exp(w,h) * anchor (anchor expressed in grid units);
* everything scaled by the stride back to pixel space;
* per-head rows are flattened in (anchor, row, col) order and the three
  heads concatenated — the SAME row order as the reference, which matters
  because downstream NMS and greedy TP-matching are order-sensitive.

The reference recomputes grid offset tensors whenever the grid size changes
and stores them on the module (``models.py:115-125``); here offsets are
constants materialized at trace time, so XLA folds them.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..graphspec import GraphSpec, YoloSpec


def decode_head(
    raw: jnp.ndarray, anchors: Sequence[Tuple[float, float]], img_dim: int,
    num_classes: int,
) -> jnp.ndarray:
    """Decode one raw NHWC head map into ``(B, A*g*g, 5+C)`` predictions.

    ``raw`` has shape (B, g, g, A*(5+C)) with the channel c = a*(5+C)+k
    layout inherited from the conv filters (identical filter order to the
    reference's NCHW view at ``models.py:137-141``).
    """
    b, g = raw.shape[0], raw.shape[1]
    na = len(anchors)
    nch = 5 + num_classes
    stride = img_dim / g

    # (B, g, g, A, 5+C) -> (B, A, g, g, 5+C) to match reference row order
    pred = raw.reshape(b, g, g, na, nch).transpose(0, 3, 1, 2, 4)

    xy = jax.nn.sigmoid(pred[..., 0:2])
    wh = pred[..., 2:4]
    conf = jax.nn.sigmoid(pred[..., 4:5])
    cls = jax.nn.sigmoid(pred[..., 5:])

    gx = jnp.arange(g, dtype=jnp.float32)
    grid = jnp.stack(jnp.meshgrid(gx, gx, indexing="xy"), axis=-1)  # (g, g, 2) = (col,row)
    anc = jnp.asarray(anchors, jnp.float32) / stride  # grid units
    boxes = jnp.concatenate(
        [
            (xy + grid[None, None]) * stride,
            jnp.exp(wh) * anc[None, :, None, None, :] * stride,
        ],
        axis=-1,
    )
    out = jnp.concatenate([boxes, conf, cls], axis=-1)
    return out.reshape(b, na * g * g, nch)


def decode_all(
    head_maps: List[jnp.ndarray], spec: GraphSpec, img_dim: int
) -> jnp.ndarray:
    """Decode and concatenate every head: ``(B, sum_h A*g_h^2, 5+C)``.

    Equivalent to the ``torch.cat(yolo_outputs, 1)`` at ``models.py:254`` —
    minus the reference's per-step device→host ``to_cpu`` sync, which we
    deliberately do not reproduce (detections stay on device for NMS).
    """
    yolo_specs = [l for l in spec.layers if isinstance(l, YoloSpec)]
    assert len(yolo_specs) == len(head_maps)
    outs = [
        decode_head(m, ys.anchors, img_dim, ys.num_classes)
        for m, ys in zip(head_maps, yolo_specs)
    ]
    return jnp.concatenate(outs, axis=1)


def head_grid_tensors(
    raw: jnp.ndarray, anchors: Sequence[Tuple[float, float]], img_dim: int,
    num_classes: int,
):
    """Training-path decode: return the pieces the YOLO loss needs.

    Mirrors the tensors ``YOLOLayer.forward`` feeds ``build_targets`` with
    (``models.py:144-160``): sigmoid x/y, raw w/h, sigmoid conf/cls, and
    pred boxes in *grid* units, all shaped (B, A, g, g, ...).
    """
    b, g = raw.shape[0], raw.shape[1]
    na = len(anchors)
    nch = 5 + num_classes
    stride = img_dim / g
    pred = raw.reshape(b, g, g, na, nch).transpose(0, 3, 1, 2, 4)

    x = jax.nn.sigmoid(pred[..., 0])
    y = jax.nn.sigmoid(pred[..., 1])
    w = pred[..., 2]
    h = pred[..., 3]
    conf = jax.nn.sigmoid(pred[..., 4])
    cls = jax.nn.sigmoid(pred[..., 5:])

    gxs = jnp.arange(g, dtype=jnp.float32)
    grid_x = jnp.broadcast_to(gxs[None, None, None, :], (1, 1, g, g))
    grid_y = jnp.broadcast_to(gxs[None, None, :, None], (1, 1, g, g))
    scaled_anchors = jnp.asarray(anchors, jnp.float32) / stride
    pred_boxes = jnp.stack(
        [
            x + grid_x[0],
            y + grid_y[0],
            jnp.exp(w) * scaled_anchors[:, 0][None, :, None, None],
            jnp.exp(h) * scaled_anchors[:, 1][None, :, None, None],
        ],
        axis=-1,
    )
    return {
        "x": x, "y": y, "w": w, "h": h, "conf": conf, "cls": cls,
        "pred_boxes": pred_boxes, "scaled_anchors": scaled_anchors,
        "stride": stride, "grid_size": g,
    }


__all__ = ["decode_head", "decode_all", "head_grid_tensors"]
