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


def decode_topk(
    head_maps: List[jnp.ndarray],
    spec: GraphSpec,
    img_dim: int,
    conf_thres: float,
    pool: int,
    approx_topk: bool = False,
    return_count: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Fused score → top-k → sparse decode: the lazy form of
    :func:`decode_all` + NMS candidate selection.

    The dense path decodes all ``N = sum_h A*g_h²`` anchor rows (sigmoid/
    exp/grid over a (B, N, 5+C) tensor, plus the (g,g,A)→(A,g,g) transposes
    and the concat) only for NMS to keep ``pool`` (64) of them.  Here the
    full-map work is just the score — ``sigmoid(obj) * max_c sigmoid(cls)``
    computed in the maps' native NHWC layout (3 of 5+C channels, no big
    transpose: only the scalar score map is transposed into the reference's
    (anchor, row, col) row order, which keeps ``top_k`` tie behavior
    identical to the dense path) — and the box decode runs on the ``pool``
    gathered rows only.

    The arithmetic on the selected rows replicates :func:`decode_head`
    op-for-op (bf16 sigmoid/exp, f32 grid/anchor/stride math), followed by
    the NMS front-end's xywh→xyxy, so outputs are bit-identical to
    ``non_max_suppression(decode_all(...))`` on CPU
    (``tests/test_heads_lazy.py``).  On TPU, XLA's different fusion choices
    for the two program shapes can round bf16 transcendentals differently:
    measured ≤0.09 px box drift over the 200 real prospective images with
    identical detection counts/classes (BENCH.md gate table).

    Returns:
      ``(det, top_scores)``: ``det`` (B, pool, 7) rows
      ``(x1, y1, x2, y2, conf, cls_conf, cls_pred)`` in descending score
      order, padding rows marked by ``top_scores == -inf`` — the input
      contract of
      :func:`amyloid_yolo_tpu.ops.nms.non_max_suppression_pooled`; plus
      ``n_candidates`` (B,) int32 (conf-passing rows per image, the pool-
      overflow observable — see ``ops.nms.non_max_suppression``) when
      ``return_count``.
    """
    yolo_specs = [l for l in spec.layers if isinstance(l, YoloSpec)]
    assert len(yolo_specs) == len(head_maps)
    b = head_maps[0].shape[0]
    num_classes = yolo_specs[0].num_classes
    nch = 5 + num_classes

    # --- full-map scores in reference row order -------------------------
    scores = []
    for m, ys in zip(head_maps, yolo_specs):
        g, na = m.shape[1], len(ys.anchors)
        raw = m.reshape(b, g, g, na, nch)
        conf = jax.nn.sigmoid(raw[..., 4]).astype(jnp.float32)
        # sigmoid is monotonic: max over class logits first, one sigmoid
        cls_conf = jax.nn.sigmoid(
            jnp.max(raw[..., 5:], axis=-1)).astype(jnp.float32)
        s = jnp.where(conf >= conf_thres, conf * cls_conf, -jnp.inf)
        scores.append(s.transpose(0, 3, 1, 2).reshape(b, na * g * g))
    score = jnp.concatenate(scores, axis=1)  # (B, N)

    k = min(pool, score.shape[1])
    if approx_topk:
        top_scores, top_idx = jax.lax.approx_max_k(score, k)
        top_idx = top_idx.astype(jnp.int32)
    else:
        top_scores, top_idx = jax.lax.top_k(score, k)
    if k < pool:
        top_idx = jnp.pad(top_idx, ((0, 0), (0, pool - k)))
        top_scores = jnp.pad(top_scores, ((0, 0), (0, pool - k)),
                             constant_values=-jnp.inf)

    # --- sparse decode of the selected rows -----------------------------
    det = jnp.zeros((b, pool, 7), jnp.float32)
    off = 0
    for m, ys in zip(head_maps, yolo_specs):
        g, na = m.shape[1], len(ys.anchors)
        n_h = na * g * g
        stride = img_dim / g
        anc = jnp.asarray(ys.anchors, jnp.float32) / stride  # (A, 2)

        in_head = (top_idx >= off) & (top_idx < off + n_h)
        local = jnp.where(in_head, top_idx - off, 0)      # (B, pool)
        a = local // (g * g)
        rem = local % (g * g)
        r, c = rem // g, rem % g
        # native (row, col, anchor) flat index into the NHWC map
        flat = (r * g + c) * na + a
        rows = jnp.take_along_axis(
            m.reshape(b, g * g * na, nch), flat[..., None], axis=1
        )  # (B, pool, nch)

        xy = jax.nn.sigmoid(rows[..., 0:2])               # map dtype
        grid = jnp.stack([c, r], axis=-1).astype(jnp.float32)
        cxy = (xy + grid) * stride
        wh = jnp.exp(rows[..., 2:4]) * anc[a] * stride
        conf = jax.nn.sigmoid(rows[..., 4:5]).astype(jnp.float32)
        cls = jax.nn.sigmoid(rows[..., 5:])
        cls_conf = jnp.max(cls, axis=-1, keepdims=True).astype(jnp.float32)
        cls_pred = jnp.argmax(cls, axis=-1, keepdims=True).astype(jnp.float32)

        # xywh → xyxy exactly as the NMS front-end (ops/boxes.xywh2xyxy)
        half = wh.astype(jnp.float32) / 2
        boxes = jnp.concatenate(
            [cxy.astype(jnp.float32) - half, cxy.astype(jnp.float32) + half],
            axis=-1)
        det_h = jnp.concatenate([boxes, conf, cls_conf, cls_pred], axis=-1)
        det = jnp.where(in_head[..., None], det_h, det)
        off += n_h
    if return_count:
        n_candidates = jnp.sum(score > -jnp.inf, axis=1).astype(jnp.int32)
        return det, top_scores, n_candidates
    return det, top_scores


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


__all__ = ["decode_head", "decode_all", "decode_topk", "head_grid_tensors"]
