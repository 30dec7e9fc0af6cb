"""YOLO loss — exact replication of the reference's per-head loss.

Parity target: ``YOLOLayer.forward`` training path
(``/root/reference/models.py:171-222``):

* MSE (mean over assigned cells) on x, y offsets and raw w, h;
* BCE on objectness over assigned cells (scale 1) and over noobj cells
  (scale 100) — the reference's 1:100 obj/noobj weighting;
* BCE on class probabilities over assigned cells;
* total = sum of the six terms, summed over the three heads.

torch ``BCELoss`` clamps each log term at -100; we reproduce that.  Masked
means are computed as ``sum(term * mask) / count`` — identical to torch's
boolean-indexed mean whenever ``count > 0``.  When a mask selects zero
elements torch returns NaN (empty mean); we return 0 for that term instead
so training on sparse batches stays finite.  This is the one deliberate
behavioral divergence in the loss and is documented here.

The per-head metrics dict mirrors ``models.py:193-220`` (cls_acc, recall50/
75, precision, conf_obj/noobj) but stays on-device: the reference's
per-batch ``.item()`` host syncs are an inefficiency we do not replicate —
callers fetch metrics only when they actually log.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..graphspec import GraphSpec, YoloSpec
from ..models.heads import head_grid_tensors
from .targets import build_targets


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    cnt = jnp.sum(mask)
    return jnp.where(cnt > 0, jnp.sum(x * mask) / jnp.maximum(cnt, 1), 0.0)


def _bce(p: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Binary cross-entropy on probabilities, gradient-safe at saturation.

    torch.nn.BCELoss clamps the log at -100 and bounds the backward by
    clamping the ``p(1-p)`` denominator.  Clipping only the log in JAX
    leaves a ``0 * inf = NaN`` in the gradient when a sigmoid saturates to
    exactly 0/1 in f32 (|logit| ≳ 17) — which happens at random init on the
    full-size model and killed from-scratch training.  Clamping the
    *probability* bounds both forward and backward; the forward differs
    from torch only in the ultra-saturated region (loss capped at ~27.6 vs
    torch's 100 per element), far outside any parity-tested regime.
    """
    p = jnp.clip(p, 1e-12, 1.0 - 1e-7)
    return -(t * jnp.log(p) + (1.0 - t) * jnp.log1p(-p))


def yolo_head_loss(
    raw: jnp.ndarray,
    yolo: YoloSpec,
    img_dim: int,
    target: jnp.ndarray,
    target_mask: jnp.ndarray,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Loss + metrics for one head's raw NHWC map."""
    t = head_grid_tensors(raw, yolo.anchors, img_dim, yolo.num_classes)
    bt = build_targets(
        pred_boxes=t["pred_boxes"],
        pred_cls=t["cls"],
        target=target,
        target_mask=target_mask,
        anchors=t["scaled_anchors"],
        ignore_thres=yolo.ignore_thres,
    )
    obj = bt["obj_mask"].astype(jnp.float32)
    noobj = bt["noobj_mask"].astype(jnp.float32)

    loss_x = _masked_mean((t["x"] - bt["tx"]) ** 2, obj)
    loss_y = _masked_mean((t["y"] - bt["ty"]) ** 2, obj)
    loss_w = _masked_mean((t["w"] - bt["tw"]) ** 2, obj)
    loss_h = _masked_mean((t["h"] - bt["th"]) ** 2, obj)
    loss_conf_obj = _masked_mean(_bce(t["conf"], bt["tconf"]), obj)
    loss_conf_noobj = _masked_mean(_bce(t["conf"], bt["tconf"]), noobj)
    loss_conf = yolo.obj_scale * loss_conf_obj + yolo.noobj_scale * loss_conf_noobj
    loss_cls = _masked_mean(
        jnp.sum(_bce(t["cls"], bt["tcls"]), axis=-1) / t["cls"].shape[-1], obj
    )
    total = loss_x + loss_y + loss_w + loss_h + loss_conf + loss_cls

    # diagnostics (models.py:193-220)
    cls_acc = 100.0 * _masked_mean(bt["class_mask"], obj)
    conf_obj = _masked_mean(t["conf"], obj)
    conf_noobj = _masked_mean(t["conf"], noobj)
    conf50 = (t["conf"] > 0.5).astype(jnp.float32)
    iou50 = (bt["iou_scores"] > 0.5).astype(jnp.float32)
    iou75 = (bt["iou_scores"] > 0.75).astype(jnp.float32)
    detected = conf50 * bt["class_mask"] * obj
    precision = jnp.sum(iou50 * detected) / (jnp.sum(conf50) + 1e-16)
    recall50 = jnp.sum(iou50 * detected) / (jnp.sum(obj) + 1e-16)
    recall75 = jnp.sum(iou75 * detected) / (jnp.sum(obj) + 1e-16)

    metrics = {
        "loss": total, "x": loss_x, "y": loss_y, "w": loss_w, "h": loss_h,
        "conf": loss_conf, "cls": loss_cls, "cls_acc": cls_acc,
        "recall50": recall50, "recall75": recall75, "precision": precision,
        "conf_obj": conf_obj, "conf_noobj": conf_noobj,
        "grid_size": jnp.asarray(t["grid_size"], jnp.float32),
    }
    return total, metrics


def yolo_loss(
    head_maps: List[jnp.ndarray],
    spec: GraphSpec,
    img_dim: int,
    target: jnp.ndarray,
    target_mask: jnp.ndarray,
) -> Tuple[jnp.ndarray, List[Dict[str, jnp.ndarray]]]:
    """Total loss over all heads (sum, matching ``models.py:249-251``)."""
    yolo_specs = [l for l in spec.layers if isinstance(l, YoloSpec)]
    total = jnp.float32(0.0)
    per_head = []
    for raw, ys in zip(head_maps, yolo_specs):
        l, m = yolo_head_loss(raw, ys, img_dim, target, target_mask)
        total = total + l
        per_head.append(m)
    return total, per_head


__all__ = ["yolo_loss", "yolo_head_loss"]
