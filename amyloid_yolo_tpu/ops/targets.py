"""Ground-truth assignment as a vectorized, deterministic scatter.

Parity target: ``build_targets`` (``/root/reference/utils/utils.py:276-330``):

* each GT box is assigned to its best wh-IoU anchor at the grid cell that
  contains its center (``gi = int(gx)``, ``gj = int(gy)``);
* ``noobj_mask`` is additionally zeroed at (b, a, gj, gi) for every anchor
  ``a`` whose wh-IoU with the GT exceeds ``ignore_thres``;
* regression targets: tx/ty fractional offsets, tw/th log size ratios
  (+1e-16), one-hot class targets;
* diagnostic tensors: per-cell class-correctness and IoU of the *predicted*
  box against the GT (+1-pixel IoU convention, via ``bbox_iou``).

Torch resolves duplicate GT→cell collisions with last-writer-wins (CPU
semantics).  XLA scatter order for duplicate indices is unspecified, so we
make last-writer-wins explicit: per flat cell key, only the highest target
index actually scatters (a ``segment_max`` winner election), which is both
deterministic and torch-CPU-equivalent.

Targets arrive as a fixed-capacity padded array ``(T, 6)`` rows
``(batch_idx, class, cx, cy, w, h)`` (normalized coords) plus a validity
mask — the TPU-native encoding of the reference's ragged concatenated
target tensor.  Invalid rows scatter out of bounds and are dropped.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .boxes import bbox_iou, bbox_wh_iou


def build_targets(
    pred_boxes: jnp.ndarray,   # (B, A, g, g, 4) grid units
    pred_cls: jnp.ndarray,     # (B, A, g, g, C)
    target: jnp.ndarray,       # (T, 6) padded
    target_mask: jnp.ndarray,  # (T,) bool
    anchors: jnp.ndarray,      # (A, 2) grid units
    ignore_thres: float,
) -> Dict[str, jnp.ndarray]:
    nB, nA, nG = pred_boxes.shape[0], pred_boxes.shape[1], pred_boxes.shape[2]
    nC = pred_cls.shape[-1]
    nT = target.shape[0]

    valid = target_mask
    b = target[:, 0].astype(jnp.int32)
    labels = target[:, 1].astype(jnp.int32)
    gxy = target[:, 2:4] * nG
    gwh = target[:, 4:6] * nG
    gx, gy = gxy[:, 0], gxy[:, 1]
    gw, gh = gwh[:, 0], gwh[:, 1]
    gi = jnp.clip(gx.astype(jnp.int32), 0, nG - 1)
    gj = jnp.clip(gy.astype(jnp.int32), 0, nG - 1)

    ious = bbox_wh_iou(anchors, gwh)          # (A, T)
    best_n = jnp.argmax(ious, axis=0)          # (T,) first-max like torch

    # out-of-range batch index for padded rows -> scatter drops them
    b_s = jnp.where(valid, b, nB)

    obj_mask = jnp.zeros((nB, nA, nG, nG), jnp.bool_)
    obj_mask = obj_mask.at[b_s, best_n, gj, gi].set(True, mode="drop")
    noobj_mask = jnp.ones((nB, nA, nG, nG), jnp.bool_)
    noobj_mask = noobj_mask.at[b_s, best_n, gj, gi].set(False, mode="drop")

    # zero noobj wherever ANY anchor's wh-IoU with the GT beats ignore_thres
    # (reference loop at utils/utils.py:314-315)
    anchor_ids = jnp.broadcast_to(jnp.arange(nA)[:, None], (nA, nT))
    ign = ious > ignore_thres
    b_ign = jnp.where(ign & valid[None, :], jnp.broadcast_to(b_s[None, :], (nA, nT)), nB)
    noobj_mask = noobj_mask.at[
        b_ign.reshape(-1),
        anchor_ids.reshape(-1),
        jnp.broadcast_to(gj[None, :], (nA, nT)).reshape(-1),
        jnp.broadcast_to(gi[None, :], (nA, nT)).reshape(-1),
    ].set(False, mode="drop")

    # --- last-writer-wins winner election for value scatters -------------
    key = ((b_s * nA + best_n) * nG + gj) * nG + gi
    key = jnp.where(valid, key, nB * nA * nG * nG)  # shared drop bucket
    num_seg = nB * nA * nG * nG + 1
    order = jnp.arange(nT)
    winner_per_key = jax.ops.segment_max(order, key, num_segments=num_seg)
    is_winner = valid & (winner_per_key[key] == order)
    b_w = jnp.where(is_winner, b, nB)

    def scat(base, values):
        return base.at[b_w, best_n, gj, gi].set(values, mode="drop")

    tx = scat(jnp.zeros((nB, nA, nG, nG), jnp.float32), gx - jnp.floor(gx))
    ty = scat(jnp.zeros((nB, nA, nG, nG), jnp.float32), gy - jnp.floor(gy))
    anchor_w = anchors[best_n, 0]
    anchor_h = anchors[best_n, 1]
    tw = scat(jnp.zeros((nB, nA, nG, nG), jnp.float32), jnp.log(gw / anchor_w + 1e-16))
    th = scat(jnp.zeros((nB, nA, nG, nG), jnp.float32), jnp.log(gh / anchor_h + 1e-16))

    # tcls indexes include the label, so distinct-class collisions in one
    # cell are distinct elements — every valid target writes (torch parity).
    tcls = jnp.zeros((nB, nA, nG, nG, nC), jnp.float32)
    tcls = tcls.at[b_s, best_n, gj, gi, jnp.clip(labels, 0, nC - 1)].set(1.0, mode="drop")

    pred_at = pred_boxes[jnp.clip(b, 0, nB - 1), best_n, gj, gi]   # (T, 4)
    pred_cls_at = pred_cls[jnp.clip(b, 0, nB - 1), best_n, gj, gi]  # (T, C)
    target_boxes = jnp.stack([gx, gy, gw, gh], axis=-1)
    iou_vals = bbox_iou(pred_at, target_boxes, x1y1x2y2=False)
    cls_ok = (jnp.argmax(pred_cls_at, axis=-1) == labels).astype(jnp.float32)

    iou_scores = scat(jnp.zeros((nB, nA, nG, nG), jnp.float32), iou_vals)
    class_mask = scat(jnp.zeros((nB, nA, nG, nG), jnp.float32), cls_ok)

    return {
        "iou_scores": iou_scores,
        "class_mask": class_mask,
        "obj_mask": obj_mask,
        "noobj_mask": noobj_mask,
        "tx": tx, "ty": ty, "tw": tw, "th": th,
        "tcls": tcls,
        "tconf": obj_mask.astype(jnp.float32),
    }


__all__ = ["build_targets"]
