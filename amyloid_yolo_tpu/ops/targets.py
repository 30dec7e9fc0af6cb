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

import os
from typing import Dict

import jax
import jax.numpy as jnp

from .boxes import bbox_iou, bbox_wh_iou

# Assignment form (see build_targets docstring): "dense" replaces the TPU
# serial-loop scatters with vectorized compare-reductions — bit-identical,
# measured on-chip before flipping any default.  Resolved at trace time.
TARGETS_FORM = os.environ.get("AMYOLO_TARGETS_FORM", "scatter")


def build_targets(
    pred_boxes: jnp.ndarray,   # (B, A, g, g, 4) grid units
    pred_cls: jnp.ndarray,     # (B, A, g, g, C)
    target: jnp.ndarray,       # (T, 6) padded
    target_mask: jnp.ndarray,  # (T,) bool
    anchors: jnp.ndarray,      # (A, 2) grid units
    ignore_thres: float,
    form: str = None,
) -> Dict[str, jnp.ndarray]:
    """``form``: ``"scatter"`` uses XLA scatters (TPU lowers them to a
    sequential dynamic-update-slice loop over the T target rows — trace-
    attributed at ~1.8 ms/step for the three heads at b8@416²);
    ``"dense"`` replaces every scatter with a compare-against-all-cells
    reduction / one-hot matmul, bit-identical outputs (same winner
    election, same gathered values).  ``None`` defers to the module
    default ``TARGETS_FORM``."""
    if form is None:
        form = TARGETS_FORM
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

    # per-target values (shared by both assignment forms)
    anchor_w = anchors[best_n, 0]
    anchor_h = anchors[best_n, 1]
    tx_v = gx - jnp.floor(gx)
    ty_v = gy - jnp.floor(gy)
    tw_v = jnp.log(gw / anchor_w + 1e-16)
    th_v = jnp.log(gh / anchor_h + 1e-16)
    pred_at = pred_boxes[jnp.clip(b, 0, nB - 1), best_n, gj, gi]   # (T, 4)
    pred_cls_at = pred_cls[jnp.clip(b, 0, nB - 1), best_n, gj, gi]  # (T, C)
    target_boxes = jnp.stack([gx, gy, gw, gh], axis=-1)
    iou_vals = bbox_iou(pred_at, target_boxes, x1y1x2y2=False)
    cls_ok = (jnp.argmax(pred_cls_at, axis=-1) == labels).astype(jnp.float32)
    ign = ious > ignore_thres
    labels_c = jnp.clip(labels, 0, nC - 1)

    # assigned-cell flat key; padded rows get a key past every real cell
    ncell = nB * nA * nG * nG
    key = ((b_s * nA + best_n) * nG + gj) * nG + gi
    key = jnp.where(valid, key, ncell)  # shared drop bucket
    order = jnp.arange(nT)

    if form == "dense":
        return _assemble_dense(
            nB, nA, nG, nC, ncell, key, order, valid, labels_c, ign, b_s,
            gj, gi, tx_v, ty_v, tw_v, th_v, iou_vals, cls_ok)

    obj_mask = jnp.zeros((nB, nA, nG, nG), jnp.bool_)
    obj_mask = obj_mask.at[b_s, best_n, gj, gi].set(True, mode="drop")
    noobj_mask = jnp.ones((nB, nA, nG, nG), jnp.bool_)
    noobj_mask = noobj_mask.at[b_s, best_n, gj, gi].set(False, mode="drop")

    # zero noobj wherever ANY anchor's wh-IoU with the GT beats ignore_thres
    # (reference loop at utils/utils.py:314-315)
    anchor_ids = jnp.broadcast_to(jnp.arange(nA)[:, None], (nA, nT))
    b_ign = jnp.where(ign & valid[None, :], jnp.broadcast_to(b_s[None, :], (nA, nT)), nB)
    noobj_mask = noobj_mask.at[
        b_ign.reshape(-1),
        anchor_ids.reshape(-1),
        jnp.broadcast_to(gj[None, :], (nA, nT)).reshape(-1),
        jnp.broadcast_to(gi[None, :], (nA, nT)).reshape(-1),
    ].set(False, mode="drop")

    # --- last-writer-wins winner election for value scatters -------------
    num_seg = ncell + 1
    winner_per_key = jax.ops.segment_max(order, key, num_segments=num_seg)
    is_winner = valid & (winner_per_key[key] == order)
    b_w = jnp.where(is_winner, b, nB)

    def scat(base, values):
        return base.at[b_w, best_n, gj, gi].set(values, mode="drop")

    tx = scat(jnp.zeros((nB, nA, nG, nG), jnp.float32), tx_v)
    ty = scat(jnp.zeros((nB, nA, nG, nG), jnp.float32), ty_v)
    tw = scat(jnp.zeros((nB, nA, nG, nG), jnp.float32), tw_v)
    th = scat(jnp.zeros((nB, nA, nG, nG), jnp.float32), th_v)

    # tcls indexes include the label, so distinct-class collisions in one
    # cell are distinct elements — every valid target writes (torch parity).
    tcls = jnp.zeros((nB, nA, nG, nG, nC), jnp.float32)
    tcls = tcls.at[b_s, best_n, gj, gi, labels_c].set(1.0, mode="drop")

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


def _assemble_dense(nB, nA, nG, nC, ncell, key, order, valid, labels_c, ign,
                    b_s, gj, gi, tx_v, ty_v, tw_v, th_v, iou_vals, cls_ok):
    """Scatter-free assembly: every target-to-grid write becomes a
    compare-against-all-cells reduction (or a one-hot matmul for tcls).

    TPU lowers a scatter with runtime indices to a sequential while loop
    of dynamic-update-slices over the T rows; this form trades those
    serial loops for (T × cells) vectorized compares that fuse into
    single-pass reductions.  Outputs are bit-identical to the scatter
    form: the winner election (max target index per cell) IS
    last-writer-wins, and values are gathered, not accumulated.
    """
    nT = key.shape[0]
    shape = (nB, nA, nG, nG)
    cell = jnp.arange(ncell, dtype=key.dtype)

    hit = key[:, None] == cell[None, :]                     # (T, ncell)
    winner = jnp.max(jnp.where(hit, order[:, None], -1), axis=0)  # (ncell,)
    assigned = winner >= 0
    w = jnp.clip(winner, 0)

    def pick(values):
        return jnp.where(assigned, values[w], 0.0).reshape(shape)

    obj_mask = assigned.reshape(shape)

    # noobj: clear at every assigned cell AND every (b, anchor, gj, gi)
    # whose wh-IoU beats ignore_thres (all anchors, reference
    # utils/utils.py:314-315); key with the anchor term re-based per a.
    a_ids = jnp.arange(nA, dtype=key.dtype)
    key_ign = (((b_s[None, :] * nA + a_ids[:, None]) * nG + gj[None, :])
               * nG + gi[None, :])                           # (A, T)
    key_ign = jnp.where(ign & valid[None, :], key_ign, ncell).reshape(-1)
    ignored = jnp.any(key_ign[:, None] == cell[None, :], axis=0)
    noobj_mask = (~(assigned | ignored)).reshape(shape)

    # tcls: EVERY valid target writes its one-hot class (not just the
    # winner — distinct-class collisions coexist, torch parity).  One-hot
    # matmul: counts per (cell, class) > 0.
    onehot = (labels_c[:, None] == jnp.arange(nC)[None, :])   # (T, C)
    counts = jax.lax.dot_general(
        hit.astype(jnp.bfloat16), onehot.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())),  # contract over T — no transpose
        preferred_element_type=jnp.float32)                   # (ncell, C)
    # counts ≤ T < 256 are exact in bf16 inputs / f32 accumulation
    tcls = (counts > 0).astype(jnp.float32).reshape(shape + (nC,))

    return {
        "iou_scores": pick(iou_vals),
        "class_mask": pick(cls_ok),
        "obj_mask": obj_mask,
        "noobj_mask": noobj_mask,
        "tx": pick(tx_v), "ty": pick(ty_v),
        "tw": pick(tw_v), "th": pick(th_v),
        "tcls": tcls,
        "tconf": obj_mask.astype(jnp.float32),
    }


__all__ = ["build_targets"]
