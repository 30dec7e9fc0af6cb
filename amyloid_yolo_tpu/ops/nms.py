"""Class-aware *merging* NMS, vectorized for TPU.

The reference's ``non_max_suppression`` (``utils/utils.py:235-273``) is not
plain suppression: the kept box's coordinates become the confidence-weighted
average of every same-class box it suppresses.  Its Python ``while`` loop
over a ragged tensor cannot run under ``jit``; here the same greedy
algorithm runs as a fixed-capacity masked ``fori_loop``:

1. confidence filter (``conf >= conf_thres``);
2. score = obj_conf × max class prob, sort via ``top_k`` (descending, ties
   by row index — torch ``argsort`` tie order is unspecified, so exact tie
   behavior is not contractual);
3. scan slots in score order; an active slot becomes a keeper, suppresses
   all active same-class boxes with IoU > ``nms_thres`` (+1-pixel IoU
   convention like the reference), and takes their conf-weighted mean box.

Because suppression only ever deactivates *lower*-scored rows, scanning the
sorted slots left→right visits exactly the reference's keep sequence, and
the output rows ``(x1, y1, x2, y2, conf, cls_conf, cls_pred)`` appear in the
same order.  Outputs are padded to ``capacity`` with a validity mask —
ragged→fixed-shape is the standard TPU trade so the whole
model+decode+NMS pipeline stays in one compiled graph with zero host syncs.

:func:`non_max_suppression_np` is the host-side mirror (used by tests and by
host analysis paths that start from ragged numpy arrays).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .boxes import bbox_iou, bbox_iou_np, xywh2xyxy, xywh2xyxy_np


@functools.partial(jax.jit, static_argnames=("conf_thres", "nms_thres",
                                              "capacity", "pool",
                                              "approx_topk", "return_count"))
def non_max_suppression(
    prediction: jnp.ndarray,
    conf_thres: float = 0.5,
    nms_thres: float = 0.4,
    capacity: int = 256,
    pool: Optional[int] = None,
    approx_topk: bool = False,
    return_count: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Batched merging NMS.

    Args:
      prediction: (B, N, 5+C) decoded rows ``(cx, cy, w, h, conf, cls...)``.
      capacity: max detections *returned* per image (fixed shape).
      pool: candidate rows that participate in suppression/merging
        (default = ``capacity``).  The reference loop is uncapped: when more
        than ``capacity`` boxes pass ``conf_thres``, dropped low-score boxes
        would no longer suppress or contribute to the confidence-weighted
        merge.  A ``pool`` larger than ``capacity`` keeps those boxes in the
        game while the returned shape stays (B, capacity, 7) — keepers past
        ``capacity`` are truncated (score order, lowest first to go).
      return_count: also return ``n_candidates`` (B,) int32 — how many rows
        passed ``conf_thres`` per image, computed inside the compiled
        program for ~free.  ``n_candidates > pool`` means the fixed-capacity
        trade actually dropped candidates on this image (the reference loop
        is uncapped) — callers surface it instead of silently depressing
        mAP (``evaluate``/``Detector`` overflow accounting).
      approx_topk: use TPU ``lax.approx_max_k`` (single-pass PartialReduce)
        instead of exact ``lax.top_k`` (multi-pass sort) to select the
        candidate pool — measured ~0.4 ms/batch-16 saving.  Know what you
        are opting into (``fastpath_gate_final/gate_summary.json``, 200
        real prospective images at the reference operating point): mAP@0.5
        is neutral (0.5987 vs 0.5981 exact) and 178/200 images are
        box-for-box identical, but on the other 22 a *different candidate*
        can enter the pool near the k-th score and survive NMS — per-image
        output can gain/lose whole detections (723 → 716 total;
        max matched-box coordinate delta 780 px because a different
        detection appears, not because a box drifts).  Per-image
        reproducibility vs the exact pool is NOT guaranteed; aggregate
        accuracy is.  Non-parity fast path; default off.

    Returns:
      ``(dets, valid)`` with ``dets`` (B, capacity, 7) rows
      ``(x1, y1, x2, y2, conf, cls_conf, cls_pred)`` and ``valid``
      (B, capacity) bool — rows are keepers in score order; plus
      ``n_candidates`` (B,) int32 when ``return_count``.
    """
    dets, valid = jax.vmap(
        lambda p: _nms_single(p, conf_thres, nms_thres, capacity,
                              pool or capacity, approx_topk)
    )(prediction)
    if return_count:
        n_candidates = jnp.sum(prediction[:, :, 4] >= conf_thres,
                               axis=1).astype(jnp.int32)
        return dets, valid, n_candidates
    return dets, valid


def _nms_single(pred, conf_thres, nms_thres, capacity, pool,
                approx_topk=False):
    """Greedy merging NMS in parallel form.

    The greedy loop's *decisions* depend only on the original (pre-merge)
    coordinates: a kept box's merged coordinates never feed later IoU tests
    (the reference computes ``large_overlap`` against row 0's original
    coords before overwriting them, ``utils/utils.py:261-267``).  So the
    sequential part reduces to the keep/suppress recurrence over the
    score-sorted suppression matrix — a K-step scan of two boolean vector
    ops — and cluster assignment + confidence-weighted merging vectorize
    completely (each suppressed box belongs to the FIRST keeper that
    overlaps it, which is exactly the greedy cluster).
    """
    boxes = xywh2xyxy(pred[:, :4])
    conf = pred[:, 4]
    cls_probs = pred[:, 5:]
    cls_conf = jnp.max(cls_probs, axis=-1)
    cls_pred = jnp.argmax(cls_probs, axis=-1).astype(jnp.float32)

    passed = conf >= conf_thres
    score = jnp.where(passed, conf * cls_conf, -jnp.inf)
    k = min(pool, score.shape[0])
    if approx_topk:
        # TPU PartialReduce; aggregate_to_topk sorts the reduced set, so
        # the downstream score-order contract is unchanged
        top_scores, top_idx = jax.lax.approx_max_k(score, k)
        top_idx = top_idx.astype(jnp.int32)
    else:
        top_scores, top_idx = jax.lax.top_k(score, k)

    det = jnp.concatenate(
        [
            boxes[top_idx],
            conf[top_idx, None],
            cls_conf[top_idx, None],
            cls_pred[top_idx, None],
        ],
        axis=-1,
    )  # (k, 7)
    if k < pool:
        det = jnp.pad(det, ((0, pool - k), (0, 0)))
        top_scores = jnp.pad(top_scores, (0, pool - k), constant_values=-jnp.inf)
    return _suppress_merge(det, top_scores, nms_thres, capacity, pool)


@functools.partial(jax.jit, static_argnames=("nms_thres", "capacity"))
def non_max_suppression_pooled(
    det: jnp.ndarray,
    top_scores: jnp.ndarray,
    nms_thres: float = 0.4,
    capacity: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merging NMS over a pre-selected candidate pool.

    The suppression/merge stage of :func:`non_max_suppression` for callers
    that build the ``(B, pool, 7)`` candidate rows themselves — e.g. the
    fused score→top-k→sparse-decode path
    (:func:`amyloid_yolo_tpu.models.heads.decode_topk`), which avoids ever
    materializing the dense ``(B, N, 7)`` decode.  ``det`` rows are
    ``(x1, y1, x2, y2, conf, cls_conf, cls_pred)`` in descending
    ``top_scores`` order; rows with ``top_scores == -inf`` are padding.
    """
    pool = det.shape[1]
    return jax.vmap(
        lambda d, s: _suppress_merge(d, s, nms_thres, capacity, pool)
    )(det, top_scores)


def _suppress_merge(det, top_scores, nms_thres, capacity, pool):
    """Greedy keep/suppress + confidence-weighted merge over sorted rows."""
    active0 = top_scores > -jnp.inf

    # potential-suppression matrix over score order (diagonal included)
    ious = bbox_iou(det[:, None, :4], det[None, :, :4])  # (P, P)
    m = (ious > nms_thres) & (det[:, None, 6] == det[None, :, 6])
    m = m & active0[:, None] & active0[None, :]

    def body(suppressed, i):
        is_keep = active0[i] & ~suppressed[i]
        suppressed = suppressed | (m[i] & is_keep)
        return suppressed, is_keep

    _, keep = jax.lax.scan(body, jnp.zeros((pool,), jnp.bool_),
                           jnp.arange(pool))

    # cluster owner of each row = first keeper whose row suppresses it
    keeper_m = keep[:, None] & m                       # (P, P)
    owner = jnp.argmax(keeper_m, axis=0)               # first-True index
    member = jnp.any(keeper_m, axis=0) & active0

    w = jnp.where(member, det[:, 4], 0.0)
    wsum = jax.ops.segment_sum(w, owner, num_segments=pool)
    wbox = jax.ops.segment_sum(w[:, None] * det[:, :4], owner,
                               num_segments=pool)
    merged = wbox / jnp.maximum(wsum, 1e-30)[:, None]

    out = jnp.concatenate([jnp.where(keep[:, None], merged, 0.0),
                           jnp.where(keep[:, None], det[:, 4:], 0.0)], axis=-1)
    if pool == capacity:
        return out, keep
    # compact keepers (already in score order) into the first `capacity` rows
    dest = jnp.where(keep, jnp.cumsum(keep) - 1, pool)  # pool = out of range
    compact = jnp.zeros((capacity, 7), out.dtype).at[dest].set(out, mode="drop")
    n_keep = jnp.sum(keep)
    valid = jnp.arange(capacity) < n_keep
    return compact, valid


def non_max_suppression_np(
    prediction: np.ndarray, conf_thres: float = 0.5, nms_thres: float = 0.4
) -> List[Optional[np.ndarray]]:
    """Host-side ragged mirror of the reference loop (``utils/utils.py:235-273``).

    Returns a list (len B) of ``(n_i, 7)`` arrays or ``None`` — the
    reference's exact output contract, for drop-in use by host pipelines.
    """
    prediction = np.array(prediction, copy=True)
    prediction[..., :4] = xywh2xyxy_np(prediction[..., :4])
    output: List[Optional[np.ndarray]] = [None] * len(prediction)
    for i, image_pred in enumerate(prediction):
        image_pred = image_pred[image_pred[:, 4] >= conf_thres]
        if image_pred.shape[0] == 0:
            continue
        score = image_pred[:, 4] * image_pred[:, 5:].max(1)
        image_pred = image_pred[(-score).argsort()]
        cls_confs = image_pred[:, 5:].max(1, keepdims=True)
        cls_preds = image_pred[:, 5:].argmax(1)[:, None].astype(image_pred.dtype)
        detections = np.concatenate([image_pred[:, :5], cls_confs, cls_preds], 1)
        keep = []
        while detections.shape[0]:
            ious = bbox_iou_np(detections[0:1, :4], detections[:, :4])
            invalid = (ious > nms_thres) & (detections[0, -1] == detections[:, -1])
            weights = detections[invalid, 4:5]
            merged = detections[0].copy()
            merged[:4] = (weights * detections[invalid, :4]).sum(0) / weights.sum()
            keep.append(merged)
            detections = detections[~invalid]
        if keep:
            output[i] = np.stack(keep)
    return output


def dense_to_ragged(dets: np.ndarray, valid: np.ndarray) -> List[Optional[np.ndarray]]:
    """Convert the fixed-capacity device output to the reference's ragged list."""
    out: List[Optional[np.ndarray]] = []
    for d, v in zip(np.asarray(dets), np.asarray(valid)):
        rows = d[v]
        out.append(rows if rows.shape[0] else None)
    return out


__all__ = ["non_max_suppression", "non_max_suppression_pooled",
           "non_max_suppression_np", "dense_to_ragged"]
