"""Validation-set mAP evaluation (the reference's ``test.py evaluate``).

Parity with ``test.py:24-66``: ListDataset without augmentation or
multiscale, forward + merging NMS at the given thresholds, greedy TP
matching per batch, then per-class P/R/AP/F1 via ``ap_per_class``.  The
model forward + decode + NMS run as one jitted device program; only the
ragged TP bookkeeping is host numpy (it is offline analysis, SURVEY §7).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .graphspec import GraphSpec
from .io.datasets import ListDataset
from .models import darknet, heads
from .ops import nms as nms_ops
from .ops.boxes import xywh2xyxy_np
from .ops.metrics import ap_per_class, get_batch_statistics
from .ops.preprocess import resize_nearest
from .utils.memo import memoized_program

import functools
import jax


# Memoize built eval fns: a fresh closure per evaluate() call would
# recompile the full model on EVERY eval epoch (measured: ~50-100 s/epoch
# through the remote-compile relay — the dominant cost of a training run,
# 20-50x the train step itself).  Policy lives in utils.memo (shared with
# parallel.spatial).
_EVAL_FN_CACHE: dict = {}
_EVAL_FN_CACHE_MAX = 8


def make_eval_fn(spec: GraphSpec, conf_thres: float, nms_thres: float,
                 capacity: int = 128, compute_dtype=jnp.float32):
    key = (id(spec), float(conf_thres), float(nms_thres), int(capacity),
           jnp.dtype(compute_dtype).name)

    def build():
        @functools.partial(jax.jit, static_argnames=("img_size",))
        def fwd(params, images_u8, img_size: int):
            x = resize_nearest(images_u8, img_size).astype(jnp.float32) / 255.0
            maps, _ = darknet.apply(params, spec, x, compute_dtype=compute_dtype)
            pred = heads.decode_all(maps, spec, img_size)
            return nms_ops.non_max_suppression(pred, conf_thres, nms_thres,
                                               capacity, return_count=True)
        return fwd

    return memoized_program(_EVAL_FN_CACHE, _EVAL_FN_CACHE_MAX, key,
                            (spec,), build)


def evaluate(
    spec: GraphSpec,
    params,
    path: str,
    iou_thres: float = 0.5,
    conf_thres: float = 0.5,
    nms_thres: float = 0.5,
    img_size: int = 416,
    batch_size: int = 8,
    compute_dtype=jnp.float32,
    nms_capacity: int = 128,
    dataset: Optional[ListDataset] = None,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Returns (precision, recall, AP, f1, ap_class) or None (no detections).

    If any image has more conf-passing candidates than ``nms_capacity`` —
    the fixed device-NMS pool, vs the reference's uncapped host loop — a
    ``UserWarning`` reports the image count: truncation depresses mAP
    silently otherwise.  Raise ``nms_capacity`` until the warning stops for
    exact parity on dense validation sets.

    ``dataset`` lets a caller that evaluates repeatedly (the Trainer, every
    epoch) reuse one ListDataset — with ``cache_images=True`` that skips
    re-decoding the validation JPEGs each epoch.
    """
    if dataset is None:
        dataset = ListDataset(path, img_size=img_size, multiscale=False,
                              augment=False)
    fwd = make_eval_fn(spec, conf_thres, nms_thres, capacity=nms_capacity,
                       compute_dtype=compute_dtype)

    labels: list = []
    sample_metrics: list = []
    overflow_images = 0
    n_images = 0
    for batch in dataset.iter_epoch(batch_size, shuffle=False):
        imgs = batch["images"]
        targets = batch["targets"][batch["target_mask"]]
        labels += targets[:, 1].tolist()
        # normalized xywh -> model-input-pixel xyxy (test.py:50-51)
        t = targets.copy()
        t[:, 2:] = xywh2xyxy_np(t[:, 2:]) * img_size
        if imgs.shape[0] < batch_size:  # pad tail batch for shape stability
            pad = batch_size - imgs.shape[0]
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, 0)])
        dets, valid, n_cand = fwd(params, jnp.asarray(imgs), img_size)
        ragged = nms_ops.dense_to_ragged(dets, valid)[: len(batch["paths"])]
        n_real = len(batch["paths"])
        overflow_images += int((np.asarray(n_cand)[:n_real] > nms_capacity).sum())
        n_images += n_real
        sample_metrics += get_batch_statistics(ragged, t, iou_thres)
    if overflow_images:
        import warnings

        warnings.warn(
            f"evaluate: {overflow_images}/{n_images} images had more than "
            f"nms_capacity={nms_capacity} conf-passing candidates — the "
            f"device NMS pool truncated them and mAP is depressed vs the "
            f"reference's uncapped NMS.  Re-run with a larger nms_capacity.",
            UserWarning, stacklevel=2)
    if len(sample_metrics) == 0:
        return None
    tp, scores, pred_labels = [np.concatenate(x, 0) for x in zip(*sample_metrics)]
    return ap_per_class(tp, scores, pred_labels, labels)


__all__ = ["evaluate", "make_eval_fn"]
