"""Domain layer: study metrics, CAA filtering, weak labels, visualization.

Equivalents of the reference's ``core.py`` surface (SURVEY §2 components
19-24, 36-37), re-based on the framework's batched device ops:

* :func:`iou_xyxy` / :func:`get_accuracy` / :func:`get_tps` — the study
  metrics (``core.py:497-571``), host Python by design (offline analysis);
* :class:`CAAFilter` — ``filterDetectionsByCAAModel`` (``core.py:425-452``)
  with the per-image model reload and per-box cv2 crops replaced by one
  resident JAX classifier and a single batched device call per tile;
* :func:`write_caa_detections` — ``writeCAADetectionsToPickle``
  (``core.py:454-480``) including its center-coordinate quirk (centers are
  computed as (x2-x1)/2 — box-relative, not absolute — reproduced as-is);
* :func:`pre_process` — weak-label map construction (``core.py:25-78``);
* :func:`filter_map_to_get_cored_or_caa` (``core.py:223-246``);
* :func:`draw_bboxes` — PIL-based box rendering replacing cv2
  (``core.py:602-633``);
* :func:`device_memory_stats` — TPU-side replacement for the
  ``nvidia-smi`` subprocess (``core.py:482-495``).
"""

from __future__ import annotations

import os
import pickle
import shutil
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .models import classifier
from .ops.preprocess import crop256_window


# ---------------------------------------------------------------------------
# Study metrics (core.py:497-571)
# ---------------------------------------------------------------------------

def iou_xyxy(boxA: Sequence[float], boxB: Sequence[float]) -> float:
    """Scalar IoU, +1-pixel convention (parity ``core.py:497-518``)."""
    xA = max(boxA[0], boxB[0])
    yA = max(boxA[1], boxB[1])
    xB = min(boxA[2], boxB[2])
    yB = min(boxA[3], boxB[3])
    inter = max(0, xB - xA + 1) * max(0, yB - yA + 1)
    areaA = (boxA[2] - boxA[0] + 1) * (boxA[3] - boxA[1] + 1)
    areaB = (boxB[2] - boxB[0] + 1) * (boxB[3] - boxB[1] + 1)
    return inter / float(areaA + areaB - inter)


# reference-spelling alias
IOU = iou_xyxy


def get_accuracy(l1: Sequence, l2: Sequence) -> float:
    """Elementwise match rate of two equal-length lists (``core.py:520-525``)."""
    assert len(l1) == len(l2)
    return sum(1 for a, b in zip(l1, l2) if a == b) / float(len(l1))


def get_tps(predictions: Sequence[Sequence[float]], labels: Sequence[Sequence[float]],
            iou_threshold: float, pascal_voc_scheme: bool = True) -> List[int]:
    """TP flags per prediction (``getTPs``, ``core.py:527-571``).

    Predictions ``[x1, y1, x2, y2, conf, cls_conf, cls_pred]``, labels
    ``[x1, y1, x2, y2, class]``; class is the last index of each.  Sorted by
    confidence descending; under the Pascal-VOC-2012 scheme each label can
    justify at most one TP.

    Tie order quirk preserved: the reference sorts ascending then reverses
    (``core.py:543-546``), so equal-confidence predictions are visited in
    *reversed* original order — the later row gets first claim on a label.
    """
    order = sorted(range(len(predictions)), key=lambda k: predictions[k][4])
    order.reverse()
    tp_labels: List = []
    flag_by_index: Dict[int, int] = {}
    for oi in order:
        prediction = predictions[oi]
        is_tp = False
        for label in labels:
            if label[-1] != prediction[-1]:
                continue
            if pascal_voc_scheme and _in(label, tp_labels):
                continue
            if iou_xyxy(prediction[0:4], label[0:4]) >= iou_threshold:
                is_tp = True
                tp_labels.append(label)
                break
        flag_by_index[oi] = 1 if is_tp else 0
    return [flag_by_index[i] for i in range(len(predictions))]


def _in(item, seq) -> bool:
    return any(item is x or item == x for x in seq)


# ---------------------------------------------------------------------------
# CAA filter (core.py:425-480)
# ---------------------------------------------------------------------------

class CAAFilter:
    """Consensus-of-2 model filter for CAA detections.

    Invariant (tested, parity with ``unit_test.py:243-288``): Cored
    detections are never touched; a CAA detection survives iff the
    classifier's CAA probability exceeds 0.5.

    Unlike the reference — which reloads the pickled torch model from disk
    for EVERY image and runs one forward per box (``core.py:432-444``) —
    the classifier lives on device and all crops of a tile run as one batch.
    """

    #: class-name list convention: index 0 = CAA, 1 = Cored
    #: (``data/custom/classes.names`` — cls_pred 1 is Cored, core.py:368)

    def __init__(self, params=None, mean=None, std=None,
                 classes: Sequence[str] = ("CAA", "Cored"),
                 model_pickle: Optional[str] = None,
                 normalization: Optional[str] = None):
        import jax

        if params is None:
            if model_pickle is not None and os.path.exists(model_pickle):
                params = classifier.from_torch_pickle(model_pickle)
            else:
                params = classifier.init_params(jax.random.PRNGKey(0))
        self.params = params
        if mean is None or std is None:
            mean, std = classifier.load_normalization(normalization)
        self.mean = mean
        self.std = std
        self.classes = list(classes)
        self._predict = jax.jit(
            lambda p, x: classifier.predict_probs(p, x)
        )

    #: crop batches are padded up to these sizes so the classifier compiles
    #: a handful of programs instead of one per distinct detection count
    CROP_BUCKETS = (8, 32, 128)

    def predict_crops(self, crops_u8: np.ndarray) -> np.ndarray:
        """(K, 256, 256, 3) uint8 RGB → (K, 3) sigmoid probabilities."""
        import jax.numpy as jnp

        k = crops_u8.shape[0]
        bucket = next((b for b in self.CROP_BUCKETS if b >= k), None)
        if bucket is not None and bucket != k:
            pad = np.zeros((bucket - k,) + crops_u8.shape[1:], crops_u8.dtype)
            crops_u8 = np.concatenate([crops_u8, pad], axis=0)
        x = jnp.asarray(crops_u8).astype(jnp.float32) / 255.0
        x = (x - self.mean[None, None, None, :]) / self.std[None, None, None, :]
        return np.asarray(self._predict(self.params, x))[:k]

    def __call__(self, img: np.ndarray, detections: np.ndarray) -> np.ndarray:
        """Filter (N, 7) detections against the 1536² RGB uint8 ``img``."""
        dets = np.asarray(detections)
        if dets.shape[0] == 0:
            return dets
        crops = np.stack([
            _crop(img, row) for row in dets
        ])
        probs = self.predict_crops(crops)
        keep = []
        for row, p in zip(dets, probs):
            if self.classes[int(row[6])] == "CAA" and p[2] <= 0.5:
                continue
            keep.append(row)
        return np.asarray(keep, dets.dtype) if keep else np.zeros((0, 7), dets.dtype)

    def filter_path(self, img_path: str, detections: np.ndarray) -> np.ndarray:
        if len(np.asarray(detections)) == 0:
            return np.asarray(detections)
        img = None
        if img_path.lower().endswith((".jpg", ".jpeg")):
            try:  # native decoder when built (faster than PIL)
                from .io.native import decode_one

                img = decode_one(img_path, 1536, 1536)
            except Exception:
                img = None
        if img is None:
            from .io.datasets import load_image_rgb

            img = load_image_rgb(img_path)
        return self(img, detections)


def _crop(img: np.ndarray, row: np.ndarray) -> np.ndarray:
    x1, y1, x2, y2 = row[:4]
    x0, y0 = crop256_window((int(x1), int(y1), int(x2 - x1), int(y2 - y1)))
    crop = img[y0:y0 + 256, x0:x0 + 256]
    if crop.shape[:2] != (256, 256):  # tiles smaller than 1536 at WSI borders
        out = np.zeros((256, 256, 3), img.dtype)
        out[:crop.shape[0], :crop.shape[1]] = crop
        crop = out
    return crop


def write_caa_detections(pickle_path: str, img_name: str, detections: np.ndarray,
                         classes: Sequence[str] = ("CAA", "Cored")) -> None:
    """Append CAA detections to a pickle (``core.py:454-480``), preserving
    the reference's label-space output quirks (center computed from box size
    alone, width/height in pixels)."""
    store: Dict[str, list] = {}
    if os.path.exists(pickle_path):
        with open(pickle_path, "rb") as fh:
            store = pickle.load(fh)
    img_name = img_name[img_name.rfind("/") + 1:]
    new_rows = []
    for x1, y1, x2, y2, conf, cls_conf, cls_pred in np.asarray(detections):
        if classes[int(cls_pred)] != "CAA":
            continue
        x_center = (int(x2) - int(x1)) / 2.0
        y_center = (int(y2) - int(y1)) / 2.0
        width = int(x2) - int(x1)
        height = int(y2) - int(y1)
        new_rows.append((0, x_center, y_center, width, height))
    store[img_name] = store.get(img_name, []) + new_rows
    with open(pickle_path, "wb") as fh:
        pickle.dump(store, fh)


# ---------------------------------------------------------------------------
# Weak-label preprocessing (core.py:25-78, 223-246)
# ---------------------------------------------------------------------------

def pre_process(image_details_csv: str, consensus_csv: str,
                images_dir: str = "data/custom/images/",
                weak_label: bool = False,
                caa_filter: Optional[CAAFilter] = None) -> Dict[str, list]:
    """Build {1536-image name: [(bbox, (cored, diffuse, CAA)), ...]}.

    Human annotations (strict consensus-of-2 CSV) take precedence; with
    ``weak_label=True``, unannotated boxes get classifier predictions
    (``core.py:25-78``).  pandas-based like the reference, import deferred.
    """
    import pandas as pd

    consensus = pd.read_csv(consensus_csv)
    mapp: Dict[str, tuple] = {}
    for _, row in consensus.iterrows():
        full = row["imagename"]
        img_name = full[full.find("/") + 1:]
        mapp[img_name] = (int(row["cored"]), int(row["diffuse"]), int(row["CAA"]))

    df = pd.read_csv(image_details_csv)
    final_mapp: Dict[str, list] = {}
    from .io.datasets import load_image_rgb

    for _, row in df.iterrows():
        img_path_1536 = (images_dir + row["source"] + "_0_" + str(row["tile_row"])
                         + "_" + str(row["tile_column"]) + ".jpg")
        bbox_coord = row["blob coordinates (xywh)"]
        bbox_coord = bbox_coord.replace("[", "").replace("]", "").split(" ")
        bbox_coord = [int(x) for x in bbox_coord if x != ""]
        if row["imagename"] in mapp:
            label = mapp[row["imagename"]]
        elif weak_label and caa_filter is not None:
            img = load_image_rgb(img_path_1536)
            crop = _crop(img, np.array(bbox_coord[:2] + [
                bbox_coord[0] + bbox_coord[2], bbox_coord[1] + bbox_coord[3],
            ], float))
            probs = caa_filter.predict_crops(crop[None])[0]
            label = tuple(float(p) for p in probs)
        else:
            continue
        final_mapp.setdefault(img_path_1536, []).append((bbox_coord, label))
    return final_mapp


def filter_map_to_get_cored_or_caa(mapp: Dict[str, list], just_CAA: bool = False,
                                   just_Cored: bool = False) -> Dict[str, list]:
    """Parity ``core.py:223-246``."""
    new_mapp = {}
    for img, pairs in mapp.items():
        for _, preds in pairs:
            has_cored = preds[0] >= 0.5
            has_caa = preds[2] >= 0.5
            if just_CAA == just_Cored:
                if has_cored or has_caa:
                    new_mapp[img] = pairs
                    break
            elif just_CAA and has_caa:
                new_mapp[img] = pairs
                break
            elif just_Cored and has_cored:
                new_mapp[img] = pairs
                break
    return new_mapp


# ---------------------------------------------------------------------------
# Visualization (core.py:602-633) — PIL instead of cv2 (cv2 not required)
# ---------------------------------------------------------------------------

def draw_bboxes(img: np.ndarray, bbox_class_preds, color_by_class: bool = False) -> np.ndarray:
    """Draw (bbox_xywh, (cored, diffuse, CAA)) entries; returns RGB array.

    Priority/labeling parity with ``drawBBox`` (``core.py:602-633``):
    entries with neither cored nor CAA ≥ 0.5 are skipped; color-by-class
    gives CAA blue and Cored red (the reference's BGR constants, as RGB).
    """
    from PIL import Image, ImageDraw

    im = Image.fromarray(np.ascontiguousarray(img))
    d = ImageDraw.Draw(im)
    for bbox, preds in bbox_class_preds:
        if preds[2] < 0.5 and preds[0] < 0.5:
            continue
        color = (0, 0, 0)
        if color_by_class:
            if preds[2] >= 0.5:
                color = (0, 0, 255)
            if preds[0] >= 0.5:
                color = (255, 0, 0)
        x1, y1 = bbox[0], bbox[1]
        x2, y2 = bbox[0] + bbox[2], bbox[1] + bbox[3]
        d.rectangle([x1, y1, x2, y2], outline=color, width=2)
        if preds[2] >= 0.5 and preds[0] >= 0.5:
            text = "Cored and CAA"
        elif preds[2] >= 0.5:
            text = "CAA"
        else:
            text = "Cored"
        d.text((x1, max(0, y1 - 12)), text, fill=(0, 0, 0))
    return np.asarray(im)


def draw_detections(img: np.ndarray, detections: np.ndarray,
                    classes: Sequence[str] = ("CAA", "Cored")) -> np.ndarray:
    """Render (N, 7) detection rows with class-colored boxes."""
    from PIL import Image, ImageDraw

    im = Image.fromarray(np.ascontiguousarray(img))
    d = ImageDraw.Draw(im)
    palette = {"CAA": (0, 0, 255), "Cored": (255, 0, 0)}
    for x1, y1, x2, y2, conf, cls_conf, cls_pred in np.asarray(detections):
        name = classes[int(cls_pred)]
        d.rectangle([x1, y1, x2, y2], outline=palette.get(name, (0, 0, 0)), width=2)
        d.text((x1, max(0, y1 - 12)), f"{name} {conf:.2f}", fill=palette.get(name))
    return np.asarray(im)


# ---------------------------------------------------------------------------
# Misc (core.py:482-495, clear.py)
# ---------------------------------------------------------------------------

def seed_folder_from_list(list_path: str, dest_dir: str) -> None:
    """Copy the images named in a train/valid list into a flat folder
    (``seedTestFolder``/``seedTrainFolder``, ``core.py:80-106`` — the
    reference defines both twice; one parameterized function here)."""
    if os.path.isdir(dest_dir):
        shutil.rmtree(dest_dir)
    os.makedirs(dest_dir)
    with open(list_path) as fh:
        for line in fh.read().splitlines():
            line = line.strip()
            if not line:
                continue
            shutil.copy(line, os.path.join(dest_dir, os.path.basename(line)))


def compare_premerge_with_postmerge(premerge: Dict[str, list],
                                    postmerge: Dict[str, list],
                                    output_dir: str = "output",
                                    sample_size: int = 100,
                                    seed: int = 0) -> None:
    """Render pre- vs post-merge label maps side by side
    (``comparePreMergeLabelsWithPostMerge``, ``core.py:573-600``):
    CAA-containing images only, boxes drawn uncolored."""
    import random as _random

    from PIL import Image

    from .io.datasets import load_image_rgb

    assert set(premerge.keys()) == set(postmerge.keys())
    pre = filter_map_to_get_cored_or_caa(premerge, just_CAA=True)
    post = filter_map_to_get_cored_or_caa(postmerge, just_CAA=True)
    images = list(pre.keys())
    _random.Random(seed).shuffle(images)
    images = images[:sample_size]
    for mapp, l_type in [(pre, "premerge"), (post, "postmerge")]:
        save_dir = os.path.join(output_dir, l_type)
        os.makedirs(save_dir, exist_ok=True)
        for img_name in images:
            if img_name not in mapp:
                continue
            img = load_image_rgb(img_name)
            annotated = draw_bboxes(img, mapp[img_name], color_by_class=False)
            save_name = l_type + "_" + img_name.replace("/", "_")
            Image.fromarray(annotated).save(os.path.join(save_dir, save_name))


def wsis_with_most_caas(counts_pickle: str, n: int = 12) -> List[str]:
    """Top-N WSIs by CAA count from a plaque-counts pickle.

    The reference *calls* ``getWSIsWithMostCAAs(n=12)``
    (``validation.py:79``) but never defines it anywhere in the repo — a
    latent NameError on its "lise dataset" path; this is the working
    implementation of the evident intent.
    """
    with open(counts_pickle, "rb") as fh:
        counts = pickle.load(fh)
    ranked = sorted(counts.items(), key=lambda kv: kv[1].get("CAA", 0),
                    reverse=True)
    return [wsi for wsi, _ in ranked[:n]]


def device_memory_stats() -> Dict[int, Dict[str, int]]:
    """Per-device memory stats via JAX — the TPU-native ``nvidia-smi``
    replacement (``core.py:482-495``)."""
    import jax

    out = {}
    for i, dev in enumerate(jax.devices()):
        try:
            stats = dev.memory_stats() or {}
        except Exception:
            stats = {}
        out[i] = {
            "bytes_in_use": int(stats.get("bytes_in_use", 0)),
            "bytes_limit": int(stats.get("bytes_limit", 0)),
        }
    return out


def clear_output_dir(path: str = "output/") -> None:
    """``clear.py`` equivalent: reset an output directory."""
    if os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)


__all__ = [
    "iou_xyxy", "IOU", "get_accuracy", "get_tps", "CAAFilter",
    "write_caa_detections", "pre_process", "filter_map_to_get_cored_or_caa",
    "draw_bboxes", "draw_detections", "device_memory_stats", "clear_output_dir",
    "seed_folder_from_list", "compare_premerge_with_postmerge",
    "wsis_with_most_caas",
]
