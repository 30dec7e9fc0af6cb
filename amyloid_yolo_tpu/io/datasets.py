"""Host-side datasets: folder inference streams and YOLO-txt training lists.

Functional parity with ``utils/datasets.py``:

* :class:`ImageFolder` — sorted glob over a folder, RGB uint8 tiles
  (``utils/datasets.py:40-62``);
* :class:`ListDataset` — image list file + ``images→labels`` / ``.jpg→.txt``
  label-path derivation, YOLO-format normalized ``(cls cx cy w h)`` labels,
  corrupt-sample dropping, and the multiscale schedule (a new model input
  size from ``[img_size−96, img_size+96]`` step 32 every 10 batches —
  ``utils/datasets.py:123-143``).

TPU-first differences: images stay **uint8 at tile resolution** on the host;
letterbox/resize/normalize/augmentation happen on device inside the jitted
step (see :mod:`amyloid_yolo_tpu.ops.preprocess` / ``ops.augment``), so the
host does no per-pixel float work and batches ship as uint8.  Ragged labels
are padded to a fixed per-batch capacity with a validity mask instead of the
reference's ragged concatenated tensor.  A background prefetch thread
overlaps JPEG decode with device compute (the reference used DataLoader
worker processes).
"""

from __future__ import annotations

import glob
import os
import queue
import random
import threading
import warnings
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..ops.preprocess import pad_amounts

try:  # PIL is the baseline decoder; the C++ runtime (io.native) is preferred
    from PIL import Image, ImageFile

    ImageFile.LOAD_TRUNCATED_IMAGES = True
    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False


def load_image_rgb(path: str) -> np.ndarray:
    """Decode one image to HWC uint8 RGB."""
    if not _HAVE_PIL:  # pragma: no cover
        raise RuntimeError("PIL unavailable and no native decoder built")
    return np.array(Image.open(path).convert("RGB"), dtype=np.uint8)


def pad_to_square_np(img: np.ndarray, pad_value: int = 0) -> Tuple[np.ndarray, Tuple[int, int, int, int]]:
    """Host uint8 center pad; returns (img, (left, right, top, bottom))."""
    h, w = img.shape[:2]
    l, r, t, b = pad_amounts(h, w)
    if l or r or t or b:
        img = np.pad(img, ((t, b), (l, r), (0, 0)), constant_values=pad_value)
    return img, (l, r, t, b)


def _consume_prefetched(q: "queue.Queue", t: threading.Thread,
                        stop: threading.Event):
    """Yield items a producer thread puts on ``q`` (None = end,
    BaseException = re-raise), and on ANY exit — end-of-stream, consumer
    break, abandoned generator (GeneratorExit) — signal ``stop`` and drain
    until the producer has really finished.

    The drain is load-bearing, not hygiene: a consumer that abandons the
    generator early (``next(iter(...))``) would otherwise run cleanup while
    the producer is still inside native code — destroying the C++ TilePool
    mid-``decode_batch`` corrupts the heap (malloc "unaligned tcache chunk"
    abort, found driving `amyolo serve --calibration_folder`) — or leak one
    forever-blocked ``q.put`` thread per abandoned epoch.
    """
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        while t.is_alive():
            try:
                q.get(timeout=0.05)
            except queue.Empty:
                pass


class ImageFolder:
    """Sorted folder of images, yielded as fixed-size uint8 batches.

    ``iter_batches`` pads the last batch by repeating its final image (the
    per-row validity count is returned) so every device step sees one static
    shape — no recompiles, no ragged tails.
    """

    def __init__(self, folder_path: str, tile_size: Optional[int] = None,
                 resize_to: Optional[int] = None, fast_decode: bool = False):
        self.files: List[str] = sorted(glob.glob(os.path.join(folder_path, "*.*")))
        self.tile_size = tile_size
        #: original (h, w) per path, filled as images load — consumers map
        #: detections back to original pixel space for non-standard tiles
        #: (WSI border tiles; reference rescale_boxes is per-image)
        self.orig_shapes: dict = {}
        # fast_decode: native path decodes at 1/2 DCT scale when the gather
        # target allows it (1536→416: decode 768, ~4x less IDCT) — pixels
        # are the scaled rendition, NOT bit-identical; opt-in
        self.fast_decode = fast_decode
        # host-side nearest downsample (identical gather to the device
        # resize) — shrinks host→device transfer ~13x for 1536→416; applied
        # in the prefetch thread so it overlaps device compute
        self.resize_to = resize_to
        self._ridx = None
        if resize_to is not None and tile_size is not None:
            from ..ops.preprocess import nearest_indices

            self._ridx = nearest_indices(resize_to, tile_size)

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, index: int) -> Tuple[str, np.ndarray]:
        path = self.files[index % len(self.files)]
        img = load_image_rgb(path)
        self.orig_shapes[path] = img.shape[:2]
        img, _ = pad_to_square_np(img)
        if self.tile_size is not None and img.shape[0] != self.tile_size:
            # non-standard tiles (WSI borders): the padded square fills the
            # whole tile frame, matching the reference where every image's
            # own square becomes the model input (utils/transforms Resize);
            # ops.boxes.rescale_from_tile_frame inverts this per image
            from ..ops.preprocess import nearest_indices

            idx = nearest_indices(self.tile_size, img.shape[0])
            img = np.ascontiguousarray(img[idx][:, idx])
        if self._ridx is not None:
            img = np.ascontiguousarray(img[self._ridx][:, self._ridx])
        return path, img

    def iter_batches(
        self, batch_size: int, prefetch: int = 2
    ) -> Iterator[Tuple[List[str], np.ndarray, int]]:
        """Yield (paths, uint8 batch NHWC, n_valid)."""

        native_pool = self._native_pool()
        if native_pool is not None:
            yield from self._iter_batches_native(native_pool, batch_size, prefetch)
            return

        def load_valid(i: int):
            """Corrupt/unreadable files are skipped with a warning (the
            drop-and-continue semantics of the reference's collate_fn,
            utils/datasets.py:127, extended to the inference path)."""
            try:
                return self[i]
            except Exception as e:
                print(f"Could not read image '{self.files[i % len(self.files)]}': {e}")
                return None

        stop = threading.Event()

        def produce(q: "queue.Queue"):
            try:
                pending = []
                for i in range(len(self.files)):
                    if stop.is_set():
                        break
                    item = load_valid(i)
                    if item is None:
                        continue
                    pending.append(item)
                    if len(pending) == batch_size:
                        q.put(self._pack(pending, batch_size))
                        pending = []
                if pending and not stop.is_set():
                    q.put(self._pack(pending, batch_size))
            except BaseException as e:  # propagate to consumer, don't die silently
                q.put(e)
            q.put(None)

        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        t = threading.Thread(target=produce, args=(q,), daemon=True)
        t.start()
        yield from _consume_prefetched(q, t, stop)

    def _native_pool(self):
        """Use the C++ decode pool when the folder is all-JPEG and a fixed
        tile size is declared (the WSI sweep case)."""
        if self.tile_size is None or not self.files:
            return None
        if not all(f.lower().endswith((".jpg", ".jpeg")) for f in self.files):
            return None
        try:
            from .native import TilePool, available

            if not available():
                return None
            return TilePool()
        except Exception:
            return None

    def _iter_batches_native(self, pool, batch_size: int, prefetch: int):
        resize = self.resize_to or 0
        denom = 1
        if self.fast_decode and resize and self.tile_size:
            # largest libjpeg power-of-2 scale whose decode is still >= the
            # gather target (1536 -> 416: denom 2, decode at 768)
            for d in (8, 4, 2):
                if self.tile_size % d == 0 and self.tile_size // d >= resize:
                    denom = d
                    break

        stop = threading.Event()

        def produce(q: "queue.Queue"):
            try:
                pending_paths: List[str] = list(self.files)
                start = 0
                while start < len(pending_paths) and not stop.is_set():
                    chunk = pending_paths[start:start + batch_size]
                    batch, ok, dims = pool.decode_batch(chunk, self.tile_size,
                                                        resize,
                                                        scale_denom=denom)
                    good = []
                    for i, p in enumerate(chunk):
                        if not ok[i]:
                            print(f"Could not read image '{p}' (native decoder).")
                            continue
                        h, w = int(dims[i, 0]), int(dims[i, 1])
                        self.orig_shapes[p] = (h, w)
                        if (h, w) != (self.tile_size, self.tile_size):
                            # WSI border tile: the native decoder zero-fills
                            # top-left; redo via the PIL path for the
                            # centered-pad + fill-the-frame geometry
                            _, img = self[start + i]
                            good.append((p, img))
                        else:
                            good.append((p, batch[i]))
                    start += batch_size
                    if good:
                        q.put(self._pack(good, batch_size))
            except BaseException as e:
                q.put(e)
            q.put(None)

        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        t = threading.Thread(target=produce, args=(q,), daemon=True)
        t.start()
        try:
            # _consume_prefetched's drain-join runs FIRST on close (inner
            # generator closes before this finally), so the pool is never
            # destroyed while the producer is inside decode_batch
            yield from _consume_prefetched(q, t, stop)
        finally:
            pool.close()

    @staticmethod
    def _pack(items, batch_size: int):
        n_valid = len(items)
        while len(items) < batch_size:
            items = items + [items[-1]]
        paths = [p for p, _ in items]
        batch = np.stack([im for _, im in items])
        return paths, batch, n_valid


class ListDataset:
    """Training dataset over a ``train.txt``-style list with YOLO labels."""

    def __init__(
        self,
        list_path: str,
        img_size: int = 416,
        multiscale: bool = True,
        max_objects: int = 100,
        augment: bool = True,
        seed: int = 0,
        cache_images: bool = False,
        host_resize: bool = False,
        native_side: Optional[int] = None,
    ):
        with open(list_path, "r") as fh:
            self.img_files = [ln.rstrip() for ln in fh.readlines() if ln.strip()]
        self.label_files = [
            p.replace("images", "labels").replace(".png", ".txt").replace(".jpg", ".txt")
            for p in self.img_files
        ]
        self.img_size = img_size
        self.max_objects = max_objects
        self.multiscale = multiscale
        self.min_size = img_size - 3 * 32
        self.max_size = img_size + 3 * 32
        self.augment = augment
        self.batch_count = 0
        # All randomness is DERIVED, never streamed from one stateful RNG:
        # the epoch shuffle seeds on (seed, epoch) and the multiscale size
        # is a pure function of the global batch index (size_for_count).
        # A shared stateful RNG would couple them through the prefetch
        # producer's read-ahead depth — a consumer that abandons an epoch
        # early (Trainer max_batches_per_epoch) would leave the RNG at a
        # timing-dependent state, silently desynchronizing the multi-host
        # "host-identical global shuffle" contract (iter_epoch) and breaking
        # seeded reproducibility single-host.
        self.seed = seed
        self._base_img_size = img_size
        self._epoch = 0
        self._planned_batches = 0
        # native_side: the dataset's uniform decoded+padded tile side, used
        # as the host-invariant fallback shape when an entire local batch
        # fails to read under collate(fixed_size=True).  Without it a fully
        # failed host would fall back to img_size, which (host_resize=False,
        # native tiles != img_size) mismatches the other hosts' batch shape
        # and aborts the collective.  Set it for distributed datasets whose
        # tiles are not img_size-sized; single-host and host_resize runs
        # never need it.
        self.native_side = native_side
        self._seen_side: Optional[int] = None
        # cache_images: keep each decoded, padded-square uint8 image (and
        # its normalized labels) in RAM after the first epoch — JPEG decode
        # is the host pipeline's dominant cost and the reference re-decodes
        # every epoch (utils/datasets.py:88).  Costs ~side²·3 bytes/image
        # (1536² tiles ≈ 7 MB each); sizes the set before enabling.
        # Randomness is unaffected: augmentation/multiscale happen later.
        self.cache_images = cache_images
        self._cache: dict = {}
        # host_resize: apply the nearest-neighbor resize to the multiscale
        # img_size on the host (uint8 gather) before transfer instead of on
        # device.  BIT-IDENTICAL samples: the train step's device resize is
        # the same index gather and becomes an identity pass-through
        # (augmentation already runs post-resize — documented divergence).
        # Shrinks host→device traffic ~13x (1536²→416²); enable when the
        # host link is thin, skip on fat PCIe (costs host CPU).
        self.host_resize = host_resize

    def __len__(self) -> int:
        return len(self.img_files)

    def __getitem__(self, index: int):
        """Returns (path, square uint8 HWC image, (n,5) normalized labels)
        or None on any read/parse failure (dropped at collate — parity with
        ``utils/datasets.py:88-127``)."""
        index = index % len(self.img_files)
        if self.cache_images and index in self._cache:
            return self._cache[index]
        img_path = self.img_files[index]
        try:
            img = load_image_rgb(img_path)
        except Exception:
            # Never cache failures: a transient I/O hiccup must retry next
            # epoch like the uncached path (the reference re-reads every
            # epoch, ``utils/datasets.py:88-127``).
            print(f"Could not read image '{img_path}'.")
            return None
        label_path = self.label_files[index]
        try:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                boxes = np.loadtxt(label_path).reshape(-1, 5).astype(np.float32)
        except Exception:
            print(f"Could not read label '{label_path}'.")
            return None
        h, w = img.shape[:2]
        # absolute coords -> pad -> renormalize (transforms.py:56-86 chain)
        boxes = boxes.copy()
        boxes[:, 1] *= w
        boxes[:, 3] *= w
        boxes[:, 2] *= h
        boxes[:, 4] *= h
        img, (pl, pr, pt, pb) = pad_to_square_np(img)
        side = img.shape[0]
        boxes[:, 1] = (boxes[:, 1] + pl) / side
        boxes[:, 2] = (boxes[:, 2] + pt) / side
        boxes[:, 3] = boxes[:, 3] / side
        boxes[:, 4] = boxes[:, 4] / side
        item = (img_path, img, boxes)
        self._seen_side = img.shape[0]
        if self.cache_images:
            self._cache[index] = item
        return item

    def probe_native_side(self) -> Optional[int]:
        """Set :attr:`native_side` from the first readable image HEADER
        (PIL reads dimensions without decoding pixels — ~µs/file).

        Distributed trainers (``host_resize=False``) call this so the
        all-samples-failed collate fallback is derived from the dataset
        itself rather than ``img_size`` — a host whose whole local batch
        fails to decode then still emits a batch with the other hosts'
        native padded-square side instead of aborting the collective with
        a shape mismatch."""
        if self.native_side is None:
            from PIL import Image

            for p in self.img_files:
                try:
                    with Image.open(p) as im:
                        self.native_side = int(max(im.size))
                    break
                except Exception:
                    continue
        return self.native_side

    def size_for_count(self, count: int) -> int:
        """Multiscale size for global batch ``count`` (1-based, cumulative
        across epochs) — a PURE function, so the schedule is identical on
        every host and immune to producer read-ahead depth.  Semantics match
        the reference stream (``utils/datasets.py:132-133``): a new size is
        drawn every 10th batch and held for the next 10."""
        if not self.multiscale or count < 10:
            return self._base_img_size
        rng = random.Random(self.seed * 1_000_003 + 7919 * (count // 10))
        return rng.choice(range(self.min_size, self.max_size + 1, 32))

    def next_size(self) -> int:
        """Multiscale schedule: new size every 10th batch (``:132-133``)."""
        self.batch_count += 1
        self.img_size = self.size_for_count(self.batch_count)
        return self.img_size

    def collate(self, samples: Sequence, row_offset: int = 0,
                fixed_size: bool = False,
                batch_count: Optional[int] = None) -> Optional[dict]:
        """Stack valid samples; pad labels to a fixed (B*max_objects) block.

        Targets are rows (batch_idx, cls, cx, cy, w, h) + validity mask —
        the fixed-shape encoding of the reference's concatenated tensor.

        ``row_offset`` shifts the batch-index column: in multi-host DP each
        host collates only its rows of the global batch, whose indices are
        global (host p's row ``bi`` is global row ``p*local_b + bi``).
        ``fixed_size`` keeps failed reads as zero images with no labels
        instead of dropping them — collective programs need every host to
        produce identically-shaped batches in lockstep, so a local decode
        failure must not change this host's batch shape.
        ``batch_count``: the global 1-based batch index (``iter_epoch``
        passes it) — the multiscale size becomes ``size_for_count`` of it,
        so the schedule is position-determined.  ``None`` (direct calls)
        falls back to the stateful ``next_size()`` stream.
        """
        if fixed_size:
            side = next((s[1].shape[0] for s in samples if s is not None),
                        self.native_side or self._seen_side or self.img_size)
            samples = [
                s if s is not None else
                ("<failed>", np.zeros((side, side, 3), np.uint8),
                 np.zeros((0, 5), np.float32))
                for s in samples
            ]
        else:
            samples = [s for s in samples if s is not None]
        if not samples:
            return None
        if batch_count is not None:
            self.batch_count = batch_count
            self.img_size = img_size = self.size_for_count(batch_count)
        else:
            img_size = self.next_size()
        paths, imgs, boxes_list = zip(*samples)
        batch = np.stack(imgs)
        if self.host_resize and batch.shape[1] != img_size:
            from ..ops.preprocess import nearest_indices

            idx = np.asarray(nearest_indices(img_size, batch.shape[1]))
            batch = np.ascontiguousarray(batch[:, idx][:, :, idx])
        bsz = len(samples)
        cap = self.max_objects
        targets = np.zeros((bsz * cap, 6), np.float32)
        mask = np.zeros((bsz * cap,), bool)
        for bi, bx in enumerate(boxes_list):
            n = min(len(bx), cap)
            rows = slice(bi * cap, bi * cap + n)
            targets[rows, 0] = row_offset + bi
            targets[rows, 1:] = bx[:n]
            mask[bi * cap:bi * cap + n] = True
        return {
            "paths": list(paths),
            "images": batch,
            "targets": targets,
            "target_mask": mask,
            "img_size": img_size,
        }

    def iter_epoch(self, batch_size: int, shuffle: bool = True, prefetch: int = 2,
                   shard=None):
        """Yield collated batches for one epoch.

        ``shard=(process_id, num_processes)`` turns on multi-host mode: every
        host derives the SAME global shuffle (seeded RNG) and the same
        ``batch_size``-row global batches, but loads/collates only its own
        contiguous row block of each — global row ``p*local_b + bi`` — with
        global batch-index targets.  Ragged tails are dropped and failed
        reads are zero-padded (``collate(fixed_size=True)``) so every host
        yields the same batch count and shapes: a collective program must
        run in lockstep.  The multiscale schedule stays host-identical
        because ``next_size`` advances once per global batch on each host
        with the same seed.
        """
        # Per-epoch derived seed: hosts calling iter_epoch the same number
        # of times (the lockstep contract) get identical orders regardless
        # of how deep any previous epoch's producer read ahead.
        self._epoch += 1
        order = list(range(len(self)))
        if shuffle:
            random.Random(self.seed * 2_654_435_761
                          + 1_442_695_041 * self._epoch).shuffle(order)
        pid, nproc = shard if shard is not None else (0, 1)
        if shard is not None:
            if batch_size % nproc:
                raise ValueError(
                    f"global batch {batch_size} must divide over {nproc} hosts")
            order = order[: len(order) - (len(order) % batch_size)]
        local_b = batch_size // nproc

        # Multiscale counts are assigned by PLANNED position (a batch whose
        # every sample fails still consumes its count), and the epoch's full
        # count is reserved up front — so abandoning the iterator early
        # cannot shift any later epoch's schedule.
        count_base = self._planned_batches
        self._planned_batches += (len(order) + batch_size - 1) // batch_size

        stop = threading.Event()

        def produce(q: "queue.Queue"):
            try:
                for j, start in enumerate(range(0, len(order), batch_size)):
                    if stop.is_set():
                        break
                    idxs = order[start:start + batch_size]
                    if shard is None:
                        batch = self.collate([self[i] for i in idxs],
                                             batch_count=count_base + j + 1)
                    else:
                        mine = idxs[pid * local_b:(pid + 1) * local_b]
                        batch = self.collate([self[i] for i in mine],
                                             row_offset=pid * local_b,
                                             fixed_size=True,
                                             batch_count=count_base + j + 1)
                    if batch is not None:
                        q.put(batch)
            except BaseException as e:  # surface decode bugs, don't drop them
                q.put(e)
            q.put(None)

        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        t = threading.Thread(target=produce, args=(q,), daemon=True)
        t.start()
        yield from _consume_prefetched(q, t, stop)


__all__ = ["ImageFolder", "ListDataset", "load_image_rgb", "pad_to_square_np"]
