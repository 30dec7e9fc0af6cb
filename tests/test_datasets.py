"""Host dataset pipeline: folders, list datasets, multiscale, native reader."""

import os

import numpy as np
import pytest
from PIL import Image

from amyloid_yolo_tpu.io.datasets import ImageFolder, ListDataset, pad_to_square_np


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    img_dir = root / "images"
    lbl_dir = root / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    rng = np.random.RandomState(0)
    paths = []
    for i in range(5):
        img = rng.randint(0, 255, (256, 256, 3)).astype(np.uint8)
        p = img_dir / f"t{i}.jpg"
        Image.fromarray(img).save(p)
        (lbl_dir / f"t{i}.txt").write_text("1 0.5 0.5 0.2 0.2\n0 0.25 0.25 0.1 0.1\n")
        paths.append(str(p))
    (root / "train.txt").write_text("\n".join(paths) + "\n")
    # one corrupt image listed
    (img_dir / "bad.jpg").write_bytes(b"nope")
    (lbl_dir / "bad.txt").write_text("1 0.5 0.5 0.2 0.2\n")
    (root / "train_with_bad.txt").write_text("\n".join(paths + [str(img_dir / "bad.jpg")]) + "\n")
    return root


def test_image_folder_batches(data_dir):
    folder = ImageFolder(str(data_dir / "images"), tile_size=256)
    batches = list(folder.iter_batches(2))
    n = sum(nv for _, _, nv in batches)
    assert n == 5  # corrupt file skipped
    for paths, batch, nv in batches:
        assert batch.shape == (2, 256, 256, 3)
        assert batch.dtype == np.uint8


def test_image_folder_resize_to(data_dir):
    folder = ImageFolder(str(data_dir / "images"), tile_size=256, resize_to=64)
    paths, batch, nv = next(folder.iter_batches(4))
    assert batch.shape == (4, 64, 64, 3)


def test_list_dataset_labels(data_dir):
    ds = ListDataset(str(data_dir / "train.txt"), img_size=416, multiscale=False)
    path, img, boxes = ds[0]
    assert img.shape == (256, 256, 3)
    assert boxes.shape == (2, 5)
    # square image: normalized labels unchanged by padding
    np.testing.assert_allclose(boxes[0], [1, 0.5, 0.5, 0.2, 0.2], atol=1e-6)


def test_list_dataset_collate_padding(data_dir):
    ds = ListDataset(str(data_dir / "train.txt"), img_size=416,
                     multiscale=False, max_objects=10)
    batch = ds.collate([ds[0], ds[1]])
    assert batch["images"].shape == (2, 256, 256, 3)
    assert batch["targets"].shape == (20, 6)
    assert batch["target_mask"].sum() == 4
    assert batch["targets"][10, 0] == 1  # second image's block carries idx 1


def test_list_dataset_drops_corrupt(data_dir):
    ds = ListDataset(str(data_dir / "train_with_bad.txt"), multiscale=False)
    assert ds[5] is None  # corrupt
    batch = ds.collate([ds[4], ds[5]])
    assert batch["images"].shape[0] == 1


def test_multiscale_schedule(data_dir):
    ds = ListDataset(str(data_dir / "train.txt"), img_size=416, multiscale=True, seed=3)
    sizes = [ds.next_size() for _ in range(40)]
    assert all(s % 32 == 0 and 320 <= s <= 512 for s in sizes)
    # size changes only on multiples of 10 (reference utils/datasets.py:132)
    for i, s in enumerate(sizes):
        if (i + 1) % 10 != 0:
            assert s == (sizes[i - 1] if i else 416)
    assert len(set(sizes)) > 1


def test_pad_to_square_np():
    img = np.ones((10, 20, 3), np.uint8)
    out, (l, r, t, b) = pad_to_square_np(img)
    assert out.shape == (20, 20, 3)
    assert (l, r) == (0, 0) and t == 5 and b == 5


def test_native_reader_parity_if_available(data_dir):
    from amyloid_yolo_tpu.io import native

    if not native.available():
        pytest.skip("native tile reader not built")
    from amyloid_yolo_tpu.io.datasets import load_image_rgb

    pool = native.TilePool(1)
    paths = sorted(
        str(data_dir / "images" / f) for f in os.listdir(data_dir / "images")
        if f.startswith("t"))
    batch, ok, dims = pool.decode_batch(paths, tile_size=256, resize_to=0)
    assert ok.all()
    for p, arr in zip(paths, batch):
        np.testing.assert_array_equal(arr, load_image_rgb(p))
    # corrupt file flagged, not fatal
    batch, ok, dims = pool.decode_batch([str(data_dir / "images" / "bad.jpg")], 256, 0)
    assert not ok[0]
    pool.close()


def test_list_dataset_cached_decode(tmp_path):
    # NOTE: the test name must not contain "images" — tmp_path embeds the
    # test name, and the reference-parity label derivation replaces EVERY
    # "images" substring in the path (utils/datasets.py:71 quirk).
    """cache_images returns identical samples without re-decoding.  Failed
    reads are NOT cached (round-3 advisor fix): a transient I/O hiccup must
    retry next epoch like the uncached path (the reference re-reads every
    epoch, ``utils/datasets.py:88-127``)."""
    import numpy as np
    from PIL import Image

    from amyloid_yolo_tpu.io.datasets import ListDataset, load_image_rgb

    imgs = tmp_path / "images"
    labels = tmp_path / "labels"
    imgs.mkdir(); labels.mkdir()
    rng = np.random.RandomState(0)
    paths = []
    for i in range(3):
        p = imgs / f"t{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (64, 48, 3), dtype=np.uint8)).save(p)
        (labels / f"t{i}.txt").write_text("1 0.5 0.5 0.2 0.2\n")
        paths.append(str(p))
    (imgs / "bad.jpg").write_text("nope")
    (labels / "bad.txt").write_text("1 0.5 0.5 0.2 0.2\n")
    paths.append(str(imgs / "bad.jpg"))
    lst = tmp_path / "train.txt"
    lst.write_text("\n".join(paths) + "\n")

    ds = ListDataset(str(lst), img_size=32, multiscale=False, augment=False,
                     cache_images=True)
    first = [ds[i] for i in range(len(ds))]
    assert first[3] is None
    # only the 3 good samples are cached; the corrupt one will retry
    assert len(ds._cache) == 3 and all(v is not None for v in ds._cache.values())
    # poison the decode path: cached reads must not touch the files
    for p in paths[:3]:
        import os
        os.unlink(p)
    second = [ds[i] for i in range(len(ds))]
    for a, b in zip(first, second):
        if a is None:
            assert b is None
            continue
        assert a[0] == b[0]
        np.testing.assert_array_equal(a[1], b[1])
        np.testing.assert_array_equal(a[2], b[2])
    # uncached dataset would fail now
    ds2 = ListDataset(str(lst), img_size=32, multiscale=False, augment=False)
    assert ds2[0] is None


def test_list_dataset_host_resize_bit_identical(tmp_path):
    """host_resize moves the nearest gather to the host; after the train
    step's device resize (identity once sizes match) the pixels are
    bit-identical to the device-resized full-res batch."""
    import numpy as np
    from PIL import Image

    from amyloid_yolo_tpu.io.datasets import ListDataset
    from amyloid_yolo_tpu.ops.preprocess import resize_nearest

    imgs = tmp_path / "images"
    labels = tmp_path / "labels"
    imgs.mkdir(); labels.mkdir()
    rng = np.random.RandomState(0)
    paths = []
    for i in range(4):
        p = imgs / f"t{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (96, 96, 3), dtype=np.uint8)).save(p)
        (labels / f"t{i}.txt").write_text("1 0.5 0.5 0.2 0.2\n")
        paths.append(str(p))
    lst = tmp_path / "train.txt"
    lst.write_text("\n".join(paths) + "\n")

    kw = dict(img_size=32, multiscale=True, augment=False, seed=3)
    full = ListDataset(str(lst), **kw)
    host = ListDataset(str(lst), host_resize=True, **kw)
    for b_full, b_host in zip(full.iter_epoch(2, shuffle=False),
                              host.iter_epoch(2, shuffle=False)):
        assert b_full["img_size"] == b_host["img_size"]  # same RNG stream
        s = b_full["img_size"]
        want = np.asarray(resize_nearest(b_full["images"], s))
        got = np.asarray(resize_nearest(b_host["images"], s))  # identity
        assert b_host["images"].shape[1] == s
        np.testing.assert_array_equal(want, got)
        np.testing.assert_array_equal(b_full["targets"], b_host["targets"])


def test_abandoned_folder_iterator_joins_producer(data_dir):
    """Abandoning iter_batches after one item (the `amyolo serve
    --calibration_folder` pattern) must stop and JOIN the producer thread
    before cleanup — closing the native TilePool while a decode is in
    flight corrupts the heap (malloc tcache abort, found in the field)."""
    import threading

    folder = ImageFolder(str(data_dir / "images"), tile_size=256)
    before = set(threading.enumerate())
    it = folder.iter_batches(2)
    _, batch, nv = next(it)
    assert batch.shape[0] == 2
    it.close()  # what GC does to an abandoned generator
    leaked = [t for t in threading.enumerate()
              if t not in before and t.is_alive()]
    assert not leaked, leaked
    # the folder remains fully usable afterwards (fresh pool/iterator)
    assert sum(nv for _, _, nv in folder.iter_batches(2)) == 5


def test_abandoned_epoch_iterator_joins_producer(data_dir):
    """The trainer's max_batches_per_epoch break must not leak one
    forever-blocked q.put producer thread per epoch."""
    import threading

    ds = ListDataset(str(data_dir / "train.txt"), img_size=64,
                     multiscale=False, augment=False)
    before = set(threading.enumerate())
    for _ in range(3):  # three "epochs", each abandoned after one batch
        it = ds.iter_epoch(2, shuffle=False)
        assert next(it) is not None
        it.close()
    leaked = [t for t in threading.enumerate()
              if t not in before and t.is_alive()]
    assert not leaked, leaked


def test_abandoned_epoch_rng_determinism(data_dir):
    """r3 advisor (medium): the epoch shuffle and multiscale schedule must
    be pure functions of (seed, epoch / batch index) — NOT a shared stateful
    RNG whose state depends on how deep the prefetch producer read ahead
    before a consumer abandoned the epoch (max_batches_per_epoch).  Two
    datasets, one consuming epoch 1 fully and one abandoning it after one
    batch, must produce bit-identical epoch 2 (order AND sizes)."""
    kw = dict(img_size=416, multiscale=True, seed=7)
    a = ListDataset(str(data_dir / "train.txt"), **kw)
    b = ListDataset(str(data_dir / "train.txt"), **kw)
    list(a.iter_epoch(1))                 # full epoch (5 batches)
    it = b.iter_epoch(1)                  # abandoned after 1 batch
    assert next(it) is not None
    it.close()
    ep2_a = [(x["paths"], x["img_size"]) for x in a.iter_epoch(1)]
    ep2_b = [(x["paths"], x["img_size"]) for x in b.iter_epoch(1)]
    assert ep2_a == ep2_b
    # epoch 2 spans global batches 6..10 -> the multiscale draw at count 10
    # fires and is position-determined
    assert [s for _, s in ep2_a] == [a.size_for_count(c) for c in range(6, 11)]


def test_collate_fixed_size_fallback_side(data_dir):
    """r3 advisor (low): when EVERY sample in a host's local slice fails,
    the zero-image fallback side must come from a host-invariant source
    (native_side) — not img_size — so cross-host batch shapes stay equal."""
    ds = ListDataset(str(data_dir / "train_with_bad.txt"), img_size=416,
                     multiscale=False, native_side=256)
    bad = [None, None]
    batch = ds.collate(bad, fixed_size=True)
    assert batch["images"].shape == (2, 256, 256, 3)
    # without native_side, a previously-seen side is the next-best hint
    ds2 = ListDataset(str(data_dir / "train.txt"), img_size=416,
                      multiscale=False)
    _ = ds2[0]
    batch2 = ds2.collate([None], fixed_size=True)
    assert batch2["images"].shape == (1, 256, 256, 3)


def test_probe_native_side(data_dir):
    """probe_native_side header-reads the first image (no pixel decode) so
    the distributed Trainer's all-samples-failed collate fallback uses the
    dataset's real padded-square side, not img_size."""
    ds = ListDataset(str(data_dir / "train.txt"), img_size=416,
                     multiscale=False)
    assert ds.native_side is None
    assert ds.probe_native_side() == 256
    assert ds.native_side == 256
    batch = ds.collate([None], fixed_size=True)   # nothing decoded yet
    assert batch["images"].shape == (1, 256, 256, 3)
