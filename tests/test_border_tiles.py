"""WSI border tiles (non-square / undersized): framing geometry and the
per-image rescale back to original pixel space (the reference rescales per
image via ``rescale_boxes``, ``detect.py:129``; round-1 returned padded-frame
coordinates for such tiles — ADVICE r1)."""

import numpy as np
import pytest
from PIL import Image

from amyloid_yolo_tpu.io.datasets import ImageFolder
from amyloid_yolo_tpu.ops.boxes import rescale_from_tile_frame


def test_rescale_noop_for_standard_tiles():
    dets = np.array([[10, 20, 30, 40, 0.9, 0.8, 1]], np.float32)
    out = rescale_from_tile_frame(dets, 1536, (1536, 1536))
    np.testing.assert_array_equal(out, dets)


def test_rescale_wide_tile():
    """Original 300x600 (h<w): square side 600, top pad (600-300)//2 = 150;
    the square fills the 1536 tile frame (scale 600/1536)."""
    # a det covering the full tile frame maps to the full square minus pads
    dets = np.array([[0, 0, 1536, 1536, 0.9, 0.8, 1]], np.float32)
    out = rescale_from_tile_frame(dets, 1536, (300, 600))
    np.testing.assert_allclose(out[0, :4], [0, -150, 600, 450])
    # a det at the image center maps to the original center
    cx = 1536 / 2
    dets = np.array([[cx - 10, cx - 10, cx + 10, cx + 10, 0.9, 0.8, 1]], np.float32)
    out = rescale_from_tile_frame(dets, 1536, (300, 600))
    s = 600 / 1536
    np.testing.assert_allclose(
        out[0, :4],
        [(cx - 10) * s, (cx - 10) * s - 150, (cx + 10) * s, (cx + 10) * s - 150])


def test_rescale_tall_tile():
    """Original 600x300 (w<h): left pad 150."""
    dets = np.array([[0, 0, 1536, 1536, 0.9, 0.8, 1]], np.float32)
    out = rescale_from_tile_frame(dets, 1536, (600, 300))
    np.testing.assert_allclose(out[0, :4], [-150, 0, 450, 600])


def test_imagefolder_border_geometry(tmp_path, rng):
    """A non-square border tile fills the whole tile frame (centered pad +
    nearest resize) and its original shape is recorded."""
    img = rng.randint(1, 255, (100, 64, 3)).astype(np.uint8)  # tall
    p = tmp_path / "t.png"  # png: lossless, so content checks are exact
    Image.fromarray(img).save(p)
    folder = ImageFolder(str(tmp_path), tile_size=128)
    path, out = folder[0]
    assert out.shape == (128, 128, 3)
    assert folder.orig_shapes[str(p)] == (100, 64)
    # centered horizontally: pad columns on both sides map to zeros
    assert out[:, 0].sum() == 0 and out[:, -1].sum() == 0
    # center pixel comes from the original image (non-zero)
    assert out[64, 64].sum() > 0


def test_imagefolder_standard_tile_unchanged(tmp_path, rng):
    img = rng.randint(0, 255, (128, 128, 3)).astype(np.uint8)
    p = tmp_path / "t.png"
    Image.fromarray(img).save(p)
    folder = ImageFolder(str(tmp_path), tile_size=128)
    _, out = folder[0]
    np.testing.assert_array_equal(out, img)


def test_native_pool_reports_dims(tmp_path):
    native = pytest.importorskip("amyloid_yolo_tpu.io.native")
    if not native.available():
        pytest.skip("native tile reader not built")
    img = np.full((100, 64, 3), 128, np.uint8)
    p = str(tmp_path / "b.jpg")
    Image.fromarray(img).save(p, quality=95)
    pool = native.TilePool(1)
    try:
        batch, ok, dims = pool.decode_batch([p], 128, 0)
        assert ok[0]
        assert tuple(dims[0]) == (100, 64)
        assert batch.shape == (1, 128, 128, 3)
    finally:
        pool.close()


def test_native_iter_batches_border_fallback(tmp_path):
    """The native batch iterator swaps border tiles to the centered PIL
    geometry and records orig shapes."""
    native = pytest.importorskip("amyloid_yolo_tpu.io.native")
    if not native.available():
        pytest.skip("native tile reader not built")
    full = np.full((128, 128, 3), 200, np.uint8)
    border = np.full((100, 64, 3), 200, np.uint8)
    Image.fromarray(full).save(tmp_path / "a_full.jpg", quality=95)
    Image.fromarray(border).save(tmp_path / "b_border.jpg", quality=95)
    folder = ImageFolder(str(tmp_path), tile_size=128)
    batches = list(folder.iter_batches(2))
    assert len(batches) == 1
    paths, batch, n_valid = batches[0]
    assert n_valid == 2
    assert folder.orig_shapes[str(tmp_path / "b_border.jpg")] == (100, 64)
    i = paths.index(str(tmp_path / "b_border.jpg"))
    # centered: left/right pad columns are zero for the border tile
    assert batch[i][:, 0].sum() == 0 and batch[i][:, -1].sum() == 0
    # middle column carries image content (value ~200 after jpeg roundtrip)
    assert batch[i][:, 64].mean() > 100
