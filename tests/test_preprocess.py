"""Preprocessing parity: nearest resize, pad-to-square, 256² crop windows,
box rescaling."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from amyloid_yolo_tpu.ops.boxes import rescale_boxes, rescale_boxes_jnp
from amyloid_yolo_tpu.ops.preprocess import (
    crop256, crop256_window, nearest_indices, pad_amounts, pad_to_square,
    preprocess_tiles, resize_nearest,
)


def reference_get256_window(bbox_coord):
    """Direct transcription of get256Img's branch ladder (core.py:109-159),
    returning the crop window, as ground truth for the closed form."""
    cx = int(bbox_coord[0] + (bbox_coord[2] / 2))
    cy = int(bbox_coord[1] + (bbox_coord[3] / 2))
    xl, xr = cx - 128 > 0, cx + 128 < 1536
    yt, yb = cy - 128 > 0, cy + 128 < 1536
    xv, yv = xl and xr, yt and yb
    if xv and yv:
        return cx - 128, cy - 128
    if xv and not yv:
        return (cx - 128, 0) if yb else (cx - 128, 1280)
    if not xv and yv:
        return (1280, cy - 128) if xl else (0, cy - 128)
    x0 = 1280 if xl else 0
    y0 = 1280 if yt else 0
    return x0, y0


def test_crop_window_matches_reference(rng):
    for _ in range(500):
        x, y = rng.randint(0, 1500, 2)
        w, h = rng.randint(1, 400, 2)
        bbox = (int(x), int(y), int(w), int(h))
        assert crop256_window(bbox) == reference_get256_window(bbox)


def test_crop256_shape(rng):
    img = rng.randint(0, 255, (1536, 1536, 3)).astype(np.uint8)
    for bbox in [(0, 0, 10, 10), (1500, 1500, 30, 30), (700, 700, 100, 100)]:
        assert crop256(img, bbox).shape == (256, 256, 3)


def test_nearest_resize_matches_torch(rng):
    img = rng.rand(1, 3, 100, 100).astype(np.float32)
    want = F.interpolate(torch.from_numpy(img), size=64, mode="nearest").numpy()
    got = resize_nearest(jnp.asarray(img.transpose(0, 2, 3, 1)), 64)
    np.testing.assert_array_equal(np.asarray(got).transpose(0, 3, 1, 2), want)


def test_nearest_resize_1536_to_416_matches_torch(rng):
    img = rng.randint(0, 255, (1, 3, 1536, 1536)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(img), size=416, mode="nearest").numpy()
    got = resize_nearest(jnp.asarray(img.transpose(0, 2, 3, 1)), 416)
    np.testing.assert_array_equal(np.asarray(got).transpose(0, 3, 1, 2), want)


def test_preprocess_tiles_equals_totensor_then_resize(rng):
    tiles = rng.randint(0, 255, (2, 1536, 1536, 3)).astype(np.uint8)
    out = preprocess_tiles(jnp.asarray(tiles), 416)
    t = torch.from_numpy(tiles.transpose(0, 3, 1, 2)).float() / 255.0
    want = F.interpolate(t, size=416, mode="nearest").numpy()
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), want, atol=1e-7)


def test_pad_to_square_matches_reference_rule(rng):
    # reference pad_to_square (utils/datasets.py:22-32): torch F.pad order
    for h, w in [(100, 160), (160, 100), (50, 50), (99, 100)]:
        img = rng.rand(h, w, 3).astype(np.float32)
        out, _ = pad_to_square(jnp.asarray(img), 0.0)
        timg = torch.from_numpy(img.transpose(2, 0, 1))
        diff = abs(h - w)
        p1, p2 = diff // 2, diff - diff // 2
        pad = (0, 0, p1, p2) if h <= w else (p1, p2, 0, 0)
        want = F.pad(timg, pad, value=0.0).numpy().transpose(1, 2, 0)
        np.testing.assert_array_equal(np.asarray(out), want)
        assert pad_amounts(h, w) == pad


def test_rescale_boxes_square_identity():
    """416-space boxes on a square 1536 image scale by 1536/416 exactly
    (utils/utils.py:36-50 with zero padding)."""
    boxes = np.array([[10.0, 20.0, 100.0, 200.0, 0.9, 0.8, 1.0]])
    out = rescale_boxes(boxes.copy(), 416, (1536, 1536))
    np.testing.assert_allclose(out[0, :4], boxes[0, :4] * 1536 / 416)
    out_j = rescale_boxes_jnp(jnp.asarray(boxes[None]), 416, 1536, 1536)
    np.testing.assert_allclose(np.asarray(out_j)[0, :, :4], out[:, :4], rtol=1e-5)


def test_rescale_boxes_rectangular():
    boxes = np.array([[100.0, 208.0, 200.0, 300.0]])
    orig = (600, 800)  # h < w: y was padded
    out = rescale_boxes(boxes.copy(), 416, orig)
    pad_y = (800 - 600) * (416 / 800)  # = 104
    unpad_h = 416 - pad_y
    assert np.isclose(out[0, 1], (208 - pad_y // 2) / unpad_h * 600)
    assert np.isclose(out[0, 0], 100 / 416 * 800)
