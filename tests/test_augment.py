"""On-device augmentation: geometric correctness of box transforms."""

import numpy as np
import jax
import jax.numpy as jnp

from amyloid_yolo_tpu.ops.augment import (
    _affine_boxes, _affine_one, _hsv_to_rgb, _rgb_to_hsv, augment_batch,
)


def test_hsv_roundtrip(rng):
    x = jnp.asarray(rng.rand(8, 8, 3).astype(np.float32))
    back = _hsv_to_rgb(_rgb_to_hsv(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_affine_identity(rng):
    img = jnp.asarray(rng.rand(32, 32, 3).astype(np.float32))
    out = _affine_one(img, jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_affine_translation_moves_content():
    img = np.zeros((32, 32, 3), np.float32)
    img[8, 8] = 1.0
    out = _affine_one(jnp.asarray(img), jnp.float32(0.0), jnp.float32(0.25),
                      jnp.float32(0.0))
    got = np.asarray(out)
    assert got[8, 16].sum() > 0.9  # moved +8 px in x
    assert got[8, 8].sum() < 0.1


def test_affine_box_rotation_90():
    boxes = jnp.asarray([[0.25, 0.5, 0.2, 0.1]], jnp.float32)
    out = _affine_boxes(boxes, jnp.asarray([90.0]), jnp.asarray([0.0]),
                        jnp.asarray([0.0]))
    got = np.asarray(out)[0]
    # 90°: the point (0.25, 0.5) rotates about center to (0.5, 0.25);
    # width and height swap
    np.testing.assert_allclose(got[:2], [0.5, 0.25], atol=1e-5)
    np.testing.assert_allclose(got[2:], [0.1, 0.2], atol=1e-5)


def test_image_and_box_rotation_consistent():
    """Rotating the image and the boxes with the same params keeps a
    blob's box on the blob."""
    img = np.zeros((64, 64, 3), np.float32)
    img[10:20, 40:50] = 1.0  # blob at rows 10-20, cols 40-50
    ang, tx, ty = jnp.float32(30.0), jnp.float32(0.05), jnp.float32(-0.1)
    out = np.asarray(_affine_one(jnp.asarray(img), ang, tx, ty))
    ys, xs = np.where(out.sum(-1) > 0.5)
    boxes = jnp.asarray([[45.0 / 64, 15.0 / 64, 10.0 / 64, 10.0 / 64]], jnp.float32)
    nb = np.asarray(_affine_boxes(boxes, ang[None], tx[None], ty[None]))[0]
    cx, cy = nb[0] * 64, nb[1] * 64
    assert abs(cx - xs.mean()) < 2.5
    assert abs(cy - ys.mean()) < 2.5


def test_augment_batch_shapes_and_flip(rng):
    imgs = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    t = jnp.asarray([[0, 1, 0.25, 0.5, 0.1, 0.1], [1, 0, 0.75, 0.25, 0.2, 0.2]],
                    jnp.float32)
    mask = jnp.ones((2,), bool)
    out_i, out_t, out_m = augment_batch(jax.random.PRNGKey(0), imgs, t, mask)
    assert out_i.shape == imgs.shape
    assert out_t.shape == t.shape
    assert np.asarray(out_i).min() >= 0 and np.asarray(out_i).max() <= 1.0
    # batch idx / class columns untouched
    np.testing.assert_array_equal(np.asarray(out_t)[:, :2], np.asarray(t)[:, :2])


def test_augment_degenerate_boxes_masked(rng):
    imgs = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    # box fully outside after any clip -> zero area -> masked out
    t = jnp.asarray([[0, 1, 1.49, 1.49, 0.01, 0.01]], jnp.float32)
    _, _, out_m = augment_batch(jax.random.PRNGKey(1), imgs, t, jnp.ones((1,), bool))
    assert not bool(out_m[0])


def test_shear3_matches_bilinear_translation_and_smooth_rotation(rng):
    """The 3-shear warp (the shipped train-time resampler) must equal the
    2-D bilinear reference exactly for pure translation, and agree to
    sub-pixel kernel tolerance on smooth content under rotation (interior
    pixels; the valid-data frontier may differ by ≤2 px of zero-fill)."""
    from amyloid_yolo_tpu.ops.augment import _affine_shear3

    img = jnp.asarray(rng.rand(64, 64, 3).astype(np.float32))
    a = _affine_one(img, jnp.float32(0.0), jnp.float32(0.15), jnp.float32(-0.1))
    b = _affine_shear3(img, jnp.float32(0.0), jnp.float32(0.15), jnp.float32(-0.1))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    smooth = (np.stack([np.sin(xx / 9.0) + 1, np.cos(yy / 7.0) + 1,
                        (xx + yy) / 126.0], -1).astype(np.float32) / 2)
    a = np.asarray(_affine_one(jnp.asarray(smooth), jnp.float32(9.0),
                               jnp.float32(0.0), jnp.float32(0.0)))
    b = np.asarray(_affine_shear3(jnp.asarray(smooth), jnp.float32(9.0),
                                  jnp.float32(0.0), jnp.float32(0.0)))
    interior = np.s_[8:-8, 8:-8]
    assert np.abs(a - b)[interior].max() < 5e-3


def test_grouped_shear_bitexact_vs_per_row(rng):
    """The grouped-window shear (one dynamic_slice per 16-row group, the
    shipped path) must be BIT-exact vs the per-row reference (group=1) for
    every shift profile the 3-shear warp can produce under the policy
    bounds (|slope| ≤ sin 20° ≈ 0.342, plus per-image constants up to
    ±0.45·S)."""
    from amyloid_yolo_tpu.ops.augment import _shear_rows

    img = jnp.asarray(rng.rand(64, 64, 3).astype(np.float32))
    idx = np.arange(64, dtype=np.float32)
    for slope, const in [(0.342, -28.0), (-0.342, 28.0), (0.176, 0.3),
                         (0.0, -17.77), (0.31, 5.2)]:
        shift = jnp.asarray(slope * idx + const)
        a = np.asarray(_shear_rows(img, shift))
        b = np.asarray(_shear_rows(img, shift, group=1))
        np.testing.assert_array_equal(a, b)


def test_shear3_blob_consistent_with_boxes():
    """Same contract as test_image_and_box_rotation_consistent, for the
    shipped 3-shear path: the transformed box stays on the blob."""
    from amyloid_yolo_tpu.ops.augment import _affine_shear3

    img = np.zeros((64, 64, 3), np.float32)
    img[10:20, 40:50] = 1.0
    ang, tx, ty = jnp.float32(30.0), jnp.float32(0.05), jnp.float32(-0.1)
    out = np.asarray(_affine_shear3(jnp.asarray(img), ang, tx, ty))
    ys, xs = np.where(out.sum(-1) > 0.5)
    boxes = jnp.asarray([[45.0 / 64, 15.0 / 64, 10.0 / 64, 10.0 / 64]], jnp.float32)
    nb = np.asarray(_affine_boxes(boxes, ang[None], tx[None], ty[None]))[0]
    assert abs(nb[0] * 64 - xs.mean()) < 2.5
    assert abs(nb[1] * 64 - ys.mean()) < 2.5
