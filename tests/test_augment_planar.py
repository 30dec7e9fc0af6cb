"""Planar-layout (channels-first) training image pipeline.

On TPU, NHWC images with C=3 minor waste ~42/128 of every VPU tile on
channel padding — the train trace attributed ~0.85 ms/step to the sharpen
fusion alone.  The planar path transposes ONCE at uint8, then runs resize,
the full augmentation policy, and the s2d-stem feed W-minor.  Contract:
identical results — bit-exact everywhere except the sharpen conv (whose
tap-reduction order differs by ~1 ULP), and identical RNG consumption.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from amyloid_yolo_tpu.models import darknet
from amyloid_yolo_tpu.ops import augment as aug
from amyloid_yolo_tpu.ops.preprocess import resize_nearest
from amyloid_yolo_tpu.parallel import steps

from minispec import mini_spec


@pytest.fixture(scope="module")
def img():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.rand(64, 64, 3).astype(np.float32))


def _to_planar(x):
    return jnp.transpose(x, (2, 0, 1))


def _from_planar(x):
    return np.transpose(np.asarray(x), (1, 2, 0))


def test_shear3_planar_bitexact(img):
    ang, tx, ty = jnp.float32(13.0), jnp.float32(0.1), jnp.float32(-0.05)
    a = np.asarray(aug._affine_shear3(img, ang, tx, ty))
    b = _from_planar(aug._affine_shear3_planar(_to_planar(img), ang, tx, ty))
    np.testing.assert_array_equal(a, b)


def test_shear_rows_planar_bitexact_per_row_group(img):
    # group=1 (exact per-row path) must also agree
    shift = jnp.asarray(np.linspace(-3.3, 2.7, 64), jnp.float32)
    a = np.asarray(aug._shear_rows(img, shift, group=1))
    b = _from_planar(aug._shear_rows_planar(_to_planar(img), shift, group=1))
    np.testing.assert_array_equal(a, b)


def test_sharpen_planar_one_ulp(img):
    a = np.asarray(aug._sharpen(img, jnp.float32(0.15)))
    b = _from_planar(aug._sharpen_planar(_to_planar(img), jnp.float32(0.15)))
    # conv tap-reduction order differs between the eye-kernel and the
    # single-feature form: ~1 ULP, far below the train path's kink noise
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-6)


def test_hsv_planes_bitexact(img):
    hu = jnp.float32(0.07)
    hsv = aug._rgb_to_hsv(img)
    hsv = hsv.at[..., 0].set((hsv[..., 0] + hu) % 1.0)
    a = np.asarray(aug._hsv_to_rgb(hsv))
    p = _to_planar(img)
    h, s, v = aug._rgb_to_hsv_planes(p[0], p[1], p[2])
    r, g, b = aug._hsv_to_rgb_planes((h + hu) % 1.0, s, v)
    np.testing.assert_array_equal(a, _from_planar(jnp.stack([r, g, b])))


def test_resize_nearest_planar_bitexact():
    rng = np.random.RandomState(1)
    u8 = jnp.asarray(rng.randint(0, 256, (2, 100, 100, 3), dtype=np.uint8))
    a = np.asarray(resize_nearest(u8, 64))
    b = np.asarray(resize_nearest(jnp.transpose(u8, (0, 3, 1, 2)), 64,
                                  layout="planar"))
    np.testing.assert_array_equal(a, np.transpose(b, (0, 2, 3, 1)))


def test_space_to_depth_planar_bitexact():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    a = np.asarray(darknet._space_to_depth(x))
    b = np.asarray(darknet._space_to_depth_planar(jnp.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_array_equal(a, b)


def test_augment_batch_planar_matches_nhwc():
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    t = np.zeros((8, 6), np.float32)
    t[0] = [0, 0, 0.5, 0.5, 0.2, 0.3]
    t[1] = [1, 1, 0.3, 0.6, 0.1, 0.2]
    targets = jnp.asarray(t)
    mask = jnp.asarray(np.arange(8) < 2)
    key = jax.random.PRNGKey(7)
    o_n, t_n, m_n = aug.augment_batch(key, img, targets, mask)
    o_p, t_p, m_p = aug.augment_batch(key, jnp.transpose(img, (0, 3, 1, 2)),
                                      targets, mask, layout="planar")
    # sharpen's 1-ULP delta propagates through the chain; boxes are exact
    np.testing.assert_allclose(np.asarray(o_n),
                               np.transpose(np.asarray(o_p), (0, 2, 3, 1)),
                               rtol=0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(t_n), np.asarray(t_p))
    np.testing.assert_array_equal(np.asarray(m_n), np.asarray(m_p))


@pytest.mark.parametrize("s2d", [False, True])
def test_train_step_planar_matches_nhwc(s2d):
    spec = mini_spec(img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    rng = np.random.RandomState(4)
    xu8 = jnp.asarray(rng.randint(0, 256, (2, 64, 64, 3), dtype=np.uint8))
    t = np.zeros((8, 6), np.float32)
    t[0] = [0, 0, 0.5, 0.5, 0.2, 0.3]
    targets = jnp.asarray(t)
    mask = jnp.asarray(np.arange(8) < 1)
    key = jax.random.PRNGKey(3)
    opt = steps.make_optimizer(1e-3)
    losses = []
    for layout in ("nhwc", "planar"):
        st = steps.init_train_state(jax.tree.map(jnp.array, params), opt)
        step = steps.make_train_step(spec, opt, augment=True, s2d_stem=s2d,
                                     image_layout=layout)
        st, m = step(st, xu8, targets, mask, key, 64)
        losses.append(float(m["loss"]))
    assert abs(losses[0] - losses[1]) < 1e-4 * max(1.0, abs(losses[0]))
