"""On-device training augmentation with ``jax.random``.

Semantic port of the reference's imgaug policy (``utils/augmentations.py:
4-22``): per-sample pixel dropout (rate ~U[0, 0.01]), sharpen (alpha
~U[0, 0.2]), affine (rotation ~U[-20°, 20°], translation ~U[-20%, 20%]),
brightness (±30/255), hue (±20 OpenCV-hue units), horizontal flip (p=0.5).
Box coordinates ride along: affine transforms the four corners and re-boxes
them (imgaug's box policy), flips mirror cx, and boxes clipped to nothing
are masked out (imgaug ``clip_out_of_image``).

Deliberate divergences (documented, statistically immaterial, RNG streams
cannot match imgaug anyway):

* ops apply in a fixed order rather than imgaug's ``random_order=True``;
* imgaug works on the full-resolution host image before letterboxing — we
  augment the device-resident, already-resized tensor, so per-image work is
  ~13× cheaper at 416² vs 1536² and fuses into the train step.

Everything is batched and branch-free (``jnp.where`` masking) so one
compiled program serves every sample.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    spread = maxc - minc
    s = jnp.where(maxc > 0, spread / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(spread, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = (h / 6.0) % 1.0
    h = jnp.where(spread == 0, 0.0, h)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _bilinear_sample(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample HWC image at float (ys, xs) grids with zero padding."""
    h, w = img.shape[0], img.shape[1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yi_c = jnp.clip(yi, 0, h - 1)
        xi_c = jnp.clip(xi, 0, w - 1)
        vals = img[yi_c, xi_c]
        return jnp.where(inb[..., None], vals, 0.0)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1 - wx)[..., None] + v01 * wx[..., None]
    bot = v10 * (1 - wx)[..., None] + v11 * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def _affine_one(img: jnp.ndarray, angle_deg: jnp.ndarray, tx: jnp.ndarray,
                ty: jnp.ndarray) -> jnp.ndarray:
    """Rotate about center + translate (fractions of size), bilinear, cval 0."""
    s = img.shape[0]
    c = (s - 1) / 2.0
    th = jnp.deg2rad(angle_deg)
    cos, sin = jnp.cos(th), jnp.sin(th)
    ys = jnp.arange(s, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, ys, indexing="ij")
    # inverse map: output pixel -> source pixel
    ox = gx - c - tx * s
    oy = gy - c - ty * s
    sx = cos * ox + sin * oy + c
    sy = -sin * ox + cos * oy + c
    return _bilinear_sample(img, sy, sx)


def _affine_boxes(boxes: jnp.ndarray, angle_deg: jnp.ndarray, tx: jnp.ndarray,
                  ty: jnp.ndarray) -> jnp.ndarray:
    """Forward-transform normalized (cx, cy, w, h) boxes: rotate the four
    corners about the image center, translate, and take the axis-aligned
    bounding box (imgaug's keypoint-based box policy)."""
    th = jnp.deg2rad(angle_deg)
    cos, sin = jnp.cos(th)[:, None], jnp.sin(th)[:, None]
    cx, cy, w, h = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    dx = jnp.stack([-w / 2, w / 2, -w / 2, w / 2], axis=-1)
    dy = jnp.stack([-h / 2, -h / 2, h / 2, h / 2], axis=-1)
    px = cx[:, None] + dx - 0.5
    py = cy[:, None] + dy - 0.5
    # forward rotation (output = R @ offset): matches the inverse map above
    qx = cos * px - sin * py + 0.5 + tx[:, None]
    qy = sin * px + cos * py + 0.5 + ty[:, None]
    x1 = jnp.min(qx, axis=-1)
    x2 = jnp.max(qx, axis=-1)
    y1 = jnp.min(qy, axis=-1)
    y2 = jnp.max(qy, axis=-1)
    # clip to image (imgaug clip_out_of_image)
    x1 = jnp.clip(x1, 0.0, 1.0)
    x2 = jnp.clip(x2, 0.0, 1.0)
    y1 = jnp.clip(y1, 0.0, 1.0)
    y2 = jnp.clip(y2, 0.0, 1.0)
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


SHARPEN_KERNEL = jnp.asarray(
    [[-1.0, -1.0, -1.0], [-1.0, 9.0, -1.0], [-1.0, -1.0, -1.0]]
)


def _sharpen(img: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    k = SHARPEN_KERNEL[:, :, None, None] * jnp.eye(3)[None, None]
    sharp = jax.lax.conv_general_dilated(
        img[None], k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0]
    return (1 - alpha) * img + alpha * sharp


def augment_batch(
    rng: jax.Array,
    images: jnp.ndarray,        # (B, S, S, 3) float in [0, 1]
    targets: jnp.ndarray,       # (T, 6) rows (batch_idx, cls, cx, cy, w, h)
    target_mask: jnp.ndarray,   # (T,)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Apply the full policy; returns (images, targets, target_mask)."""
    B = images.shape[0]
    keys = jax.random.split(rng, 8)
    drop_rate = jax.random.uniform(keys[0], (B,)) * 0.01
    sharp_alpha = jax.random.uniform(keys[1], (B,)) * 0.2
    angle = jax.random.uniform(keys[2], (B,), minval=-20.0, maxval=20.0)
    trans = jax.random.uniform(keys[3], (B, 2), minval=-0.2, maxval=0.2)
    bright = jax.random.uniform(keys[4], (B,), minval=-30.0, maxval=30.0) / 255.0
    hue = jax.random.uniform(keys[5], (B,), minval=-20.0, maxval=20.0) * 2.0 / 360.0
    flip = jax.random.bernoulli(keys[6], 0.5, (B,))
    drop_u = jax.random.uniform(keys[7], images.shape[:3])

    def per_image(img, dr, sa, ang, tr, br, hu, fl, du):
        img = jnp.where(du[..., None] < dr, 0.0, img)              # Dropout
        img = _sharpen(img, sa)                                     # Sharpen
        img = _affine_one(img, ang, tr[0], tr[1])                   # Affine
        img = jnp.clip(img + br, 0.0, 1.0)                          # Brightness
        hsv = _rgb_to_hsv(jnp.clip(img, 0.0, 1.0))                  # Hue
        hsv = hsv.at[..., 0].set((hsv[..., 0] + hu) % 1.0)
        img = _hsv_to_rgb(hsv)
        img = jnp.where(fl, img[:, ::-1, :], img)                   # Fliplr
        return img

    images = jax.vmap(per_image)(
        images, drop_rate, sharp_alpha, angle, trans, bright, hue, flip, drop_u
    )

    # boxes: gather per-row image transform params via batch_idx
    bidx = jnp.clip(targets[:, 0].astype(jnp.int32), 0, B - 1)
    box = _affine_boxes(targets[:, 2:6], angle[bidx], trans[bidx, 0], trans[bidx, 1])
    cx = jnp.where(flip[bidx], 1.0 - box[:, 0], box[:, 0])
    new_t = targets.at[:, 2].set(cx).at[:, 3].set(box[:, 1]) \
                   .at[:, 4].set(box[:, 2]).at[:, 5].set(box[:, 3])
    alive = (box[:, 2] > 1e-6) & (box[:, 3] > 1e-6)
    return images, new_t, target_mask & alive


__all__ = ["augment_batch"]
