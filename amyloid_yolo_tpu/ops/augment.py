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
  ~13× cheaper at 416² vs 1536² and fuses into the train step;
* the affine warp resamples with the Paeth 3-shear decomposition (three
  chained 1-D lerps) instead of 2-D bilinear: identical for pure
  translation, sub-pixel kernel differences under rotation, and ~10×
  cheaper on TPU where scattered gathers are element-serial (see
  ``_affine_shear3``; ``tools/bench_augment.py`` has the measurements).

Everything is batched and branch-free (``jnp.where`` masking) so one
compiled program serves every sample.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _rgb_to_hsv_planes(r, g, b):
    """Per-pixel RGB→HSV on separate channel planes (layout-agnostic core:
    identical arithmetic whether channels are the minor axis or a plane)."""
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
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
    return h, s, v


def _hsv_to_rgb_planes(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return r, g, b


def _rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    h, s, v = _rgb_to_hsv_planes(rgb[..., 0], rgb[..., 1], rgb[..., 2])
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    r, g, b = _hsv_to_rgb_planes(hsv[..., 0], hsv[..., 1], hsv[..., 2])
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


# ---------------------------------------------------------------------------
# 3-shear affine warp (TPU fast path for the training augmentation)
#
# The bilinear warp above costs four scattered whole-image gathers, and TPU
# gathers are element-serial: measured ~2.7 ns/fetched-element regardless
# of formulation (tools/bench_augment.py — batching the four gathers into
# one, linear-index flattening and 2x2-slice fetches are all the same or
# 3x WORSE), which made augmentation ~55% of the train step.  The Paeth
# 3-shear decomposition R(θ) = shear_x · shear_y · shear_x computes the
# same rotation+translation with three axis-aligned resampling passes,
# each a CONTIGUOUS window fetch per 16-row group (vmapped dynamic_slice)
# + a 2-tap lerp — no scattered gather at all.
#
# Divergence (documented in the module docstring): the interpolation
# kernel is three chained 1-D lerps instead of one 2-D bilinear lerp.
# For pure translation (angle=0) the two are IDENTICAL; under rotation
# the kernels differ at sub-pixel scale (both are standard rotation
# resamplers; imgaug itself is only matched in distribution, never
# bit-for-bit — RNG streams differ).  Box geometry is unaffected
# (_affine_boxes implements the exact affine map).
# ---------------------------------------------------------------------------

# Worst-case |shift| per pass as a fraction of S, for the policy bounds
# angle ∈ ±20°, translate ∈ ±0.2 (brute-forced over the corner cases of
# the closed forms below; ~0.45·S worst).  Static padding must cover it —
# dynamic_slice clamps silently, which would smear edges if exceeded.
_SHEAR_PAD_FRAC = 0.55


# Per-row dynamic_slice lowers to an XLA while loop over H rows (×B under
# vmap): measured ~6.5 ms/pass at b8@416² — iteration-count-bound, not
# bandwidth-bound.  The grouped variant below slices once per GROUP of
# consecutive rows (window widened by a small static MARGIN) and resolves
# each row's residual integer offset with a margin-tap select, cutting the
# serial loop 16× while staying bit-exact (only one tap is nonzero per
# row, and x + 0.0 is exact in f32).
_SHEAR_GROUP = 16
# Within a 16-row group, floor(shift) varies by ≤ ceil(slope·15)+1; the
# steepest pass under the policy bounds (angle ≤ 20°) has slope sin20° ≈
# 0.342 → ≤ 7.  Exceeding the contract would clip offsets and corrupt the
# resample, so callers with wilder shifts must pass group=1 (exact path).
_SHEAR_MARGIN = 8


def _shear_rows(img: jnp.ndarray, shift: jnp.ndarray, *,
                group: int = _SHEAR_GROUP) -> jnp.ndarray:
    """Resample rows at x + shift[row] (2-tap lerp, zero cval).

    img (H, W, C), shift (H,) float → (H, W, C).  Rows are fetched in
    groups of ``group`` with one contiguous dynamic_slice per group (see
    the margin contract above); ``group=1`` is the exact per-row
    reference path, used automatically when ``group`` does not divide H.
    """
    H, W, C = img.shape
    if H % group:
        group = 1
    margin = _SHEAR_MARGIN if group > 1 else 0
    G = H // group
    P = int(np.ceil(_SHEAR_PAD_FRAC * W)) + 2
    padded = jnp.pad(img, ((0, 0), (P, P + margin + 1), (0, 0)))
    k = jnp.floor(shift)
    f = shift - k
    kg = k.reshape(G, group)
    base = jnp.min(kg, axis=1)                        # (G,)
    off = jnp.clip(kg - base[:, None], 0, margin).astype(jnp.int32)
    starts = (P + base).astype(jnp.int32)
    wwin = W + margin + 1
    pg = padded.reshape(G, group, W + 2 * P + margin + 1, C)

    def grp_win(rows, st):
        return jax.lax.dynamic_slice(rows, (0, st, 0), (group, wwin, C))

    win = jax.vmap(grp_win)(pg, starts)               # (G, group, wwin, C)
    fg = f.reshape(G, group)[..., None, None]
    out = jnp.zeros((G, group, W, C), img.dtype)
    for m in range(margin + 1):
        sel = (off == m)[..., None, None]
        w0 = jnp.where(sel, 1.0 - fg, 0.0)
        w1 = jnp.where(sel, fg, 0.0)
        out = out + w0 * win[:, :, m:m + W] + w1 * win[:, :, m + 1:m + 1 + W]
    return out.reshape(H, W, C)


def _affine_shear3(img: jnp.ndarray, angle_deg: jnp.ndarray, tx: jnp.ndarray,
                   ty: jnp.ndarray) -> jnp.ndarray:
    """Same map as :func:`_affine_one` via three shear passes.

    Sampling composition (out[y,x] = img[sy, sx]):
      pass1  t1[y,x] = img[y, x + u1(y)]        u1(y) = tan(θ/2)·y + d1
      pass2  t2[y,x] = t1[y + u2(x), x]         u2(x) = −sinθ·x + d2
      pass3  out[y,x] = t2[y, x + u3(y)]        u3(y) = tan(θ/2)·y + d3
    which expands to sy = y + u2(x + u3(y)), sx = x + u3(y) + u1(sy) —
    matching the inverse rotation exactly when the constants are
      d3 = −tan(θ/2)·c,  d2 = C2 + sinθ·d3,  d1 = C1 − d3 − tan(θ/2)·C2
    with C1/C2 the constant terms of _affine_one's source map.
    """
    s = img.shape[0]
    c = (s - 1) / 2.0
    th = jnp.deg2rad(angle_deg)
    cos, sin = jnp.cos(th), jnp.sin(th)
    t2 = jnp.tan(th / 2.0)
    Tx, Ty = tx * s, ty * s
    C1 = c - cos * (c + Tx) - sin * (c + Ty)
    C2 = c + sin * (c + Tx) - cos * (c + Ty)
    d3 = -t2 * c
    d2 = C2 + sin * d3
    d1 = C1 - d3 - t2 * C2
    idx = jnp.arange(s, dtype=jnp.float32)
    out = _shear_rows(img, t2 * idx + d1)                       # pass 1 (x)
    out = jnp.swapaxes(_shear_rows(jnp.swapaxes(out, 0, 1),
                                   -sin * idx + d2), 0, 1)      # pass 2 (y)
    return _shear_rows(out, t2 * idx + d3)                      # pass 3 (x)


def _shear_rows_planar(img: jnp.ndarray, shift: jnp.ndarray, *,
                       group: int = _SHEAR_GROUP) -> jnp.ndarray:
    """Planar-layout (C, H, W) twin of :func:`_shear_rows`.

    Identical per-element arithmetic (same pads, slice positions, taps and
    margin selects — bit-exact, tests/test_augment_planar.py); the layout
    is the point: with W minor the (8,128) tile covers real pixels instead
    of padding a 3-deep channel axis 42× (the NHWC form's elementwise ops
    ran at ~1/40 of VPU bandwidth in the train trace)."""
    C, H, W = img.shape
    if H % group:
        group = 1
    margin = _SHEAR_MARGIN if group > 1 else 0
    G = H // group
    P = int(np.ceil(_SHEAR_PAD_FRAC * W)) + 2
    padded = jnp.pad(img, ((0, 0), (0, 0), (P, P + margin + 1)))
    k = jnp.floor(shift)
    f = shift - k
    kg = k.reshape(G, group)
    base = jnp.min(kg, axis=1)                        # (G,)
    off = jnp.clip(kg - base[:, None], 0, margin).astype(jnp.int32)
    starts = (P + base).astype(jnp.int32)
    wwin = W + margin + 1
    pg = padded.reshape(C, G, group, W + 2 * P + margin + 1)

    def grp_win(rows, st):                            # rows (C, group, Wp)
        return jax.lax.dynamic_slice(rows, (0, 0, st), (C, group, wwin))

    win = jax.vmap(grp_win, in_axes=(1, 0), out_axes=1)(pg, starts)
    fg = f.reshape(G, group)[None, :, :, None]        # win (C, G, group, wwin)
    out = jnp.zeros((C, G, group, W), img.dtype)
    for m in range(margin + 1):
        sel = (off == m)[None, :, :, None]
        w0 = jnp.where(sel, 1.0 - fg, 0.0)
        w1 = jnp.where(sel, fg, 0.0)
        out = out + w0 * win[:, :, :, m:m + W] + w1 * win[:, :, :, m + 1:m + 1 + W]
    return out.reshape(C, H, W)


def _affine_shear3_planar(img: jnp.ndarray, angle_deg: jnp.ndarray,
                          tx: jnp.ndarray, ty: jnp.ndarray) -> jnp.ndarray:
    """Planar (C, H, W) twin of :func:`_affine_shear3` — same shear
    constants, bit-exact vs the NHWC form."""
    s = img.shape[1]
    c = (s - 1) / 2.0
    th = jnp.deg2rad(angle_deg)
    cos, sin = jnp.cos(th), jnp.sin(th)
    t2 = jnp.tan(th / 2.0)
    Tx, Ty = tx * s, ty * s
    C1 = c - cos * (c + Tx) - sin * (c + Ty)
    C2 = c + sin * (c + Tx) - cos * (c + Ty)
    d3 = -t2 * c
    d2 = C2 + sin * d3
    d1 = C1 - d3 - t2 * C2
    idx = jnp.arange(s, dtype=jnp.float32)
    out = _shear_rows_planar(img, t2 * idx + d1)                 # pass 1 (x)
    out = jnp.swapaxes(_shear_rows_planar(jnp.swapaxes(out, 1, 2),
                                          -sin * idx + d2), 1, 2)  # pass 2 (y)
    return _shear_rows_planar(out, t2 * idx + d3)                # pass 3 (x)


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


# numpy, not jnp: a module-level device array would initialize JAX backends
# at import time, locking platform/device-count config before embedding
# processes (tests, multi-host children) can pin them.
SHARPEN_KERNEL = np.asarray(
    [[-1.0, -1.0, -1.0], [-1.0, 9.0, -1.0], [-1.0, -1.0, -1.0]], np.float32
)


def _sharpen(img: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    k = SHARPEN_KERNEL[:, :, None, None] * jnp.eye(3)[None, None]
    sharp = jax.lax.conv_general_dilated(
        img[None], k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0]
    return (1 - alpha) * img + alpha * sharp


def _sharpen_planar(img: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Planar (C, H, W) sharpen: channels ride the conv batch dim with a
    single-feature kernel — the same 9 spatial taps as :func:`_sharpen`'s
    eye-kernel form (whose cross-channel taps are exact zeros)."""
    k = SHARPEN_KERNEL[:, :, None, None]
    sharp = jax.lax.conv_general_dilated(
        img[..., None], k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[..., 0]
    return (1 - alpha) * img + alpha * sharp


def augment_batch(
    rng: jax.Array,
    images: jnp.ndarray,        # (B, S, S, 3) float in [0, 1]; (B, 3, S, S)
    targets: jnp.ndarray,       #   when layout="planar"
    target_mask: jnp.ndarray,   # targets (T, 6) (batch_idx, cls, cx, cy, w, h)
    *,
    layout: str = "nhwc",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Apply the full policy; returns (images, targets, target_mask).

    ``layout="planar"`` runs the identical policy on channel-planar images
    — per-element bit-exact vs NHWC (tests/test_augment_planar.py) but
    with W as the minor axis, so the VPU tile holds 128 real pixels
    instead of 3 channels + 125 lanes of padding.  The RNG draws are
    layout-independent (same keys, same shapes, same order)."""
    planar = layout == "planar"
    B = images.shape[0]
    S = images.shape[2]
    keys = jax.random.split(rng, 8)
    drop_rate = jax.random.uniform(keys[0], (B,)) * 0.01
    sharp_alpha = jax.random.uniform(keys[1], (B,)) * 0.2
    angle = jax.random.uniform(keys[2], (B,), minval=-20.0, maxval=20.0)
    trans = jax.random.uniform(keys[3], (B, 2), minval=-0.2, maxval=0.2)
    bright = jax.random.uniform(keys[4], (B,), minval=-30.0, maxval=30.0) / 255.0
    hue = jax.random.uniform(keys[5], (B,), minval=-20.0, maxval=20.0) * 2.0 / 360.0
    flip = jax.random.bernoulli(keys[6], 0.5, (B,))
    drop_u = jax.random.uniform(keys[7], (B, S, S))

    def per_image(img, dr, sa, ang, tr, br, hu, fl, du):
        img = jnp.where(du[..., None] < dr, 0.0, img)              # Dropout
        img = _sharpen(img, sa)                                     # Sharpen
        img = _affine_shear3(img, ang, tr[0], tr[1])                # Affine
        img = jnp.clip(img + br, 0.0, 1.0)                          # Brightness
        hsv = _rgb_to_hsv(jnp.clip(img, 0.0, 1.0))                  # Hue
        hsv = hsv.at[..., 0].set((hsv[..., 0] + hu) % 1.0)
        img = _hsv_to_rgb(hsv)
        img = jnp.where(fl, img[:, ::-1, :], img)                   # Fliplr
        return img

    def per_image_planar(img, dr, sa, ang, tr, br, hu, fl, du):
        img = jnp.where(du[None] < dr, 0.0, img)                   # Dropout
        img = _sharpen_planar(img, sa)                              # Sharpen
        img = _affine_shear3_planar(img, ang, tr[0], tr[1])         # Affine
        img = jnp.clip(img + br, 0.0, 1.0)                          # Brightness
        img = jnp.clip(img, 0.0, 1.0)
        h, s, v = _rgb_to_hsv_planes(img[0], img[1], img[2])        # Hue
        r, g, b = _hsv_to_rgb_planes((h + hu) % 1.0, s, v)
        img = jnp.stack([r, g, b])
        img = jnp.where(fl, img[:, :, ::-1], img)                   # Fliplr
        return img

    images = jax.vmap(per_image_planar if planar else per_image)(
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


__all__ = ["augment_batch"]  # _affine_one/_affine_shear3 exported for tests
