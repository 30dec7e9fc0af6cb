"""Target assignment + YOLO loss parity against the torch oracle."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from amyloid_yolo_tpu.graphspec import YoloSpec
from amyloid_yolo_tpu.models.heads import head_grid_tensors
from amyloid_yolo_tpu.ops.loss import yolo_head_loss
from amyloid_yolo_tpu.ops.targets import build_targets

import torch_mirror as tm

YOLO = YoloSpec(index=0, anchors=((10, 13), (16, 30), (33, 23)), num_classes=2)


def random_case(rng, b=2, g=8, n_t=6, img=64):
    raw = rng.randn(b, g, g, 3 * 7).astype(np.float32) * 0.5
    t = np.zeros((n_t, 6), np.float32)
    t[:, 0] = rng.randint(0, b, n_t)
    t[:, 1] = rng.randint(0, 2, n_t)
    t[:, 2:4] = rng.rand(n_t, 2) * 0.9 + 0.05
    t[:, 4:6] = rng.rand(n_t, 2) * 0.3 + 0.05
    return raw, t


def torch_tensors(raw, img):
    """NHWC raw -> the torch oracle's NCHW input."""
    return torch.from_numpy(raw.transpose(0, 3, 1, 2)).double()


def test_build_targets_matches_torch(rng):
    raw, t = random_case(rng)
    ht = head_grid_tensors(jnp.asarray(raw), YOLO.anchors, 64, 2)
    mask = jnp.ones((t.shape[0],), bool)
    bt = build_targets(ht["pred_boxes"], ht["cls"], jnp.asarray(t), mask,
                       ht["scaled_anchors"], YOLO.ignore_thres)

    res = tm.yolo_head_loss_torch(torch_tensors(raw, 64), YOLO, 64,
                                  torch.from_numpy(t).double())
    np.testing.assert_array_equal(np.asarray(bt["obj_mask"]), res["obj_mask"].numpy())
    np.testing.assert_array_equal(np.asarray(bt["noobj_mask"]), res["noobj_mask"].numpy())
    for k in ["tx", "ty", "tw", "th"]:
        np.testing.assert_allclose(np.asarray(bt[k]), res[k].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bt["tcls"]), res["tcls"].numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(bt["iou_scores"]), res["iou_scores"].numpy(),
                               rtol=1e-4, atol=1e-5)


def test_build_targets_padded_rows_dropped(rng):
    raw, t = random_case(rng, n_t=4)
    ht = head_grid_tensors(jnp.asarray(raw), YOLO.anchors, 64, 2)
    # pad with garbage rows that must not affect the result
    t_pad = np.concatenate([t, np.full((3, 6), 0.5, np.float32)], axis=0)
    mask = jnp.asarray([True] * 4 + [False] * 3)
    bt_pad = build_targets(ht["pred_boxes"], ht["cls"], jnp.asarray(t_pad), mask,
                           ht["scaled_anchors"], YOLO.ignore_thres)
    bt = build_targets(ht["pred_boxes"], ht["cls"], jnp.asarray(t),
                       jnp.ones((4,), bool), ht["scaled_anchors"], YOLO.ignore_thres)
    for k in ["obj_mask", "noobj_mask", "tx", "tw", "tcls"]:
        np.testing.assert_array_equal(np.asarray(bt_pad[k]), np.asarray(bt[k]))


def test_same_cell_collision_last_writer(rng):
    """Two GTs in the same cell with the same best anchor: the later one's
    regression targets win (torch-CPU semantics)."""
    raw = rng.randn(1, 8, 8, 21).astype(np.float32)
    t = np.array([
        [0, 0, 0.52, 0.52, 0.10, 0.10],
        [0, 1, 0.53, 0.53, 0.11, 0.11],
    ], np.float32)
    ht = head_grid_tensors(jnp.asarray(raw), YOLO.anchors, 64, 2)
    bt = build_targets(ht["pred_boxes"], ht["cls"], jnp.asarray(t),
                       jnp.ones((2,), bool), ht["scaled_anchors"], YOLO.ignore_thres)
    res = tm.yolo_head_loss_torch(torch_tensors(raw, 64), YOLO, 64,
                                  torch.from_numpy(t).double())
    np.testing.assert_allclose(np.asarray(bt["tx"]), res["tx"].numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bt["tw"]), res["tw"].numpy(), rtol=1e-5, atol=1e-6)
    # both classes set in tcls at the shared cell
    np.testing.assert_allclose(np.asarray(bt["tcls"]), res["tcls"].numpy(), atol=1e-6)


def test_loss_matches_torch(rng):
    raw, t = random_case(rng, b=2, g=8, n_t=8)
    total, metrics = yolo_head_loss(jnp.asarray(raw), YOLO, 64,
                                    jnp.asarray(t), jnp.ones((t.shape[0],), bool))
    res = tm.yolo_head_loss_torch(torch_tensors(raw, 64), YOLO, 64,
                                  torch.from_numpy(t).double())
    np.testing.assert_allclose(float(total), float(res["total"]), rtol=1e-4)
    for k in ["x", "y", "w", "h", "conf", "cls"]:
        np.testing.assert_allclose(float(metrics[k]), float(res[k]), rtol=1e-4, atol=1e-6)


def test_loss_zero_targets_finite():
    """Empty-target batches give a finite loss (documented divergence from
    torch's NaN empty-mean)."""
    raw = np.zeros((1, 8, 8, 21), np.float32)
    t = np.zeros((1, 6), np.float32)
    total, _ = yolo_head_loss(jnp.asarray(raw), YOLO, 64,
                              jnp.asarray(t), jnp.zeros((1,), bool))
    assert np.isfinite(float(total))


def test_loss_grad_finite(rng):
    raw, t = random_case(rng)

    def f(r):
        total, _ = yolo_head_loss(r, YOLO, 64, jnp.asarray(t),
                                  jnp.ones((t.shape[0],), bool))
        return total

    g = jax.grad(f)(jnp.asarray(raw))
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.parametrize("seed", range(4))
def test_dense_form_bit_identical_to_scatter(seed):
    """The dense (compare-reduction) assignment must reproduce the scatter
    form bit-for-bit — winner election, collisions, ignore mask, padded
    rows, every output tensor."""
    r = np.random.RandomState(100 + seed)
    raw, t = random_case(r, b=3, g=13, n_t=24)
    # force same-cell collisions and duplicate rows
    t[5] = t[0]
    t[6, 2:4] = t[1, 2:4]
    ht = head_grid_tensors(jnp.asarray(raw), YOLO.anchors, 104, 2)
    mask = jnp.asarray(r.rand(24) > 0.2)
    kw = dict(target=jnp.asarray(t), target_mask=mask,
              anchors=ht["scaled_anchors"], ignore_thres=YOLO.ignore_thres)
    a = build_targets(ht["pred_boxes"], ht["cls"], form="scatter", **kw)
    d = build_targets(ht["pred_boxes"], ht["cls"], form="dense", **kw)
    assert set(a) == set(d)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(d[k]),
                                      err_msg=k)


def test_dense_form_matches_torch(rng):
    raw, t = random_case(rng)
    ht = head_grid_tensors(jnp.asarray(raw), YOLO.anchors, 64, 2)
    mask = jnp.ones((t.shape[0],), bool)
    bt = build_targets(ht["pred_boxes"], ht["cls"], jnp.asarray(t), mask,
                       ht["scaled_anchors"], YOLO.ignore_thres, form="dense")
    res = tm.yolo_head_loss_torch(torch_tensors(raw, 64), YOLO, 64,
                                  torch.from_numpy(t).double())
    np.testing.assert_array_equal(np.asarray(bt["obj_mask"]),
                                  res["obj_mask"].numpy())
    np.testing.assert_array_equal(np.asarray(bt["noobj_mask"]),
                                  res["noobj_mask"].numpy())
    for k in ["tx", "ty", "tw", "th"]:
        np.testing.assert_allclose(np.asarray(bt[k]), res[k].numpy(),
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bt["tcls"]), res["tcls"].numpy(),
                               atol=1e-6)
