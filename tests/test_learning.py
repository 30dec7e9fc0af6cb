"""Training-loop sanity: the mini model must overfit a fixed tiny batch,
and the full train -> detect -> NMS -> AP loop must reach perfect AP on a
learnable synthetic scene."""

import numpy as np
import jax
import jax.numpy as jnp

from amyloid_yolo_tpu.models import darknet
from amyloid_yolo_tpu.models import heads as H
from amyloid_yolo_tpu.ops import nms as nms_ops
from amyloid_yolo_tpu.ops.boxes import xywh2xyxy_np
from amyloid_yolo_tpu.ops.metrics import ap_per_class, get_batch_statistics
from amyloid_yolo_tpu.parallel import steps as S

from minispec import mini_spec


def test_overfit_fixed_batch(rng):
    spec = mini_spec(num_classes=2, img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    opt = S.make_optimizer(1e-3)
    state = S.init_train_state(params, opt)
    step = S.make_train_step(spec, opt, augment=False)

    imgs = rng.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    t = np.zeros((8, 6), np.float32)
    t[0] = [0, 1, 0.5, 0.5, 0.25, 0.25]
    t[1] = [1, 0, 0.3, 0.3, 0.2, 0.2]
    mask = np.array([True, True] + [False] * 6)

    losses = []
    for i in range(100):
        state, metrics = step(state, jnp.asarray(imgs), jnp.asarray(t),
                              jnp.asarray(mask), jax.random.PRNGKey(i), 64)
        losses.append(float(metrics["loss"]))
    # noobj BCE dominates at init (~220); on a fixed batch the curve falls
    # steadily (measured ~224 -> 78 at step 100, -> 22 at step 200)
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
    assert np.isfinite(losses).all()
    # objectness at the assigned cells should be rising
    assert float(metrics["head0/conf_obj"] + metrics["head1/conf_obj"]
                 + metrics["head2/conf_obj"]) >= 0


def test_train_to_perfect_ap(rng):
    """End-to-end: overfit two blob images, then the full inference pipeline
    (forward -> decode -> merging NMS -> greedy TP -> AP) must reach AP 1.0
    on both classes (measured convergence: loss 223 -> ~10 by step 300)."""
    spec = mini_spec(num_classes=2, img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    opt = S.make_optimizer(1e-3)
    state = S.init_train_state(params, opt)
    step = S.make_train_step(spec, opt, augment=False)

    imgs = rng.randint(0, 100, (2, 64, 64, 3)).astype(np.uint8)
    boxes = [(0, 1, .5, .5, .25, .25), (1, 0, .3, .3, .2, .2)]
    for b, c, cx, cy, w, h in boxes:  # paint learnable blobs at the boxes
        x0, y0 = int((cx - w / 2) * 64), int((cy - h / 2) * 64)
        imgs[b, y0:y0 + int(h * 64), x0:x0 + int(w * 64)] = 220 if c == 1 else 40
    t = np.zeros((8, 6), np.float32)
    t[0], t[1] = boxes
    mask = np.array([True] * 2 + [False] * 6)

    for i in range(400):
        state, _ = step(state, jnp.asarray(imgs), jnp.asarray(t),
                        jnp.asarray(mask), jax.random.PRNGKey(i), 64)

    fwd = jax.jit(lambda p, x: H.decode_all(darknet.apply(p, spec, x)[0], spec, 64))
    pred = fwd(state.params, jnp.asarray(imgs).astype(jnp.float32) / 255.0)
    dets, valid = nms_ops.non_max_suppression(pred, 0.5, 0.5, 32)
    ragged = nms_ops.dense_to_ragged(dets, valid)
    targets = t[:2].copy()
    targets[:, 2:] = xywh2xyxy_np(targets[:, 2:]) * 64
    stats = get_batch_statistics(ragged, targets, 0.5)
    assert stats, "model produced no detections after overfitting"
    tp, sc, lb = [np.concatenate(x, 0) for x in zip(*stats)]
    _, _, ap, _, classes = ap_per_class(tp, sc, lb, t[:2, 1].tolist())
    assert list(classes) == [0, 1]
    assert (ap > 0.99).all(), ap
