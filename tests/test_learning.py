"""Training-loop sanity: the mini model must overfit a fixed tiny batch."""

import numpy as np
import jax
import jax.numpy as jnp

from amyloid_yolo_tpu.models import darknet
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
