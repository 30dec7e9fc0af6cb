"""Native-resolution training on a spatial (sp × dp) mesh — worked example.

The reference downsamples every 1536² WSI tile to 416² before training and
inference (``/root/reference/utils/datasets.py`` Resize; one GPU cannot
hold native-resolution activations).  Round-4 measurements showed higher
resolution pays only when TRAINING is scale-matched (BENCH.md "Spatial
payoff"), and at 1536² those training activations need more than one chip:
this example runs the production train step with image height sharded over
the ``sp`` mesh axis and batch over ``dp``
(:func:`amyloid_yolo_tpu.parallel.spatial.shard_spatial_train_step`).
GSPMD inserts the conv halo exchanges; BatchNorm batch statistics and
gradients stay global (sync-BN — gradient-equivalent to unsharded,
``tests/test_spatial.py``).

Runs anywhere: on a host without a TPU slice it forces a virtual CPU mesh
(same code path the tests and the driver dryrun use).

Usage:
  python examples/native_res_training.py [--sp 4 --dp 2] [--img_size 512]
      [--steps 2] [--batch 2] [--mini]

The equivalent production command on a real slice is simply::

  amyolo train --spatial_shard 4 --data_parallel 2 --img_size 1536 ...
"""

from __future__ import annotations

import argparse


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sp", type=int, default=4)
    ap.add_argument("--dp", type=int, default=2)
    ap.add_argument("--img_size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--mini", action="store_true",
                    help="tiny test architecture instead of full YOLOv3 "
                         "(CPU-mesh friendly)")
    args = ap.parse_args()

    import jax

    need = args.sp * args.dp
    if len(jax.devices()) < need:
        # virtual mesh fallback (must run before any device use)
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", need)

    import jax.numpy as jnp
    import numpy as np

    from amyloid_yolo_tpu.graphspec import yolov3_spec
    from amyloid_yolo_tpu.models import darknet
    from amyloid_yolo_tpu.parallel import steps as S
    from amyloid_yolo_tpu.parallel.spatial import (
        make_spatial_mesh, shard_spatial_train_step)

    if args.mini:
        import sys

        sys.path.insert(0, "tests")
        from minispec import mini_spec

        spec = mini_spec(num_classes=2, img_size=args.img_size)
    else:
        spec = yolov3_spec(num_classes=2, img_size=args.img_size)

    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    opt = S.make_optimizer(1e-3, grad_clip_norm=10.0)
    state = S.init_train_state(params, opt)
    mesh = make_spatial_mesh(args.sp, args.dp)
    print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} devices")
    step = shard_spatial_train_step(
        S.make_train_step(spec, opt, augment=True, compute_dtype=jnp.float32),
        mesh)

    rng = np.random.RandomState(0)
    B, cap = args.batch, 8
    targets = np.zeros((B * cap, 6), np.float32)
    mask = np.zeros((B * cap,), bool)
    for b in range(B):
        targets[b * cap] = [b, b % 2, 0.5, 0.5, 0.2, 0.2]
        mask[b * cap] = True

    for i in range(args.steps):
        imgs = rng.randint(0, 255, (B, args.img_size, args.img_size, 3))
        state, metrics = step(
            state, jnp.asarray(imgs, jnp.uint8), jnp.asarray(targets),
            jnp.asarray(mask), jax.random.PRNGKey(i), args.img_size)
        print(f"step {i}: loss={float(metrics['loss']):.4f}")
    print("ok")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
