"""Fused residual-block Pallas kernel vs the XLA path (interpreter mode)."""

import numpy as np
import jax.numpy as jnp

from amyloid_yolo_tpu.models.darknet import _conv, _leaky
from amyloid_yolo_tpu.pallas.conv_block import (
    fused_residual_block,
    pack_block_weights,
)


def _xla_block(x, w1, b1, w2, b2):
    h = _leaky(_conv(x, w1, 1, 0, widen_output=False) + b1)
    y = _leaky(_conv(h, w2, 1, 1, widen_output=False) + b2)
    return x + y


def test_fused_block_matches_xla_f32(rng):
    b, h, w, c, c2 = 2, 16, 24, 8, 4
    x = rng.randn(b, h, w, c).astype(np.float32)
    w1 = (0.2 * rng.randn(1, 1, c, c2)).astype(np.float32)
    b1 = rng.randn(c2).astype(np.float32)
    w2 = (0.2 * rng.randn(3, 3, c2, c)).astype(np.float32)
    b2 = rng.randn(c).astype(np.float32)

    want = _xla_block(jnp.asarray(x), jnp.asarray(w1), jnp.asarray(b1),
                      jnp.asarray(w2), jnp.asarray(b2))
    packed = pack_block_weights(w1, b1, w2, b2)
    got = fused_residual_block(jnp.asarray(x), *packed, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_block_matches_xla_bf16(rng):
    # bf16 operands, f32 accumulation — same contract as apply_folded
    b, h, w, c, c2 = 1, 8, 8, 16, 8
    x = rng.randn(b, h, w, c).astype(np.float32)
    w1 = (0.2 * rng.randn(1, 1, c, c2)).astype(np.float32)
    b1 = rng.randn(c2).astype(np.float32)
    w2 = (0.2 * rng.randn(3, 3, c2, c)).astype(np.float32)
    b2 = rng.randn(c).astype(np.float32)

    xb = jnp.asarray(x).astype(jnp.bfloat16)
    want = _xla_block(xb, jnp.asarray(w1).astype(jnp.bfloat16),
                      jnp.asarray(b1).astype(jnp.bfloat16),
                      jnp.asarray(w2).astype(jnp.bfloat16),
                      jnp.asarray(b2).astype(jnp.bfloat16))
    packed = pack_block_weights(w1, b1, w2, b2)
    got = fused_residual_block(xb, *packed, interpret=True)
    # bf16 rounding differs between the two epilogue orders; one-ulp slack
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2)


def test_apply_folded_with_pallas_packs_matches(rng):
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from minispec import mini_spec
    import jax
    from amyloid_yolo_tpu.models import darknet

    spec = mini_spec(num_classes=2, img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(3), spec)
    folded = darknet.fold_batchnorm(params, spec)
    blocks = darknet.fusible_residual_blocks(spec)
    assert len(blocks) == 4  # one residual unit per stage in the mini model

    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    want = darknet.apply_folded(folded, spec, x, compute_dtype=jnp.float32)
    packs = darknet.pack_pallas_blocks(folded, spec)
    got = darknet.apply_folded(folded, spec, x, compute_dtype=jnp.float32,
                               pallas_packs=packs, pallas_interpret=True)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-4)
