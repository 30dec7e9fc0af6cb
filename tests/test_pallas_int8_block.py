"""Strip-mined fused int8 residual block: bit-identity vs the integer-math
reference in Pallas interpret mode (CPU), across strip counts and edge
cases.  Device timing lives in ``tools/bench_int8_block.py`` (BENCH.md
records the A/B outcome)."""

import numpy as np
import jax.numpy as jnp
import pytest

from amyloid_yolo_tpu.pallas.int8_block import (
    fused_residual_block_int8, pack_int8_block, reference_block_int8)


def _make_unit(rng, C, C2):
    w1q = rng.randint(-127, 128, (1, 1, C, C2)).astype(np.int8)
    w2q = rng.randint(-127, 128, (3, 3, C2, C)).astype(np.int8)
    ws1 = rng.uniform(1e-3, 2e-2, C2).astype(np.float32)
    ws2 = rng.uniform(1e-3, 2e-2, C).astype(np.float32)
    b1 = rng.uniform(-1, 1, C2).astype(np.float32)
    b2 = rng.uniform(-1, 1, C).astype(np.float32)
    return pack_int8_block(w1q, ws1, b1, w2q, ws2, b2)


@pytest.mark.parametrize("H,W,C,C2,strip", [
    (16, 16, 128, 64, 8),    # two strips
    (16, 16, 128, 64, 16),   # single strip (both halos masked)
    (24, 16, 64, 32, 8),     # three strips, small channels
])
def test_fused_matches_reference_bitexact(H, W, C, C2, strip):
    rng = np.random.RandomState(0)
    w1p, ws1, b1p, w2p, ws2, b2p = _make_unit(rng, C, C2)
    sx, s1, s_out = 0.011, 0.017, 0.023
    a1p = ws1 * sx
    a2p = ws2 * s1
    xq = jnp.asarray(rng.randint(-127, 128, (2, H, W, C)).astype(np.int8))

    got = fused_residual_block_int8(
        xq, w1p, a1p, b1p, w2p, a2p, b2p,
        sx=sx, s1=s1, s_out=s_out, strip=strip, interpret=True)
    want = reference_block_int8(
        xq, w1p, a1p, b1p, w2p, a2p, b2p, sx=sx, s1=s1, s_out=s_out)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_strip_must_divide_height():
    rng = np.random.RandomState(1)
    w1p, ws1, b1p, w2p, ws2, b2p = _make_unit(rng, 64, 32)
    xq = jnp.zeros((1, 20, 16, 64), jnp.int8)
    with pytest.raises(ValueError, match="strip"):
        fused_residual_block_int8(
            xq, w1p, ws1 * 0.01, b1p, w2p, ws2 * 0.01, b2p,
            sx=0.01, s1=0.01, s_out=0.01, strip=8, interpret=True)
