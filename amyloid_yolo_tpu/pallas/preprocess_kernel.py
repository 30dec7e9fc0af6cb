"""Pallas TPU kernel: fused letterbox nearest-resize + normalize.

The XLA lowering of ``resize_nearest`` (two ``jnp.take`` gathers) plus the
``/255`` cast materializes intermediates and runs ~8 ms for a (16, 1536²)
uint8 batch on v5e — ~40x over the HBM-bound floor.  This kernel does the
whole stage in one pass:

  * grid over (batch, output-row-tiles);
  * for each output row tile, DMA only the *needed* source rows from the
    1536² uint8 tile in HBM (nearest row indices are a static gather — they
    are computed at trace time and baked into the index map);
  * gather columns with a one-hot matmul on the MXU (uint8→f32 promote),
    which doubles as the /255 normalize via a prescaled selection matrix.

The column gather as a matmul is the TPU trick: a (src_w, dst_w) selection
matrix S with S[src, dst] = 1/255 at the nearest-source positions turns
``row_f32 = gather(row_u8) / 255`` into ``row_u8 @ S`` — dense MXU work
instead of scalar gathers the VPU hates.

Numerical parity: exact — the selection matrix picks exactly the
floor(dst*in/out) source element; 1/255 scaling in f32 matches the
reference's ToTensor (``utils/transforms.py:89-101``) to the ulp because
each output is a single scaled uint8 value.

Status: EXPERIMENTAL.  Validated bit-exact against the XLA path in
interpreter mode (tests/test_pallas_kernels.py).  On the current axon
remote-compile toolchain the Mosaic build of the (B × row-tiles) grid is
prohibitively slow, and the XLA lowering of the same stage already runs at
~2.3 ms per 16×1536² batch on v5e, so the production Detector keeps the XLA
path; revisit when compiling against a local libtpu.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.preprocess import nearest_indices


def _selection_matrix(src: int, dst: int, scale: float) -> np.ndarray:
    idx = nearest_indices(dst, src)
    s = np.zeros((src, dst), np.float32)
    s[idx, np.arange(dst)] = scale
    return s


def _kernel(rows_ref, sel_ref, out_ref):
    # rows_ref: (1, ROWS_PER_TILE, src_w, 3) uint8 source rows (already the
    # nearest rows for this output tile, via the index map)
    # sel_ref: (src_w, dst_w) f32 selection/scale matrix
    # out_ref: (1, ROWS_PER_TILE, dst_w, 3) f32
    # Mosaic can't cast uint8->f32 directly: bitcast to int8 and fix the
    # sign wrap (v in 128..255 reads as v-256)
    as_i8 = pltpu.bitcast(rows_ref[0], jnp.int8)
    rows = as_i8.astype(jnp.float32)
    rows = jnp.where(rows < 0, rows + 256.0, rows)  # (R, src_w, 3)
    r, sw, c = rows.shape
    # (R*3, src_w) @ (src_w, dst_w) on the MXU
    rows_t = rows.transpose(0, 2, 1).reshape(r * c, sw)
    out = jnp.dot(rows_t, sel_ref[:], preferred_element_type=jnp.float32)
    out_ref[0] = out.reshape(r, c, -1).transpose(0, 2, 1)


@functools.partial(jax.jit, static_argnames=("dst", "rows_per_tile", "interpret"))
def resize_normalize(tiles_u8: jnp.ndarray, dst: int = 416,
                     rows_per_tile: int = 8, interpret: bool = False) -> jnp.ndarray:
    """(B, S, S, 3) uint8 → (B, dst, dst, 3) f32 in [0, 1], fused.

    Equivalent to ``preprocess_tiles`` (ops/preprocess.py) — used by the
    Detector when ``pallas_preprocess=True``.
    """
    b, src = tiles_u8.shape[0], tiles_u8.shape[1]
    assert dst % rows_per_tile == 0
    row_idx = nearest_indices(dst, src)
    sel = jnp.asarray(_selection_matrix(src, dst, 1.0 / 255.0))

    # source rows for each output tile: static gather baked into a
    # pre-gathered array view handled by BlockSpec index_map over a
    # row-gathered input (one jnp.take on rows only — cheap, contiguous)
    rows_gathered = jnp.take(tiles_u8, jnp.asarray(row_idx), axis=1)

    n_row_tiles = dst // rows_per_tile

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, dst, dst, 3), jnp.float32),
        grid=(b, n_row_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, rows_per_tile, src, 3),
                lambda i, j: (i, j, 0, 0),
            ),
            pl.BlockSpec((src, dst), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, rows_per_tile, dst, 3),
            lambda i, j: (i, j, 0, 0),
        ),
        interpret=interpret,
    )(rows_gathered, sel)
    return out


__all__ = ["resize_normalize"]
