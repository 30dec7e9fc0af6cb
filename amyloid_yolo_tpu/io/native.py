"""ctypes bindings to the native tile-streaming runtime (libtilereader.so).

The C++ pool (``amyloid_yolo_tpu/runtime/tile_reader.cc``) does threaded
libjpeg decode + nearest gather straight into a caller-owned NHWC uint8
batch buffer — the native replacement for the reference's DataLoader worker
processes (PIL + torch interpolate, ``utils/datasets.py:40-62``).  Built via
``make -C amyloid_yolo_tpu/runtime`` (attempted automatically once); all
callers fall back to the PIL path when the library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_RUNTIME_DIR = os.path.join(os.path.dirname(__file__), "..", "runtime")
_LIB_PATH = os.path.abspath(os.path.join(_RUNTIME_DIR, "libtilereader.so"))

_lib = None
_build_attempted = False
_lock = threading.Lock()


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build_attempted:
            _build_attempted = True
            try:
                subprocess.run(
                    ["make", "-C", os.path.abspath(_RUNTIME_DIR)],
                    check=True, capture_output=True, timeout=240,
                )
            except Exception:
                return None
        if not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.tile_pool_create.restype = ctypes.c_void_p
        lib.tile_pool_create.argtypes = [ctypes.c_int]
        lib.tile_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.tile_pool_decode_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.tile_decode_one.restype = ctypes.c_int
        lib.tile_decode_one.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int,
        ]
        lib.tile_decode_mem.restype = ctypes.c_int
        lib.tile_decode_mem.argtypes = [
            ctypes.c_char_p, ctypes.c_ulong, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class TilePool:
    """Threaded native JPEG batch decoder."""

    def __init__(self, n_threads: Optional[int] = None):
        lib = _load()
        if lib is None:
            raise RuntimeError("libtilereader.so unavailable (build failed?)")
        self._lib = lib
        self._pool = lib.tile_pool_create(n_threads or max(os.cpu_count() or 1, 1))

    def decode_batch(self, paths: Sequence[str], tile_size: int = 1536,
                     resize_to: int = 0, scale_denom: int = 1) -> tuple:
        """Decode JPEGs → (batch (N, side, side, 3) uint8, ok mask,
        dims (N, 2) int32 ORIGINAL source (h, w)).

        ``scale_denom > 1`` enables libjpeg DCT-domain scaled decode for the
        ``resize_to`` path (≈denom²× less IDCT work; pixels are the scaled
        rendition, not bit-identical to full decode — see tile_reader.cc).
        """
        n = len(paths)
        side = resize_to or tile_size
        out = np.empty((n, side, side, 3), np.uint8)
        statuses = (ctypes.c_int * n)()
        dims = np.zeros((n, 2), np.int32)
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        self._lib.tile_pool_decode_batch(
            self._pool, c_paths, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            tile_size, resize_to, scale_denom, statuses,
            dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        ok = np.array([statuses[i] == 0 for i in range(n)])
        return out, ok, dims

    def close(self):
        if self._pool:
            self._lib.tile_pool_destroy(self._pool)
            self._pool = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def decode_one(path: str, out_h: int, out_w: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.tile_decode_one(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h, out_w)
    return out if rc == 0 else None


def decode_tile_bytes(data: bytes, tile_size: int, resize_to: int = 0,
                      scale_denom: int = 1):
    """Serving fast path: decode an in-memory JPEG that is EXACTLY
    (tile_size, tile_size) → (img uint8 (side, side, 3), (src_h, src_w))
    where side = resize_to or tile_size.

    Returns ``None`` when the library is unavailable, the JPEG is corrupt,
    or the geometry is not exactly tile-sized (the C side rejects after the
    header, so the miss costs ~nothing) — callers fall back to the general
    PIL + pad_to_square path.  ``resize_to`` applies the native nearest
    gather (bit-identical to ``ops.preprocess.nearest_indices``);
    ``scale_denom > 1`` opts into DCT-scaled decode (``fast_decode``
    semantics: the scaled rendition, NOT bit-identical).  The C call runs
    with the GIL released (ctypes CDLL), so concurrent request threads
    decode in parallel on multi-core hosts.
    """
    lib = _load()
    if lib is None:
        return None
    side = resize_to or tile_size
    out = np.empty((side, side, 3), np.uint8)
    src_h = ctypes.c_int(0)
    src_w = ctypes.c_int(0)
    rc = lib.tile_decode_mem(
        data, ctypes.c_ulong(len(data)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        tile_size, resize_to, scale_denom,
        ctypes.byref(src_h), ctypes.byref(src_w))
    if rc != 0:
        return None
    return out, (src_h.value, src_w.value)


__all__ = ["TilePool", "available", "decode_one", "decode_tile_bytes"]
