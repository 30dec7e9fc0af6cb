"""Robustness fuzz battery for the native JPEG decoder (tile_reader.cc).

``tile_decode_mem`` is network-facing (it decodes POST bodies for
``amyolo serve``; serving.py:_detect_one), so adversarial bytes must never
crash the process or leak memory.  This battery drives the raw C ABI via
ctypes (no package import needed) with:

* systematic truncations of a valid tile JPEG (libjpeg treats premature EOF
  as a warning + fake EOI, so many of these "succeed" with a grey tail —
  the assertion is no-crash and a defined status, not failure);
* random single-byte corruption at seeded offsets across the stream
  (header, tables, entropy data);
* garbage / empty / header-only inputs (must return nonzero);
* wrong-geometry rejection (status 3 straight after the header);
* a memory bound: thousands of mixed corrupt decodes must not grow RSS
  (regression guard for the round-3 advisor finding — a longjmp over the
  scanline buffer's scope leaked ~width*3 bytes per corrupt request).

The threaded pool path gets the same mixed battery through
``tile_pool_decode_batch`` with per-file statuses checked.
"""

import ctypes
import io
import os

import numpy as np
import pytest
from PIL import Image

LIB = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "amyloid_yolo_tpu",
                 "runtime", "libtilereader.so"))

pytestmark = pytest.mark.skipif(
    not os.path.exists(LIB), reason="native tile reader not built")


@pytest.fixture(scope="module")
def lib():
    lib = ctypes.CDLL(LIB)
    lib.tile_decode_mem.restype = ctypes.c_int
    lib.tile_decode_mem.argtypes = [
        ctypes.c_char_p, ctypes.c_ulong, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.tile_pool_create.restype = ctypes.c_void_p
    lib.tile_pool_create.argtypes = [ctypes.c_int]
    lib.tile_pool_destroy.argtypes = [ctypes.c_void_p]
    lib.tile_pool_decode_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    return lib


SIDE = 512  # small tile keeps the battery fast; geometry logic is size-blind


@pytest.fixture(scope="module")
def valid_jpeg():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (SIDE, SIDE, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90)
    return buf.getvalue()


def _decode_mem(lib, data: bytes, tile=SIDE, resize=0, denom=1):
    side = resize or tile
    out = np.empty((side, side, 3), np.uint8)
    sh, sw = ctypes.c_int(0), ctypes.c_int(0)
    rc = lib.tile_decode_mem(
        data, ctypes.c_ulong(len(data)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        tile, resize, denom, ctypes.byref(sh), ctypes.byref(sw))
    return rc, out


def _rss_kb():
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * os.sysconf("SC_PAGESIZE") // 1024


def test_valid_roundtrip(lib, valid_jpeg):
    rc, out = _decode_mem(lib, valid_jpeg)
    assert rc == 0
    ref = np.asarray(Image.open(io.BytesIO(valid_jpeg)).convert("RGB"))
    np.testing.assert_array_equal(out, ref)


def test_truncations_do_not_crash(lib, valid_jpeg):
    n = len(valid_jpeg)
    for frac in range(1, 50):
        cut = max(1, n * frac // 50)
        rc, _ = _decode_mem(lib, valid_jpeg[:cut])
        assert rc in (0, 1, 2, 3)


def test_bitflips_do_not_crash(lib, valid_jpeg):
    rng = np.random.RandomState(0)
    data = bytearray(valid_jpeg)
    for _ in range(200):
        pos = int(rng.randint(0, len(data)))
        old = data[pos]
        data[pos] = int(rng.randint(0, 256))
        rc, _ = _decode_mem(lib, bytes(data))
        assert rc in (0, 1, 2, 3)
        data[pos] = old


def test_garbage_inputs_rejected(lib):
    rng = np.random.RandomState(1)
    assert _decode_mem(lib, b"")[0] != 0
    assert _decode_mem(lib, b"\xff\xd8")[0] != 0          # SOI only
    assert _decode_mem(lib, b"not a jpeg at all")[0] != 0
    for size in (16, 256, 4096):
        rc, _ = _decode_mem(lib, rng.bytes(size))
        assert rc != 0


def test_wrong_geometry_rejected_cheaply(lib, valid_jpeg):
    rc, _ = _decode_mem(lib, valid_jpeg, tile=SIDE * 2)
    assert rc == 3


def test_corrupt_decode_memory_bound(lib, valid_jpeg):
    """Thousands of corrupt decodes must not grow RSS (leak regression)."""
    n = len(valid_jpeg)
    rng = np.random.RandomState(2)
    payloads = [valid_jpeg[: max(1, n * f // 17)] for f in range(1, 17)]
    data = bytearray(valid_jpeg)
    for _ in range(16):
        p = int(rng.randint(2, n))  # preserve SOI so decode gets further
        data[p] ^= 0xFF
        payloads.append(bytes(data))
    # warm allocator pools before measuring
    for p in payloads:
        _decode_mem(lib, p)
    rss0 = _rss_kb()
    for i in range(3000):
        _decode_mem(lib, payloads[i % len(payloads)])
    growth = _rss_kb() - rss0
    # a per-corrupt-request scanline-buffer leak would be ≥ 3000*SIDE*3/1024
    # ≈ 4.5 MB here; allow allocator noise well below that
    assert growth < 3000, f"RSS grew {growth} KB over 3000 corrupt decodes"


def test_pool_batch_mixed_statuses(lib, valid_jpeg, tmp_path):
    good = tmp_path / "good.jpg"
    good.write_bytes(valid_jpeg)
    trunc = tmp_path / "trunc.jpg"
    trunc.write_bytes(valid_jpeg[: len(valid_jpeg) // 20])
    garbage = tmp_path / "garbage.jpg"
    garbage.write_bytes(b"\x00" * 1000)
    missing = tmp_path / "missing.jpg"

    paths = [str(good), str(garbage), str(missing), str(good), str(trunc)]
    n = len(paths)
    pool = lib.tile_pool_create(2)
    try:
        out = np.empty((n, SIDE, SIDE, 3), np.uint8)
        statuses = (ctypes.c_int * n)()
        dims = np.zeros((n, 2), np.int32)
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        lib.tile_pool_decode_batch(
            pool, c_paths, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            SIDE, 0, 1, statuses,
            dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        st = [statuses[i] for i in range(n)]
        ref = np.asarray(Image.open(io.BytesIO(valid_jpeg)).convert("RGB"))
        assert st[0] == 0 and st[3] == 0
        np.testing.assert_array_equal(out[0], ref)
        np.testing.assert_array_equal(out[3], ref)
        assert st[1] != 0 and st[2] != 0  # garbage, missing
        assert st[4] in (0, 1, 2)         # truncation: defined, no crash
    finally:
        lib.tile_pool_destroy(pool)
