"""HTTP serving surface: micro-batched detection service (CPU, mini model).

New-capability tests (no reference counterpart); per-request semantics must
match the detect-folder path exactly — same tile-frame geometry, same
rescale/merge postprocessing (reference detect.py:88-139 semantics).
"""

import io
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from amyloid_yolo_tpu.detectors import Detector
from amyloid_yolo_tpu.serving import BatchingExecutor, DetectionServer

from minispec import mini_spec


def _png_bytes(img: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def _jpeg_bytes(img: np.ndarray, quality: int = 90) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def _post(url: str, body: bytes):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers={"Content-Type": "image/png"})
    with urllib.request.urlopen(req, timeout=300) as r:
        return r.status, json.loads(r.read())


def _get(url: str):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def server():
    spec = mini_spec(num_classes=2, img_size=64)
    from amyloid_yolo_tpu.models import darknet

    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    det = Detector(spec, params, conf_thres=0.3, nms_thres=0.4,
                   model_size=64, tile_size=256, capacity=16,
                   compute_dtype=jnp.float32)
    srv = DetectionServer(det, ["CAA", "Cored"], port=0, batch_size=4,
                          max_wait_ms=30.0)
    srv.start()
    srv.warmup()
    yield srv
    srv.stop()


def test_healthz_and_stats(server):
    assert server._stats()["calibration"] is None  # non-int8: no scales
    code, out = _get(f"http://127.0.0.1:{server.port}/healthz")
    assert code == 200 and out["status"] == "ok" and out["compiled"]
    code, out = _get(f"http://127.0.0.1:{server.port}/stats")
    assert code == 200 and out["requests"] >= 1  # warmup counted


def test_detect_matches_direct_path(server, rng):
    """A served 256² tile returns exactly the direct Detector+merge result."""
    from amyloid_yolo_tpu.ops.merge import merge_detections

    tile = rng.randint(0, 255, (256, 256, 3)).astype(np.uint8)
    code, out = _post(
        f"http://127.0.0.1:{server.port}/v1/detect", _png_bytes(tile))
    assert code == 200
    assert out["image_hw"] == [256, 256]

    expected = server.detector.detect_batch_ragged(
        np.stack([tile] * 4))[0]
    if expected is not None:
        expected = merge_detections(expected)
    got = np.array([[r["x1"], r["y1"], r["x2"], r["y2"], r["conf"],
                     r["cls_conf"], r["cls"]] for r in out["detections"]],
                   np.float32).reshape(-1, 7)
    exp = (np.zeros((0, 7), np.float32) if expected is None
           else np.asarray(expected, np.float32))
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-3)
    for r in out["detections"]:
        assert r["label"] in ("CAA", "Cored")


def test_detect_nonstandard_size_rescales(server, rng):
    """Non-tile-sized inputs come back in their own pixel space (the
    ImageFolder border-tile geometry + rescale_from_tile_frame)."""
    img = rng.randint(0, 255, (100, 80, 3)).astype(np.uint8)
    code, out = _post(
        f"http://127.0.0.1:{server.port}/v1/detect", _png_bytes(img))
    assert code == 200
    assert out["image_hw"] == [100, 80]
    for r in out["detections"]:
        # boxes live in the padded-square frame of the ORIGINAL image
        assert -1 <= r["x1"] <= 101 and -1 <= r["y2"] <= 101


def test_concurrent_requests_share_dispatches(server, rng):
    """12 simultaneous posts with batch_size=4 must run in far fewer than
    12 dispatches (micro-batching actually batches)."""
    before = server.executor.n_dispatches
    body = _png_bytes(rng.randint(0, 255, (256, 256, 3)).astype(np.uint8))
    results, errs = [], []

    def go():
        try:
            results.append(_post(
                f"http://127.0.0.1:{server.port}/v1/detect", body))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=go) for _ in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errs
    assert len(results) == 12 and all(c == 200 for c, _ in results)
    # identical input -> identical output across every request
    first = results[0][1]
    assert all(out == first for _, out in results)
    used = server.executor.n_dispatches - before
    assert used <= 8, f"expected micro-batching, got {used} dispatches"


def _post_raw(url: str, img: np.ndarray, shape_header: str = None):
    req = urllib.request.Request(
        url, data=img.tobytes(), method="POST",
        headers={"Content-Type": "application/octet-stream",
                 "X-Image-Shape": shape_header if shape_header is not None
                 else f"{img.shape[0]},{img.shape[1]}"})
    with urllib.request.urlopen(req, timeout=300) as r:
        return r.status, json.loads(r.read())


def test_raw_pixels_match_encoded_path(server, rng):
    """X-Image-Shape raw-RGB ingestion returns the EXACT same response as
    POSTing the same pixels losslessly encoded (PNG) — same tile-frame
    geometry, same pipeline, same rescale — for both an exact tile and a
    border-sized (non-square) image."""
    url = f"http://127.0.0.1:{server.port}/v1/detect"
    for shape in [(256, 256), (100, 80)]:
        img = rng.randint(0, 255, shape + (3,)).astype(np.uint8)
        code_raw, out_raw = _post_raw(url, img)
        code_png, out_png = _post(url, _png_bytes(img))
        assert code_raw == 200 and code_png == 200
        assert out_raw == out_png
        assert out_raw["image_hw"] == list(shape)
    _, stats = _get(f"http://127.0.0.1:{server.port}/stats")
    assert stats["raw_requests"] >= 2


def test_raw_pixels_bad_shape_rejected(server, rng):
    """Shape/length mismatches and malformed headers answer 400 (never a
    reshape crash), and a well-formed H,W,3 third component is accepted."""
    url = f"http://127.0.0.1:{server.port}/v1/detect"
    img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
    for hdr in ["128,64",  # length mismatch: implies 2x the body
                "64",  # malformed: one component
                "64,64,4",  # non-RGB channel count
                "64,-64", "a,b", "0,0"]:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post_raw(url, img, shape_header=hdr)
        assert ei.value.code == 400, hdr
    code, out = _post_raw(url, img, shape_header="64,64,3")
    assert code == 200 and out["image_hw"] == [64, 64]


def test_tile_frame_composed_resize_bit_identical(rng):
    """host_resize servers resize src → model_size in ONE composed nearest
    gather (never materializing the tile_size intermediate); must equal
    the explicit two-step src → tile → model chain exactly."""
    from amyloid_yolo_tpu.io.datasets import pad_to_square_np
    from amyloid_yolo_tpu.models import darknet
    from amyloid_yolo_tpu.ops.preprocess import nearest_indices

    spec = mini_spec(num_classes=2, img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    det = Detector(spec, params, model_size=64, tile_size=256,
                   host_resize=True, compute_dtype=jnp.float32)
    srv = DetectionServer(det, port=0)
    try:
        for shape in [(256, 256), (100, 80), (64, 64), (300, 300),
                      (256, 100)]:
            img = rng.randint(0, 255, shape + (3,)).astype(np.uint8)
            got = srv._to_tile_frame(img)
            ref, _ = pad_to_square_np(img)
            if ref.shape[0] != det.tile_size:
                i1 = nearest_indices(det.tile_size, ref.shape[0])
                ref = ref[i1][:, i1]
            i2 = nearest_indices(det.model_size, det.tile_size)
            ref = ref[i2][:, i2]
            assert got.shape == (64, 64, 3)
            np.testing.assert_array_equal(got, ref)
    finally:
        srv._httpd.server_close()


def test_bad_requests(server):
    code = urllib.request.urlopen(
        urllib.request.Request(
            f"http://127.0.0.1:{server.port}/healthz")).status
    assert code == 200
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"http://127.0.0.1:{server.port}/v1/detect", b"not an image")
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(f"http://127.0.0.1:{server.port}/nope")
    assert ei.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"http://127.0.0.1:{server.port}/v1/detect", b"")
    assert ei.value.code == 400


def test_decode_tile_bytes_unit(rng):
    """Native in-memory decode: bit-identical to PIL on exact tiles (full
    decode AND the nearest-gather resize), header-only rejection of other
    geometries, DCT-scaled opt-in differs (the documented non-parity)."""
    from PIL import Image

    from amyloid_yolo_tpu.io import native
    from amyloid_yolo_tpu.ops.preprocess import nearest_indices

    if not native.available():
        pytest.skip("native tile reader not built")
    tile = rng.randint(0, 255, (256, 256, 3)).astype(np.uint8)
    body = _jpeg_bytes(tile)
    pil = np.asarray(Image.open(io.BytesIO(body)).convert("RGB"))

    arr, (h, w) = native.decode_tile_bytes(body, 256)
    assert (h, w) == (256, 256)
    np.testing.assert_array_equal(arr, pil)

    arr, _ = native.decode_tile_bytes(body, 256, resize_to=64)
    idx = nearest_indices(64, 256)
    np.testing.assert_array_equal(arr, np.ascontiguousarray(pil[idx][:, idx]))

    got = native.decode_tile_bytes(body, 256, resize_to=64, scale_denom=4)
    assert got is not None and got[0].shape == (64, 64, 3)
    assert not np.array_equal(got[0], np.ascontiguousarray(pil[idx][:, idx]))

    assert native.decode_tile_bytes(
        _jpeg_bytes(tile[:100, :80]), 256) is None  # wrong geometry
    assert native.decode_tile_bytes(b"not a jpeg", 256) is None


def test_native_decode_parity_served(server, rng):
    """An exact-tile JPEG rides the native fast path (counter moves) and
    returns exactly the PIL-path result for the same bytes."""
    from PIL import Image

    from amyloid_yolo_tpu.io import native
    from amyloid_yolo_tpu.ops.merge import merge_detections

    if not native.available():
        pytest.skip("native tile reader not built")
    tile = rng.randint(0, 255, (256, 256, 3)).astype(np.uint8)
    body = _jpeg_bytes(tile)
    before = server._n_native
    code, out = _post(f"http://127.0.0.1:{server.port}/v1/detect", body)
    assert code == 200 and out["image_hw"] == [256, 256]
    assert server._n_native == before + 1

    img = np.asarray(Image.open(io.BytesIO(body)).convert("RGB"))
    expected = server.detector.detect_batch_ragged(np.stack([img] * 4))[0]
    if expected is not None:
        expected = merge_detections(expected)
    got = np.array([[r["x1"], r["y1"], r["x2"], r["y2"], r["conf"],
                     r["cls_conf"], r["cls"]] for r in out["detections"]],
                   np.float32).reshape(-1, 7)
    exp = (np.zeros((0, 7), np.float32) if expected is None
           else np.asarray(expected, np.float32))
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-3)

    # /stats surfaces the counter
    _, stats = _get(f"http://127.0.0.1:{server.port}/stats")
    assert stats["native_decodes"] == server._n_native


def test_native_decode_fallback_geometry(server, rng):
    """Non-tile-sized JPEGs are rejected at the header and take the PIL
    pad_to_square path (identical user-visible semantics)."""
    from amyloid_yolo_tpu.io import native

    if not native.available():
        pytest.skip("native tile reader not built")
    img = rng.randint(0, 255, (100, 80, 3)).astype(np.uint8)
    before = server._n_native
    code, out = _post(
        f"http://127.0.0.1:{server.port}/v1/detect", _jpeg_bytes(img))
    assert code == 200
    assert out["image_hw"] == [100, 80]
    assert server._n_native == before  # fell back, counter unmoved


def test_executor_survives_device_error(rng):
    """A failing dispatch surfaces to its waiters and the executor keeps
    serving later requests."""

    class Boom:
        def __init__(self):
            self.calls = 0

        def detect_batch_ragged(self, batch, n_valid=None):
            self.calls += 1
            if self.calls == 1:
                raise RuntimeError("injected device failure")
            return [None] * len(batch)

    ex = BatchingExecutor(Boom(), batch_size=2, max_wait_ms=1.0).start()
    try:
        tile = np.zeros((8, 8, 3), np.uint8)
        with pytest.raises(RuntimeError, match="injected"):
            ex.submit(tile, timeout=30)
        assert ex.submit(tile, timeout=30) is None
        assert ex.n_errors == 1
    finally:
        ex.stop()


def test_warmup_refuses_noise_calibration_for_int8():
    """r3 advisor (medium): with int8 precision and no calibration tiles,
    warmup() must NOT submit a synthetic-noise tile through the lazy
    calibration path — noise-calibrated scales silently degrade every real
    request and the degenerate-scale check cannot catch it (noise excites
    every layer).  It must refuse (warn + return False), deferring
    compile+calibration to the first real request."""
    spec = mini_spec(num_classes=2, img_size=64)
    from amyloid_yolo_tpu.models import darknet

    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    det = Detector(spec, params, model_size=64, tile_size=256,
                   capacity=16, precision="int8_full",
                   compute_dtype=jnp.float32)
    srv = DetectionServer(det, ["CAA", "Cored"], port=0, batch_size=2)
    srv.start()
    try:
        with pytest.warns(UserWarning, match="calibration"):
            assert srv.warmup() is False
        assert det._act_scales is None          # nothing calibrated
        assert det._fn is None                  # nothing compiled
        # with calibration tiles the same call calibrates + compiles
        calib = np.random.RandomState(1).randint(
            0, 255, (2, 256, 256, 3)).astype(np.uint8)
        assert srv.warmup(calib) is True
        assert det._act_scales is not None and det._fn is not None
    finally:
        srv.stop()


def test_timed_out_request_is_cancelled_not_dispatched():
    """A request whose submit() times out while still queued is removed from
    the queue — it must not consume a device dispatch later (under overload,
    dispatching expired entries would amplify the backlog)."""
    release = threading.Event()
    entered = threading.Event()

    class SlowDet:
        def detect_batch_ragged(self, batch, n_valid=None):
            entered.set()
            release.wait(30)
            return [None] * len(batch)

    ex = BatchingExecutor(SlowDet(), batch_size=1, max_wait_ms=1.0,
                          max_queue=8).start()
    try:
        tile = np.zeros((8, 8, 3), np.uint8)
        # pin the device with request A
        ta = threading.Thread(target=lambda: ex.submit(tile, timeout=60),
                              daemon=True)
        ta.start()
        assert entered.wait(10)
        # request B times out while queued -> must be dropped, not dispatched
        with pytest.raises(TimeoutError):
            ex.submit(tile, timeout=0.2)
        assert ex.queue_depth() == 0
        release.set()
        ta.join(30)
        deadline = time.time() + 5
        while ex.n_dispatches < 1 and time.time() < deadline:
            time.sleep(0.01)
        assert ex.n_dispatches == 1  # A only; B never reached the device
        # executor still healthy
        assert ex.submit(tile, timeout=30) is None
        assert ex.n_dispatches == 2
    finally:
        release.set()
        ex.stop()


def test_executor_sheds_on_bounded_queue():
    """r3 verdict #2: the queue is bounded — a burst past max_queue is shed
    with QueueFullError (not enqueued), counted, and the executor recovers
    as soon as the device drains."""
    from amyloid_yolo_tpu.serving import QueueFullError

    release = threading.Event()
    entered = threading.Event()

    class SlowDet:
        def detect_batch_ragged(self, batch, n_valid=None):
            entered.set()
            release.wait(30)
            return [None] * len(batch)

    ex = BatchingExecutor(SlowDet(), batch_size=2, max_wait_ms=1.0,
                          max_queue=4).start()
    try:
        tile = np.zeros((8, 8, 3), np.uint8)
        waiters = []

        def one():
            t = threading.Thread(target=lambda: ex.submit(tile, timeout=60),
                                 daemon=True)
            t.start()
            waiters.append(t)

        # pin the device: one request in flight, executor stuck in SlowDet
        one()
        assert entered.wait(10)
        # now fill the queue to exactly max_queue (the executor can't drain:
        # its thread is blocked inside detect_batch_ragged)
        for _ in range(4):
            one()
        deadline = time.time() + 10
        while ex.queue_depth() < 4 and time.time() < deadline:
            time.sleep(0.01)
        assert ex.queue_depth() == 4
        with pytest.raises(QueueFullError, match="queue full"):
            ex.submit(tile, timeout=60)
        assert ex.n_shed == 1
        release.set()
        for t in waiters:
            t.join(30)
        # drained: a fresh request is accepted again
        assert ex.submit(tile, timeout=30) is None
        assert ex.n_shed == 1
    finally:
        release.set()
        ex.stop()


def test_http_503_on_burst_and_413_on_oversize(server, rng):
    """End-to-end HTTP behavior of the production bounds: a request when
    the bounded queue is full gets 503 + Retry-After without enqueuing; an
    oversize Content-Length gets 413 before the body is read."""
    url = f"http://127.0.0.1:{server.port}/v1/detect"
    body = _jpeg_bytes((rng.rand(256, 256, 3) * 255).astype(np.uint8))

    # force "full": shrink the bound under the live depth temporarily
    old = server.executor.max_queue
    server.executor.max_queue = 0
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(url, body)
        assert ei.value.code == 503
        assert ei.value.headers.get("Retry-After") == "1"
    finally:
        server.executor.max_queue = old
    code, stats = _get(f"http://127.0.0.1:{server.port}/stats")
    assert stats["shed"] >= 1 and stats["max_queue"] == old

    # oversize: claim a huge Content-Length; server must answer 413 from
    # the header alone
    req = urllib.request.Request(url, method="POST")
    req.add_header("Content-Type", "image/jpeg")
    big = server.max_body_bytes + 1
    req.add_header("Content-Length", str(big))

    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
    conn.putrequest("POST", "/v1/detect")
    conn.putheader("Content-Length", str(big))
    conn.endheaders()
    # send only a token of the body — the server must already have answered
    conn.send(b"x" * 10)
    resp = conn.getresponse()
    assert resp.status == 413
    payload = json.loads(resp.read())
    assert "max_body_bytes" in payload["error"]
    conn.close()
    code, stats = _get(f"http://127.0.0.1:{server.port}/stats")
    assert stats["rejected_oversize"] >= 1

    # the server still works afterwards
    code, out = _post(url, body)
    assert code == 200 and "detections" in out


def test_malformed_shape_header_empty_components(server, rng):
    """'64,,64' / '64,64,,' must be 400s — empty components are NOT
    silently dropped (r4 advisor: split-then-filter accepted them)."""
    url = f"http://127.0.0.1:{server.port}/v1/detect"
    img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
    for hdr in ["64,,64", "64,64,,", ",64,64", "64,"]:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post_raw(url, img, shape_header=hdr)
        assert ei.value.code == 400, hdr


def test_max_side_guard_raw_header(server):
    """An extreme-aspect raw header (65535x1 ≈ 197 kB body) must be shed on
    the HEADER with 413 — pad_to_square would otherwise allocate
    max(H,W)²*3 ≈ 12.9 GB from a tiny request (r4 advisor, medium)."""
    assert server.max_side == server.detector.tile_size  # default bound
    url = f"http://127.0.0.1:{server.port}/v1/detect"
    body = np.zeros((65535, 1, 3), np.uint8)
    before = server.n_oversize
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post_raw(url, body, shape_header="65535,1")
    assert ei.value.code == 413
    assert server.n_oversize == before + 1
    # a max-side-sized raw request still works
    ok = np.zeros((server.max_side, 4, 3), np.uint8)
    code, out = _post_raw(url, ok)
    assert code == 200 and out["image_hw"] == [server.max_side, 4]


def test_max_side_guard_decoded_image(server, rng):
    """A decodable image whose pixel dimensions exceed max_side is a 400
    (checked on the PIL header before pixel decode)."""
    url = f"http://127.0.0.1:{server.port}/v1/detect"
    tall = np.zeros((server.max_side + 1, 2, 3), np.uint8)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(url, _png_bytes(tall))
    assert ei.value.code == 400
    wide = rng.randint(0, 255, (3, server.max_side, 3)).astype(np.uint8)
    code, out = _post(url, _png_bytes(wide))  # at the bound: accepted
    assert code == 200 and out["image_hw"] == [3, server.max_side]
