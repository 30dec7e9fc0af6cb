"""Background-tile suppression (io.tissue): heuristics, the two-stage
prefilter, crop-time skip, and the sweep/detect integration.

New capability (r3 verdict #1) — the reference sweeps every tile
(``/root/reference/validation.py:30-175``); suppression is accuracy-gated
and default-off everywhere (``tools/background_gate.py`` is the gate of
record on the 200 real prospective images).
"""

import os

import numpy as np
import pytest
from PIL import Image

from amyloid_yolo_tpu.io.tissue import (
    BACKGROUND_MAX_BPP, TISSUE_MIN_FRACTION, is_background_file,
    prefilter_tile_paths, tissue_fraction,
)


def _save(tmp_path, name, arr, quality=90):
    p = str(tmp_path / name)
    Image.fromarray(arr).save(p, quality=quality)
    return p


def _blank(side=512, value=245):
    return np.full((side, side, 3), value, np.uint8)


def _scanner_background(side=512, seed=0):
    """Smooth off-white with gentle illumination gradient (what glass
    actually scans as — compresses small, unlike iid noise)."""
    yy, xx = np.mgrid[0:side, 0:side]
    base = 242 + 6 * np.sin(yy / side * 3.1) + 4 * np.cos(xx / side * 2.7)
    img = np.stack([base, base, base - 2], -1)
    return np.clip(img, 0, 255).astype(np.uint8)


def _tissue(side=512, seed=1, coverage=0.5):
    """Stained-tissue look-alike: tan/brown blobs over background."""
    rng = np.random.RandomState(seed)
    img = _scanner_background(side, seed)
    yy, xx = np.mgrid[0:side, 0:side]
    n = max(1, int(coverage * 24))
    for _ in range(n):
        cy, cx = rng.randint(0, side, 2)
        r = rng.randint(side // 10, side // 4)
        m = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
        img[m] = [
            rng.randint(120, 190), rng.randint(90, 150), rng.randint(60, 120)]
    return img


def test_tissue_fraction_extremes():
    assert tissue_fraction(_blank()) == 0.0
    assert tissue_fraction(_scanner_background()) < 0.01
    assert tissue_fraction(_tissue(coverage=0.8)) > 0.2
    # subsample stride is area-stable
    t = _tissue(coverage=0.5)
    assert abs(tissue_fraction(t, 4) - tissue_fraction(t, 1)) < 0.05


def test_two_stage_prefilter(tmp_path):
    bg = _save(tmp_path, "bg.jpg", _scanner_background())
    blank = _save(tmp_path, "blank.jpg", _blank())
    tissue = _save(tmp_path, "tissue.jpg", _tissue(coverage=0.8))
    # the dangerous case: LOW-ENTROPY tissue whose file is as small as
    # background — one faint blob on glass.  Stage 1 (size) flags it as a
    # candidate; stage 2 (decode-confirm) must KEEP it.
    faint = _scanner_background()
    faint[200:320, 200:320] = [150, 120, 90]
    faint_p = _save(tmp_path, "faint.jpg", faint)
    assert os.path.getsize(faint_p) < BACKGROUND_MAX_BPP * 512 * 512, \
        "fixture must exercise stage 2"

    assert is_background_file(bg)
    assert is_background_file(blank)
    assert not is_background_file(tissue)
    assert not is_background_file(faint_p)

    kept, skipped = prefilter_tile_paths([bg, blank, tissue, faint_p])
    assert set(kept) == {tissue, faint_p}
    assert set(skipped) == {bg, blank}

    # unreadable file: NOT background (pipeline surfaces the error itself)
    broken = str(tmp_path / "broken.jpg")
    open(broken, "wb").write(b"nope")
    assert not is_background_file(broken)


def test_crop_time_skip(tmp_path):
    from amyloid_yolo_tpu.io.tiles import tile_image_array, tile_origin

    side = 256
    # 2x2 tile grid: one tissue quadrant, three background
    img = np.tile(_scanner_background(side), (2, 2, 1))
    img[:side, :side] = _tissue(side, coverage=0.8)
    skipped = []
    paths = tile_image_array(img, str(tmp_path), "wsi", tile_size=side,
                             min_tissue_fraction=0.02, skipped_out=skipped)
    assert len(paths) == 1 and len(skipped) == 3
    assert tile_origin(paths[0], side) == (0, 0)
    # default writes everything (reference behavior)
    paths_all = tile_image_array(img, str(tmp_path), "wsi_all", tile_size=side)
    assert len(paths_all) == 4


def test_detect_folder_background_skip(tmp_path, monkeypatch):
    """detect_folder(background_skip=True): skipped tiles come back as
    None results and are never decoded at full size."""
    import jax.numpy as jnp
    import jax

    from amyloid_yolo_tpu.detectors import Detector
    from amyloid_yolo_tpu.models import darknet
    from minispec import mini_spec

    side = 256
    t_path = _save(tmp_path, "a_tissue.jpg", _tissue(side, coverage=0.8))
    b_path = _save(tmp_path, "b_bg.jpg", _scanner_background(side))

    spec = mini_spec(num_classes=2, img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    det = Detector(spec, params, conf_thres=0.3, model_size=64,
                   tile_size=side, capacity=8, compute_dtype=jnp.float32)
    res = det.detect_folder(str(tmp_path), batch_size=2,
                            background_skip=True)
    assert set(res) == {t_path, b_path}
    assert res[b_path] is None  # skipped, present with no detections


def test_sweep_background_skip(tmp_path):
    """Sweep integration: skipped tiles still get zero-count entries (the
    reference records every tile), counts unchanged for kept tiles."""
    from amyloid_yolo_tpu.analysis.validation import (
        calculate_plaque_counts_per_wsi)

    side = 256
    root = tmp_path / "tiles"
    d = root / "WSI_1" / "0" / "0"
    d.mkdir(parents=True)
    _save(d, "0.jpg", _tissue(side, coverage=0.8))
    _save(d, "1.jpg", _scanner_background(side))

    class StubDetector:
        tile_size = side
        overflow_images = 0

        def detect_batch_ragged(self, batch, n_valid=None):
            out = []
            for im in batch:
                # one fake Cored detection per visibly-stained tile
                if tissue_fraction(np.asarray(im)) > 0.1:
                    out.append(np.array(
                        [[10, 10, 60, 60, 0.9, 0.9, 1.0]], np.float32))
                else:
                    out.append(None)
            return out

    counts = calculate_plaque_counts_per_wsi(
        str(root), StubDetector(), caa_filter=None,
        pickles_dir=str(tmp_path / "pk"), batch_size=2,
        background_skip=True)
    assert counts["WSI_1"] == {"Cored": 1, "CAA": 0}
    import pickle

    with open(tmp_path / "pk" / "CERAD_1536_plaque_counts_dictionary.pkl",
              "rb") as fh:
        tiles = pickle.load(fh)
    # both tiles present: the kept one with its count, the skipped one at 0
    assert len(tiles["WSI_1"]) == 2
    assert sorted(v["Cored"] for v in tiles["WSI_1"].values()) == [0, 1]
