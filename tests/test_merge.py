"""Union-merge semantics, including the reference's pixel-set quirks."""

import numpy as np

from amyloid_yolo_tpu.ops.merge import (
    combine_if_overlapping, combine_overlapping_bboxes, merge_detections,
)


def pixel_set_overlap(b1, b2):
    """Direct transcription of the reference's O(area) pixel-set test
    (core.py:326-364) as ground truth for the rectangle math."""
    x1, y1, w1, h1 = b1
    x2, y2, w2, h2 = b2
    p1 = {(x, y) for x in range(x1, x1 + w1) for y in range(y1, y1 + h1)}
    p2 = {(x, y) for x in range(x2, x2 + w2) for y in range(y2, y2 + h2)}
    inter = p1 & p2
    if not inter:
        return False, None
    allp = p1 | p2
    xs = [p[0] for p in allp]
    ys = [p[1] for p in allp]
    return True, (min(xs), min(ys), max(xs) - min(xs), max(ys) - min(ys))


def test_combine_matches_pixel_sets(rng):
    for _ in range(200):
        b1 = tuple(int(v) for v in rng.randint(0, 30, 2)) + tuple(int(v) for v in rng.randint(1, 15, 2))
        b2 = tuple(int(v) for v in rng.randint(0, 30, 2)) + tuple(int(v) for v in rng.randint(1, 15, 2))
        got = combine_if_overlapping(b1, b2)
        want = pixel_set_overlap(b1, b2)
        assert got[0] == want[0]
        if got[0]:
            assert got[1] == want[1]


def test_touching_boxes_do_not_merge():
    # pixel ranges [0,10) and [10,20): disjoint — the reference would not merge
    assert combine_if_overlapping((0, 0, 10, 10), (10, 0, 10, 10))[0] is False
    # one-pixel overlap: [0,10) and [9,19)
    ok, nb = combine_if_overlapping((0, 0, 10, 10), (9, 0, 10, 10))
    assert ok and nb == (0, 0, 18, 9)  # the reference's -1px union quirk


def test_merge_detections_basic():
    dets = np.array([
        [100, 100, 140, 140, 0.9, 0.95, 1.0],
        [130, 130, 170, 170, 0.7, 0.80, 1.0],
        [400, 400, 420, 420, 0.85, 0.9, 1.0],
        [100, 100, 140, 140, 0.6, 0.7, 0.0],  # other class overlapping
    ], np.float32)
    out = merge_detections(dets)
    assert out.shape == (3, 7)
    merged = [r for r in out if r[0] == 100 and r[6] == 1.0][0]
    # union minus 1px: x2 = max(140,170)-1 = 169
    assert merged[2] == 169 and merged[3] == 169
    assert np.isclose(merged[4], 0.7) and np.isclose(merged[5], 0.8)  # min conf propagation


def test_merge_to_fixed_point_chain():
    """a-b overlap, merged(ab)-c overlap only after merging: needs 2 passes."""
    dets = np.array([
        [0, 0, 10, 10, 0.9, 0.9, 1.0],
        [8, 0, 18, 10, 0.8, 0.8, 1.0],
        [16, 0, 26, 10, 0.7, 0.7, 1.0],
    ], np.float32)
    out = merge_detections(dets)
    assert out.shape == (1, 7)
    assert out[0, 4] == np.float32(0.7)


def test_merge_empty():
    out = merge_detections(np.zeros((0, 7), np.float32))
    assert out.shape == (0, 7)


def test_combine_overlapping_bboxes_label_rule():
    mapp = {
        "img": [
            ((0, 0, 10, 10), (1, 0, 0)),
            ((5, 5, 10, 10), (1, 0, 1)),
            ((100, 100, 10, 10), (0, 0, 1)),
        ]
    }
    out = combine_overlapping_bboxes(mapp)
    assert len(out["img"]) == 2
    merged = [e for e in out["img"] if e[0][0] == 0][0]
    # reference's `label_i or label_j` keeps the FIRST label tuple
    assert merged[1] == (1, 0, 0)


def test_no_merge_across_cored_caa_label_maps():
    mapp = {"img": [((0, 0, 10, 10), (1, 0, 0)), ((5, 5, 10, 10), (0, 0, 1))]}
    out = combine_overlapping_bboxes(mapp)
    assert len(out["img"]) == 2
