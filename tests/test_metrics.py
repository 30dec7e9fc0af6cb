"""AP/PR machinery parity checks (host numpy vs hand-computed values)."""

import numpy as np

from amyloid_yolo_tpu.ops.metrics import ap_per_class, compute_ap, get_batch_statistics


def test_compute_ap_perfect():
    assert compute_ap(np.array([0.5, 1.0]), np.array([1.0, 1.0])) == 1.0


def test_compute_ap_envelope():
    # precision dips then recovers: envelope takes the running max from right
    recall = np.array([0.25, 0.5, 0.75, 1.0])
    precision = np.array([1.0, 0.5, 0.66, 0.6])
    ap = compute_ap(recall, precision)
    # envelope: [1.0, 0.66, 0.66, 0.6]; each recall step is 0.25
    want = 0.25 * (1.0 + 0.66 + 0.66 + 0.6)
    assert np.isclose(ap, want)


def test_get_batch_statistics_greedy_one_gt_per_det():
    # two detections both overlapping the same single GT: only the first
    # (model-order) one is a TP
    out = np.array([
        [100, 100, 200, 200, 0.9, 0.9, 0.0],
        [101, 101, 201, 201, 0.95, 0.9, 0.0],
    ])
    targets = np.array([[0, 0, 100, 100, 200, 200]], np.float64)
    stats = get_batch_statistics([out], targets, 0.5)
    tp, scores, labels = stats[0]
    np.testing.assert_array_equal(tp, [1, 0])


def test_get_batch_statistics_class_mismatch():
    out = np.array([[100, 100, 200, 200, 0.9, 0.9, 1.0]])
    targets = np.array([[0, 0, 100, 100, 200, 200]], np.float64)
    stats = get_batch_statistics([out], targets, 0.5)
    np.testing.assert_array_equal(stats[0][0], [0])


def test_get_batch_statistics_none_skipped():
    targets = np.zeros((0, 6))
    stats = get_batch_statistics([None, None], targets, 0.5)
    assert stats == []


def test_ap_per_class_simple():
    tp = np.array([1.0, 1.0, 0.0, 1.0])
    conf = np.array([0.9, 0.8, 0.7, 0.6])
    pred_cls = np.array([0.0, 0.0, 0.0, 1.0])
    target_cls = [0.0, 0.0, 1.0]
    p, r, ap, f1, classes = ap_per_class(tp, conf, pred_cls, target_cls)
    assert list(classes) == [0, 1]
    assert np.isclose(r[0], 1.0)          # both class-0 GTs recalled
    assert np.isclose(p[0], 2.0 / 3.0)    # 2 TP of 3 class-0 preds
    assert np.isclose(ap[1], 1.0)
    assert np.isclose(ap[0], 1.0)         # envelope: both TPs before the FP


def test_ap_per_class_no_preds_for_class():
    tp = np.array([1.0])
    conf = np.array([0.9])
    pred_cls = np.array([0.0])
    target_cls = [0.0, 1.0]
    p, r, ap, f1, classes = ap_per_class(tp, conf, pred_cls, target_cls)
    assert ap[1] == 0.0 and r[1] == 0.0 and p[1] == 0.0
