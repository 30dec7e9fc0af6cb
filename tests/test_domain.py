"""Domain-layer tests: study metrics (reference unit_test.py cases),
CAA-filter invariants, classifier parity vs torch."""

import numpy as np
import pytest
import torch
import torch.nn as nn

from amyloid_yolo_tpu import domain
from amyloid_yolo_tpu.models import classifier


# -- reference unit_test.py:137-185 cases, verbatim values ------------------

def test_iou_reference_cases():
    box1 = [100, 100, 200, 200]
    assert domain.IOU(box1, box1) == 1
    assert domain.IOU([100, 100, 200, 200], [201, 201, 300, 300]) == 0
    v = domain.IOU([100, 100, 200, 200], [150, 150, 200, 200])
    assert 0.25 <= v <= 0.26


def test_get_accuracy_reference_cases():
    assert domain.get_accuracy([0, 0, 0], [1, 1, 1]) == 0
    assert domain.get_accuracy([1, 1, 1], [1, 1, 1]) == 1
    assert domain.get_accuracy([0, 1, 0], [1, 1, 1]) == 1 / 3


def test_get_tps_reference_cases():
    preds = [[100, 100, 200, 200, 0.9, 0], [201, 201, 300, 300, 0.9, 1]]
    labels = [[100, 100, 200, 200, 0], [201, 201, 300, 300, 1]]
    assert domain.get_tps(preds, labels, 0.5) == [1, 1]
    # order invariance
    preds_r = [preds[1], preds[0]]
    assert domain.get_tps(preds_r, labels, 0.5) == [1, 1]
    # class mismatch
    preds_c = [[100, 100, 200, 200, 0.9, 1], [201, 201, 300, 300, 0.9, 0]]
    assert domain.get_tps(preds_c, labels, 0.5) == [0, 0]
    # IoU below threshold
    labels_small = [[150, 150, 160, 160, 0], [201, 201, 203, 203, 1]]
    assert domain.get_tps(preds, labels_small, 0.5) == [0, 0]


def test_get_tps_no_double_dipping():
    """Two detections on one GT: only the higher-confidence one is TP."""
    preds = [[100, 100, 200, 200, 0.5, 0], [100, 100, 200, 200, 0.9, 0]]
    labels = [[100, 100, 200, 200, 0]]
    assert domain.get_tps(preds, labels, 0.5) == [0, 1]


def test_get_tps_tie_order_reference_quirk():
    """Equal-confidence ties: the reference sorts ascending then reverses
    (core.py:543-546), so ties are visited in REVERSED original order — the
    later prediction claims the label."""
    preds = [[100, 100, 200, 200, 0.9, 0], [100, 100, 200, 200, 0.9, 0]]
    labels = [[100, 100, 200, 200, 0]]
    assert domain.get_tps(preds, labels, 0.5) == [0, 1]
    # three-way tie: last one wins the single label
    preds3 = preds + [[100, 100, 200, 200, 0.9, 0]]
    assert domain.get_tps(preds3, labels, 0.5) == [0, 0, 1]
    # ties on distinct labels: both TP regardless of visit order (labels
    # must differ by value — value-identical labels collide in the
    # reference's `label in TP_labels` membership test, reproduced here)
    labels2 = labels + [[101, 101, 201, 201, 0]]
    assert domain.get_tps(preds, labels2, 0.5) == [1, 1]


# -- classifier parity vs torch ---------------------------------------------

def build_torch_net():
    layers = []
    in_ch = 3
    for out_ch in classifier.STAGE_WIDTHS:
        layers += [nn.Conv2d(in_ch, out_ch, 3, padding=1), nn.BatchNorm2d(out_ch),
                   nn.ReLU(inplace=True), nn.MaxPool2d(2, 2)]
        in_ch = out_ch
    net = nn.Sequential()
    feats = nn.Sequential(*layers)
    fc = nn.Sequential(nn.Linear(96 * 4 * 4, 3))

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = feats
            self.classifier = fc

        def forward(self, x):
            x = self.features(x)
            # .reshape, not .view: double-precision CPU pooling can hand
            # back non-contiguous tensors; same math as the reference
            return self.classifier(x.reshape(x.size(0), -1))

    return Net()


def test_classifier_matches_torch(rng):
    net = build_torch_net().double().eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = classifier.from_torch_state_dict(sd)
    x = rng.rand(2, 256, 256, 3).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x.transpose(0, 3, 1, 2)).double()).numpy()
    got = np.asarray(classifier.apply(params, x))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


# -- CAA filter invariants (unit_test.py:243-288 analogue) -------------------

@pytest.fixture(scope="module")
def caa_filter():
    return domain.CAAFilter()


def test_caa_filter_cored_invariance(caa_filter, rng):
    """filterDetectionsByCAAModel never touches Cored detections."""
    img = rng.randint(0, 255, (1536, 1536, 3)).astype(np.uint8)
    dets = np.array([
        [100, 100, 300, 300, 0.9, 0.9, 1.0],   # Cored
        [500, 500, 700, 700, 0.8, 0.8, 0.0],   # CAA
        [900, 900, 1100, 1100, 0.95, 0.9, 1.0],  # Cored
    ], np.float32)
    out = caa_filter(img, dets)
    cored_in = {tuple(r) for r in dets if r[6] == 1.0}
    cored_out = {tuple(r) for r in out if r[6] == 1.0}
    assert cored_in == cored_out


def test_caa_filter_threshold(caa_filter, rng):
    """A CAA detection survives iff classifier CAA prob > 0.5."""
    img = rng.randint(0, 255, (1536, 1536, 3)).astype(np.uint8)
    dets = np.array([[500, 500, 700, 700, 0.8, 0.8, 0.0]], np.float32)
    probs = caa_filter.predict_crops(
        np.stack([domain._crop(img, dets[0])])
    )
    out = caa_filter(img, dets)
    if probs[0][2] > 0.5:
        assert out.shape[0] == 1
    else:
        assert out.shape[0] == 0


def test_write_caa_detections(tmp_path):
    p = str(tmp_path / "CAA_detections.pkl")
    dets = np.array([
        [10, 20, 110, 220, 0.9, 0.9, 0.0],   # CAA -> written
        [10, 20, 110, 220, 0.9, 0.9, 1.0],   # Cored -> skipped
    ], np.float32)
    domain.write_caa_detections(p, "some/dir/img.jpg", dets)
    import pickle

    store = pickle.load(open(p, "rb"))
    assert list(store.keys()) == ["img.jpg"]
    assert len(store["img.jpg"]) == 1
    label_idx, xc, yc, w, h = store["img.jpg"][0]
    assert (label_idx, w, h) == (0, 100, 200)
    # the reference's quirk: centers are box-relative (w/2, h/2)
    assert (xc, yc) == (50.0, 100.0)


def test_filter_map():
    mapp = {
        "a": [((0, 0, 1, 1), (1, 0, 0))],          # cored only
        "b": [((0, 0, 1, 1), (0, 0, 1))],          # CAA only
        "c": [((0, 0, 1, 1), (0, 1, 0))],          # diffuse only
    }
    both = domain.filter_map_to_get_cored_or_caa(mapp)
    assert set(both) == {"a", "b"}
    caa = domain.filter_map_to_get_cored_or_caa(mapp, just_CAA=True)
    assert set(caa) == {"b"}
    cored = domain.filter_map_to_get_cored_or_caa(mapp, just_Cored=True)
    assert set(cored) == {"a"}


def test_draw_detections(rng):
    img = rng.randint(0, 255, (256, 256, 3)).astype(np.uint8)
    dets = np.array([[50, 50, 150, 150, 0.9, 0.9, 1.0]], np.float32)
    out = domain.draw_detections(img, dets)
    assert out.shape == img.shape
    assert not np.array_equal(out, img)


def test_clear_output_dir(tmp_path):
    d = tmp_path / "out"
    d.mkdir()
    (d / "x.txt").write_text("hi")
    domain.clear_output_dir(str(d))
    assert d.exists() and not list(d.iterdir())
