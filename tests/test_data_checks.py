"""Data-integrity check functions (reference DataSetTests tier), exercised
on synthetic fixtures; the same functions run against the real OSF data
when present."""

import pickle

import pytest

from amyloid_yolo_tpu.analysis import data_checks as dc


def test_train_valid_disjoint(tmp_path):
    (tmp_path / "train.txt").write_text("a.jpg\nb.jpg\n")
    (tmp_path / "valid.txt").write_text("c.jpg\n")
    dc.check_train_valid_disjoint(str(tmp_path / "train.txt"), str(tmp_path / "valid.txt"))
    (tmp_path / "valid2.txt").write_text("b.jpg\n")
    with pytest.raises(AssertionError):
        dc.check_train_valid_disjoint(str(tmp_path / "train.txt"), str(tmp_path / "valid2.txt"))


def test_split_identity(tmp_path):
    for d in ("p1", "p2"):
        (tmp_path / d).mkdir()
        (tmp_path / d / "train.txt").write_text("a.jpg\nb.jpg\n")
        (tmp_path / d / "valid.txt").write_text("c.jpg\n")
    dc.check_split_identity_across_phases(str(tmp_path / "p1"), str(tmp_path / "p2"))
    (tmp_path / "p2" / "train.txt").write_text("a.jpg\n")
    with pytest.raises(AssertionError):
        dc.check_split_identity_across_phases(str(tmp_path / "p1"), str(tmp_path / "p2"))


def test_consensus_subset():
    ann = ({"x1": 0, "y1": 0, "x2": 10, "y2": 10}, "Cored")
    consensus = {"img": [ann]}
    dc.check_consensus_subset_of_annotators(consensus, {"NP1": {"img": [ann]}})
    stranger = ({"x1": 5, "y1": 5, "x2": 15, "y2": 15}, "Cored")
    with pytest.raises(AssertionError):
        dc.check_consensus_subset_of_annotators({"img": [stranger]}, {"NP1": {"img": [ann]}})


def test_precision_map_empties():
    preds = {"img": [(None, "Cored")]}
    dc.check_precision_map_empties({"img": -1}, preds, "CAA")
    with pytest.raises(AssertionError):
        dc.check_precision_map_empties({"img": -1}, preds, "Cored")


def test_preprocess_golden(tmp_path):
    mapp = {"x": [(1, 2)]}
    p = tmp_path / "g.pkl"
    pickle.dump(mapp, open(p, "wb"))
    dc.check_preprocess_against_golden(mapp, str(p))
    with pytest.raises(AssertionError):
        dc.check_preprocess_against_golden({"x": []}, str(p))
