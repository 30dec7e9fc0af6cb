"""Anchor re-estimation (tools/estimate_anchors.py): the IoU-k-means
procedure the reference skips by hardcoding COCO anchors
(``config/create_custom_model.sh``).  Pure numpy — no device work."""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import estimate_anchors as EA  # noqa: E402


def _fixture(tmp_path, n_imgs=6, seed=0):
    rng = np.random.RandomState(seed)
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    paths = []
    for i in range(n_imgs):
        p = tmp_path / "images" / f"t{i}.jpg"
        p.write_bytes(b"")  # never decoded; only the path matters
        rows = []
        for _ in range(rng.randint(1, 6)):
            w, h = rng.uniform(0.02, 0.2, 2)
            rows.append(f"{rng.randint(2)} 0.5 0.5 {w:.6f} {h:.6f}")
        (tmp_path / "labels" / f"t{i}.txt").write_text("\n".join(rows) + "\n")
        paths.append(str(p))
    lst = tmp_path / "train.txt"
    lst.write_text("\n".join(paths) + "\n")
    return str(lst)


def test_label_path_derivation():
    assert EA.label_path("/d/images/a_b.c.jpg") == "/d/labels/a_b.c.txt"
    assert EA.label_path("/images/x/images/t.png") == "/labels/x/images/t.txt"


def test_wh_iou_identity_and_bounds():
    wh = np.array([[10.0, 20.0], [5.0, 5.0]])
    iou = EA.wh_iou(wh, wh)
    np.testing.assert_allclose(np.diag(iou), 1.0)
    assert (iou >= 0).all() and (iou <= 1).all()
    # containment: 5x5 inside 10x20 -> 25/200
    np.testing.assert_allclose(iou[0, 1], 25.0 / 200.0)


def test_kmeans_deterministic_and_area_sorted(tmp_path):
    lst = _fixture(tmp_path)
    wh = EA.load_wh(lst, 416)

    def run():
        best, best_iou = None, -1.0
        for r in range(4):
            c, miou = EA.kmeans_iou(wh.copy(), 6,
                                    np.random.RandomState(r))
            if miou > best_iou:
                best, best_iou = c, miou
        order = np.argsort(best[:, 0] * best[:, 1])
        return [(round(float(w), 3), round(float(h), 3))
                for w, h in best[order]], best_iou

    a1, m1 = run()
    a2, m2 = run()
    assert a1 == a2 and m1 == m2  # seeded restarts are deterministic
    areas = [w * h for w, h in a1]
    assert areas == sorted(areas)
    # clustered anchors must beat the COCO table on the boxes they fit
    coco = np.asarray(EA.YOLOV3_ANCHORS, np.float64)
    assert m1 > float(EA.wh_iou(wh, coco).max(axis=1).mean())


def test_cli_emits_cfg_and_report(tmp_path):
    lst = _fixture(tmp_path, seed=1)
    out_json = tmp_path / "anchors.json"
    out_cfg = tmp_path / "anchored.cfg"
    proc = subprocess.run(
        [sys.executable, "tools/estimate_anchors.py", "--train_list", lst,
         "--img_size", "512", "--k", "9", "--restarts", "2",
         "--out", str(out_json), "--emit_cfg", str(out_cfg)],
        cwd=REPO, capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr
    rep = json.loads(out_json.read_text())
    assert rep["img_size"] == 512 and len(rep["anchors"]) == 9
    assert rep["mean_best_iou"] > 0

    from amyloid_yolo_tpu.graphspec import from_cfg

    spec = from_cfg(str(out_cfg))
    assert spec.net.width == 512
    got = [spec.layers[i].anchors for i in spec.yolo_indices]
    flat = [a for head in got[::-1] for a in head]  # stride 8 → 32 order
    assert flat == [tuple(a) for a in rep["anchors"]]


def test_shipped_512_cfg_matches_committed_report():
    """The committed yolov3-amyloid-512a.cfg IS the committed
    bench_artifacts/anchors_512.json estimate (provenance check)."""
    from amyloid_yolo_tpu.graphspec import from_cfg

    rep_path = os.path.join(REPO, "bench_artifacts", "anchors_512.json")
    cfg_path = os.path.join(REPO, "amyloid_yolo_tpu", "config",
                            "yolov3-amyloid-512a.cfg")
    rep = json.load(open(rep_path))
    spec = from_cfg(cfg_path)
    got = [spec.layers[i].anchors for i in spec.yolo_indices]
    flat = [a for head in got[::-1] for a in head]
    assert flat == [tuple(a) for a in rep["anchors"]]
    assert spec.net.width == rep["img_size"] == 512
    assert rep["mean_best_iou"] > rep["coco_mean_best_iou"]
