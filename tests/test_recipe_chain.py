"""The committed two-phase recipe runner (tools/recipe_chain.py) — the
chain every PARITY.md reproduction ran, as one command.  Tests drive
the orchestration logic only (no training): command construction via
--dry_run and winner selection from synthetic event logs."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import recipe_chain  # noqa: E402


def test_dry_run_prints_both_phases(tmp_path, capsys):
    rc = recipe_chain.main([
        "--tag", "t1", "--dry_run", "--study",
        "--out_root", str(tmp_path), "--ema_decay", "0.999",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "phase 1:" in out and "phase 2:" in out and "study:" in out
    # phase 1 carries lr1/epochs1 and the recipe defaults
    p1 = [l for l in out.splitlines() if "phase 1:" in l][0]
    assert "--learning_rate 0.001" in p1 and "--epochs 80" in p1
    assert "--ema_decay 0.999" in p1 and "--host_resize True" in p1
    p2 = [l for l in out.splitlines() if "phase 2:" in l][0]
    assert "--learning_rate 0.0003" in p2 and "--epochs 50" in p2
    assert "--pretrained_weights <phase1-winner>" in p2
    st = [l for l in out.splitlines() if "study:" in l][0]
    assert "--model-size 416" in st and "--tag model_t1" in st


def test_skip_phase1_resumes_given_ckpt(tmp_path, capsys):
    rc = recipe_chain.main([
        "--tag", "t2", "--dry_run", "--skip_phase1", "/x/ckpt_5#ema",
        "--out_root", str(tmp_path),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "phase 1:" not in out
    assert "--pretrained_weights /x/ckpt_5#ema" in out


def _events(path, rows):
    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def test_pick_winner_raw_vs_ema(tmp_path):
    ev = tmp_path / "events.jsonl"
    _events(ev, [
        {"step": 1, "validation/mAP": 0.2, "validation/mAP_ema": 0.1},
        {"step": 2, "validation/mAP": 0.4, "validation/mAP_ema": 0.5},
        {"step": 3, "validation/mAP": 0.3, "validation/mAP_ema": 0.45},
    ])
    # raw-only selection
    pick, arm, v, e = recipe_chain.pick_winner(str(ev), "/ck", ema=False)
    assert (pick, arm, e) == ("/ck/yolov3_ckpt_2", "raw", 2)
    # EMA arm wins -> '#ema' suffix on the EMA-best epoch
    pick, arm, _, _ = recipe_chain.pick_winner(str(ev), "/ck", ema=True)
    assert pick == "/ck/yolov3_ckpt_2#ema" and arm == "ema"


def test_cli_entry_smoke(tmp_path):
    out = subprocess.run(
        [sys.executable, "tools/recipe_chain.py", "--tag", "t3",
         "--dry_run", "--out_root", str(tmp_path)],
        cwd=REPO, capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    assert "[recipe_chain] done" in out.stdout


def test_dry_run_model_def_passthrough(tmp_path, capsys):
    """--model_def reaches BOTH train phases and the study overlay (a
    re-anchored checkpoint scored under the default COCO table would
    decode garbage)."""
    rc = recipe_chain.main([
        "--tag", "t2", "--dry_run", "--study", "--img_size", "512",
        "--model_def", "amyloid_yolo_tpu/config/yolov3-amyloid-512a.cfg",
        "--out_root", str(tmp_path),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    for phase in ("phase 1:", "phase 2:"):
        line = [l for l in out.splitlines() if phase in l][0]
        assert "--model_def amyloid_yolo_tpu/config/yolov3-amyloid-512a.cfg" \
            in line and "--img_size 512" in line
    st = [l for l in out.splitlines() if "study:" in l][0]
    assert "--model-def amyloid_yolo_tpu/config/yolov3-amyloid-512a.cfg" in st
    assert "--model-size 512" in st
