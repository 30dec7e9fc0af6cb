"""Checkpoint parity study: our trained model vs the published PRC tables.

The reference's model of record (``yolov3_ckpt_105.pth``) is a git-LFS stub
in this mount, so box-for-box weight parity is unprovable here.  This study
is the stub-proof substitute (VERDICT r1 #5): run OUR trained checkpoint
over the 200 prospective-validation images through the full PRC machinery
(``prospective.py:32-249`` equivalents) and overlay its AP-vs-IoU curves on
the PUBLISHED consensus tables (``/root/reference/PRC_tables/
PRC_table_consensus_iou_*.csv`` — the reference model's predictions scored
against the consensus-of-2 benchmark).

HONESTY NOTE (also printed into the output table): our checkpoint is
trained ON the consensus annotations of 160 of these 200 images (the only
real labeled data in the mount), so the all-200 comparison is partially
circular; the published model was trained on a separate 1,500+ tile corpus.
The holdout-40 column is the fair(er) read.  This is a pipeline-capability
anchor, not a claim of model superiority.

Usage:
    python tools/run_ckpt_parity_study.py --ckpt checkpoints_r2/yolov3_ckpt_79 \
        --out parity_study [--precision bf16|int8_early] [--int8-ds 16]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMAGES = "/root/reference/prospective_validation_images"
CONSENSUS = "/root/reference/prospective_annotations/consensus_annotations.pkl"
PUBLISHED = "/root/reference/PRC_tables"
IOUS = [round(t, 1) for t in np.arange(0.1, 1.0, 0.1)]
CLASSES = ("CAA", "Cored")


def published_ap(iou: float, cls: str) -> float:
    import pandas as pd

    from amyloid_yolo_tpu.analysis.prospective import average_precision_from_table

    path = os.path.join(PUBLISHED, f"PRC_table_consensus_iou_{iou}_{cls}.csv")
    return average_precision_from_table(pd.read_csv(path))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    ap.add_argument("--out", default="parity_study")
    ap.add_argument("--precision", default="bf16",
                    choices=["bf16", "int8_early"])
    ap.add_argument("--int8-ds", type=int, default=16)
    ap.add_argument("--holdout-list", default="/tmp/prospective_data/valid.txt",
                    help="valid.txt of holdout images (for the fair column)")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--model-size", type=int, default=416,
                    help="detector input side — match the checkpoint's "
                         "training scale (anchors are in input pixels)")
    ap.add_argument("--model-def", default=None,
                    help="darknet cfg the checkpoint was trained with "
                         "(anchors live in the graph spec, not the params "
                         "— a re-anchored checkpoint decodes garbage "
                         "under the default COCO table)")
    ap.add_argument("--tag", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/amyolo_jax_cache")

    from amyloid_yolo_tpu.analysis.prospective import (
        average_precision_from_table, compare_annotations_to_predictions,
        run_model_on_validation_images,
    )
    from amyloid_yolo_tpu.detectors import Detector
    from amyloid_yolo_tpu.graphspec import from_cfg, yolov3_spec
    from amyloid_yolo_tpu.io import weights as W

    tag = args.tag or (args.precision if args.precision != "bf16"
                       else "model_r2")
    os.makedirs(args.out, exist_ok=True)
    spec = (from_cfg(args.model_def) if args.model_def
            else yolov3_spec(num_classes=2))
    params = W.load_ckpt_params(args.ckpt)  # accepts <dir>#ema

    det = Detector(spec, params, conf_thres=0.8, nms_thres=0.4,
                   precision=args.precision, int8_downsample=args.int8_ds,
                   model_size=args.model_size, host_resize=True)

    # 1. predictions over the 200 images (merge like the reference's
    # prospective treatment; CAA filter skipped: its model pickle is an LFS
    # stub in this mount)
    preds_pickle = os.path.join(args.out, f"predictions_{tag}.pkl")
    preds = run_model_on_validation_images(
        det, IMAGES, preds_pickle, caa_filter=None, merge=True,
        batch_size=args.batch_size)
    n_det = sum(len(v) for v in preds.values())
    print(f"[1/3] {n_det} detections over {len(preds)} images", flush=True)

    with open(CONSENSUS, "rb") as fh:
        consensus = pickle.load(fh)

    holdout = set()
    if os.path.exists(args.holdout_list):
        with open(args.holdout_list) as fh:
            holdout = {os.path.basename(l.strip()) for l in fh if l.strip()}

    # 2. PRC tables at every IoU, all-200 and holdout-40
    rows = []
    for iou in IOUS:
        compare_annotations_to_predictions(
            consensus, preds, iou, annotator=tag, val_type="prospective",
            prc_dir=os.path.join(args.out, "PRC_tables"),
            precision_maps_dir=None)
        if holdout:
            compare_annotations_to_predictions(
                {k: consensus[k] for k in holdout},
                {k: preds[k] for k in holdout},
                iou, annotator=tag + "_holdout", val_type="prospective",
                prc_dir=os.path.join(args.out, "PRC_tables"),
                precision_maps_dir=None)
    print("[2/3] PRC tables written", flush=True)

    # 3. AP table + overlay figure
    import pandas as pd

    for cls in CLASSES:
        for iou in IOUS:
            ours = average_precision_from_table(pd.read_csv(os.path.join(
                args.out, "PRC_tables",
                f"prospective_PRC_table_{tag}_iou_{iou}_{cls}.csv")))
            hold = None
            if holdout:
                hold = average_precision_from_table(pd.read_csv(os.path.join(
                    args.out, "PRC_tables",
                    f"prospective_PRC_table_{tag}_holdout_iou_{iou}_{cls}.csv")))
            rows.append({"class": cls, "iou": iou,
                         "published_ckpt105": round(published_ap(iou, cls), 4),
                         f"ours_{tag}_all200(circular160)": round(ours, 4),
                         f"ours_{tag}_holdout40": (round(hold, 4)
                                                   if hold is not None else None)})
    table = pd.DataFrame(rows)
    table.to_csv(os.path.join(args.out, f"ap_vs_iou_{tag}.csv"), index=False)
    print(table.to_string(index=False), flush=True)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(11, 4.5))
        for ax, cls in zip(axes, CLASSES):
            sub = table[table["class"] == cls]
            ax.plot(sub["iou"], sub["published_ckpt105"], "o-",
                    label="published ckpt-105 (consensus GT)")
            ax.plot(sub["iou"], sub[f"ours_{tag}_all200(circular160)"], "s-",
                    label=f"ours {tag}, all 200 (160 seen in training)")
            if holdout:
                ax.plot(sub["iou"], sub[f"ours_{tag}_holdout40"], "^-",
                        label=f"ours {tag}, 40 holdout")
            ax.set_title(f"{cls}: AP vs IoU")
            ax.set_xlabel("IoU threshold")
            ax.set_ylabel("AP")
            ax.set_ylim(0, 1)
            ax.grid(alpha=0.3)
            ax.legend(fontsize=8)
        fig.tight_layout()
        fig_path = os.path.join(args.out, f"ap_vs_iou_{tag}.png")
        fig.savefig(fig_path, dpi=150)
        print(f"[3/3] figure: {fig_path}", flush=True)
    except Exception as e:  # matplotlib optional
        print(f"[3/3] figure skipped: {e}", flush=True)

    summary = {
        "tag": tag,
        "ckpt": args.ckpt,
        "mAP@0.5_all200": round(float(np.mean([
            r[f"ours_{tag}_all200(circular160)"] for r in rows
            if r["iou"] == 0.5])), 4),
        "published_mAP@0.5": round(float(np.mean([
            r["published_ckpt105"] for r in rows if r["iou"] == 0.5])), 4),
        "n_detections": n_det,
    }
    if holdout:
        summary["mAP@0.5_holdout40"] = round(float(np.mean([
            r[f"ours_{tag}_holdout40"] for r in rows if r["iou"] == 0.5])), 4)
    with open(os.path.join(args.out, f"summary_{tag}.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
