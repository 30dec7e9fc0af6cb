"""End-to-end WSI integration on the mini model: tile a synthetic slide,
sweep it, count plaques, and exercise the CERAD analysis path."""

import os
import pickle

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from amyloid_yolo_tpu.analysis.validation import (
    calculate_plaque_counts_per_wsi, speed_check,
)
from amyloid_yolo_tpu.detectors import Detector
from amyloid_yolo_tpu.io import tiles
from amyloid_yolo_tpu.models import darknet

from minispec import mini_spec


@pytest.fixture(scope="module")
def wsi_tree(tmp_path_factory):
    """Two synthetic 768² 'WSIs' tiled into 256² tiles."""
    root = tmp_path_factory.mktemp("wsi")
    rng = np.random.RandomState(0)
    for name in ("WSI_A", "WSI_B"):
        img = rng.randint(0, 255, (768, 768, 3)).astype(np.uint8)
        tiles.tile_image_array(img, str(root), name, tile_size=256)
    return root


@pytest.fixture(scope="module")
def det():
    spec = mini_spec(num_classes=2, img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    return Detector(spec, params, conf_thres=0.3, nms_thres=0.4, model_size=64,
                    tile_size=256, capacity=16, compute_dtype=jnp.float32)


def test_sweep_counts(wsi_tree, det, tmp_path):
    counts = calculate_plaque_counts_per_wsi(
        str(wsi_tree), det, caa_filter=None, prefix="T_",
        pickles_dir=str(tmp_path), batch_size=4,
    )
    assert set(counts) == {"WSI_A", "WSI_B"}
    for c in counts.values():
        assert set(c) == {"Cored", "CAA"}
        assert c["Cored"] >= 0 and c["CAA"] >= 0
    wsi_pkl = pickle.load(open(tmp_path / "T_WSI_plaque_counts_dictionary.pkl", "rb"))
    tile_pkl = pickle.load(open(tmp_path / "T_1536_plaque_counts_dictionary.pkl", "rb"))
    assert wsi_pkl == counts
    # every tile of every WSI is accounted for (9 tiles per 768² slide)
    assert all(len(t) == 9 for t in tile_pkl.values())
    # per-tile counts sum to the WSI count
    for wsi in counts:
        for cls in ("Cored", "CAA"):
            assert sum(t[cls] for t in tile_pkl[wsi].values()) == counts[wsi][cls]


def test_speed_check(wsi_tree, det, tmp_path):
    td = speed_check(str(wsi_tree), det, include_merge_and_filter=True,
                     batch_sizes=(4,), pickles_dir=str(tmp_path), tag="test")
    rec = td[4]
    assert rec["num 1536 images"] == 18
    assert rec["model time spent"] > 0
    assert rec["avg time / 1536 img"] > 0


def test_cerad_plots(tmp_path, wsi_tree, det):
    pytest.importorskip("pandas")
    pytest.importorskip("matplotlib")
    import pandas as pd

    counts = {f"W{i}": {"Cored": int(i * 3), "CAA": int(i)} for i in range(8)}
    cp = tmp_path / "counts.pkl"
    pickle.dump(counts, open(cp, "wb"))
    rows = [{"WSI_ID": f"W{i}",
             "CERAD": ["none", "sparse", "moderate", "frequent"][i % 4],
             "Cored_MTG": i % 4, "CAA_MTG": i % 4} for i in range(8)]
    csv = tmp_path / "CERAD_scores.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)

    from amyloid_yolo_tpu.analysis.validation import (
        plot_cerad_statistical_significance, plot_cerad_vs_counts,
    )

    cmap = plot_cerad_vs_counts(str(cp), str(csv), "Cored", "CERAD",
                                figures_dir=str(tmp_path / "figs"))
    assert sum(len(v) for v in cmap.values()) == 8
    tmap = plot_cerad_statistical_significance(str(cp), str(csv), "Cored",
                                               figures_dir=str(tmp_path / "figs"))
    assert ("none", "frequent") in tmap
    assert (tmp_path / "figs" / "CERAD-t-test-p-values.png").exists()
