"""Heatmap rendering from the visualization export (utils/heatmap.py).

The reference exports per-patch attention values for offline heatmap
analysis (reference train_test.py:1121-1177) but ships no renderer; these
tests cover ours end-to-end on a synthetic export npz (no JAX involved).
"""

import csv
import os

import numpy as np
import pytest

from disentangled_multimodal_learning_tpu.utils.heatmap import (
    coords_heatmap, grid_heatmap, load_export, render_export, summary_rows)


def _export_npz(tmp_path, n_bags=3, N=16, n_keys=2, pad_last=4):
    rng = np.random.default_rng(0)
    data = {
        "scores": rng.normal(size=(n_bags, 4)).astype(np.float32),
        "labels": np.arange(n_bags) % 4,
        "wsi_ids": np.asarray([f"TCGA-{i:02d}" for i in range(n_bags)]),
    }
    for k in range(n_keys):
        att = rng.uniform(size=(n_bags, N)).astype(np.float32)
        if pad_last:  # bucketed export: NaN padding past the bag end
            att[-1, N - pad_last:] = np.nan
        data[f"att_att{k + 1}_tea10"] = att
    path = os.path.join(tmp_path, "attention_fold1.npz")
    np.savez(path, **data)
    return path, data


def test_grid_heatmap_shape_and_range():
    att = np.arange(25.0)
    img = grid_heatmap(att, upsample=4)
    assert img.shape == (20, 20)
    assert img.min() == 0.0 and img.max() == 1.0
    # row-major layout: the largest value sits in the bottom-right block
    assert img[-1, -1] == 1.0 and img[0, 0] == 0.0


def test_grid_heatmap_nan_padding_stripped():
    att = np.concatenate([np.arange(16.0), np.full(9, np.nan)])
    img = grid_heatmap(att, upsample=1)
    assert img.shape == (4, 4)  # side from the 16 valid entries, not 25


def test_coords_heatmap_places_values():
    att = np.asarray([0.0, 0.5, 1.0])
    xy = np.asarray([[0, 0], [2, 0], [1, 1]])
    img = coords_heatmap(att, xy, upsample=1)
    assert img.shape == (2, 3)
    assert img[0, 0] == 0.0 and img[0, 2] == 0.5 and img[1, 1] == 1.0
    assert img[1, 0] == 0.0  # unoccupied

def test_summary_rows_entropy_ordering(tmp_path):
    path, _ = _export_npz(tmp_path, n_bags=2, N=16, pad_last=0)
    data = load_export(path)
    # focused map -> lower entropy than uniform map
    data["att_att1_tea10"][0] = np.eye(1, 16, 3)[0] * 10.0
    data["att_att1_tea10"][1] = np.ones(16)
    rows = summary_rows(data)
    assert rows[0]["entropy_att1_tea10"] < rows[1]["entropy_att1_tea10"]
    assert {"wsi_id", "label", "pred", "prob"} <= set(rows[0])


def test_render_export_writes_pngs_and_summary(tmp_path):
    path, data = _export_npz(tmp_path)
    out = os.path.join(tmp_path, "heat")
    files = render_export(path, out, upsample=2)
    pngs = [f for f in files if f.endswith(".png")]
    assert len(pngs) == 3 * 2  # bags x attention keys
    from PIL import Image

    img = Image.open(pngs[0])
    assert img.size == (8, 8) and img.mode == "RGB"  # side 4, upsample 2
    with open(os.path.join(out, "summary.csv"), newline="") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3
    assert rows[1]["wsi_id"] == "TCGA-01"


def test_render_export_coords_mode(tmp_path):
    path, _ = _export_npz(tmp_path, n_bags=1, N=4, n_keys=1, pad_last=0)
    coords = os.path.join(tmp_path, "coords.csv")
    with open(coords, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["wsi_id", "x", "y"])
        for i, (x, y) in enumerate([(10, 5), (11, 5), (10, 6), (13, 5)]):
            w.writerow([f"TCGA-00", x, y])
    out = os.path.join(tmp_path, "heat")
    files = render_export(path, out, coords_csv=coords, upsample=1)
    from PIL import Image

    png = [f for f in files if f.endswith(".png")][0]
    assert Image.open(png).size == (4, 2)  # bounding box 4 wide, 2 tall


def test_render_export_key_filter(tmp_path):
    path, _ = _export_npz(tmp_path)
    out = os.path.join(tmp_path, "heat")
    files = render_export(path, out, keys=["att1_tea10"])
    assert sum(f.endswith(".png") for f in files) == 3


def test_cli_entrypoint(tmp_path):
    import subprocess
    import sys

    path, _ = _export_npz(tmp_path)
    out = os.path.join(tmp_path, "heat")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "attention_heatmap.py"),
         path, out, "--upsample", "2"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(os.path.join(out, "summary.csv"))
