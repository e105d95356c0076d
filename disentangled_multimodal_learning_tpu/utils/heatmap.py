"""Attention-heatmap rendering from the visualization export.

The reference dumps per-patch attention maps "for heatmap visualization"
(reference train_test.py:1121-1177: head-max then kv-mean per patch) but
ships no renderer — the heatmap figures in the paper are produced offline.
This module closes that last mile: it consumes the ``attention_fold<k>.npz``
written by ``train/evaluation.py::Evaluator.export_attention_maps`` (keys
``att_<name>`` ``[n_bags, N]`` NaN-padded, plus ``scores``/``labels``/
``wsi_ids``) and renders per-slide heatmaps two ways:

- **grid mode** (default): patches are laid out on the model's own
  ``sqrt(N) x sqrt(N)`` grid — exactly the spatial arrangement the 2-D
  deformable attention computes on (reference models/DeformableAttention2D.py
  reshape ``[B, C, 50, 50]`` for fixdim 2500) — then upsampled and
  colormapped to a PNG.
- **coords mode**: a patch-coordinate table (CSV with columns
  ``wsi_id,x,y`` in patch units, row order = bag order, as produced by
  standard WSI tiling pipelines) maps each patch's attention back to its
  true slide position, so the heatmap overlays the original geometry even
  for non-square / variable-length bags.

Pure host-side numpy + PIL; nothing here touches JAX.
"""

from __future__ import annotations

import csv
import os

import numpy as np

__all__ = ["load_export", "grid_heatmap", "coords_heatmap", "to_png",
           "render_export", "summary_rows"]

# 256-entry "inferno-like" colormap computed from matplotlib when available,
# with a self-contained fallback so rendering never depends on it.
def _colormap():
    try:  # pragma: no cover - exercised when matplotlib exists
        import matplotlib
        return (np.asarray(matplotlib.colormaps["inferno"](
            np.linspace(0.0, 1.0, 256)))[:, :3] * 255).astype(np.uint8)
    except Exception:  # pragma: no cover
        t = np.linspace(0.0, 1.0, 256)
        r = np.clip(3.0 * t, 0, 1)
        g = np.clip(3.0 * t - 1.0, 0, 1)
        b = np.clip(3.0 * t - 2.0, 0, 1)
        return (np.stack([r, g, b], 1) * 255).astype(np.uint8)


def load_export(path: str) -> dict:
    """Load an ``export_attention_maps`` npz into plain arrays."""
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def _valid(att_row: np.ndarray) -> np.ndarray:
    """Strip the NaN padding of a bucketed export row."""
    return att_row[~np.isnan(att_row)]


def _normalize(x: np.ndarray) -> np.ndarray:
    lo, hi = float(np.min(x)), float(np.max(x))
    if hi <= lo:
        return np.zeros_like(x)
    return (x - lo) / (hi - lo)


def grid_heatmap(att_row: np.ndarray, upsample: int = 8) -> np.ndarray:
    """One bag's attention ``[N]`` (NaN-padded ok) -> normalized float map
    ``[side*upsample, side*upsample]`` on the model's square patch grid.

    Trailing patches that don't fill the last grid row (non-square bag in
    grid mode) are dropped with a note-free NaN fill, mirroring how the 2-D
    attention itself only sees the square prefix (deform_attention.py:318).
    """
    v = _valid(np.asarray(att_row, np.float64))
    side = int(np.sqrt(v.size))
    if side < 1:
        return np.zeros((upsample, upsample))
    img = _normalize(v[: side * side].reshape(side, side))
    return np.repeat(np.repeat(img, upsample, 0), upsample, 1)


def coords_heatmap(att_row: np.ndarray, xy: np.ndarray,
                   upsample: int = 8) -> np.ndarray:
    """One bag's attention ``[N]`` + integer patch coords ``[N, 2]`` ->
    normalized float map over the bounding box (unoccupied positions 0)."""
    v = _valid(np.asarray(att_row, np.float64))
    xy = np.asarray(xy, np.int64)[: v.size]
    if v.size == 0:
        return np.zeros((upsample, upsample))
    xy = xy - xy.min(axis=0)
    w, h = int(xy[:, 0].max()) + 1, int(xy[:, 1].max()) + 1
    img = np.zeros((h, w))
    img[xy[:, 1], xy[:, 0]] = _normalize(v)
    return np.repeat(np.repeat(img, upsample, 0), upsample, 1)


def to_png(img: np.ndarray, path: str) -> str:
    """Colormap a normalized float map and write a PNG."""
    from PIL import Image

    idx = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(_colormap()[idx]).save(path)
    return path


def read_coords_csv(path: str) -> dict[str, np.ndarray]:
    """``wsi_id,x,y`` rows (bag order preserved per wsi) -> id -> [N, 2]."""
    out: dict[str, list] = {}
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            out.setdefault(str(row["wsi_id"]), []).append(
                (int(float(row["x"])), int(float(row["y"]))))
    return {k: np.asarray(v, np.int64) for k, v in out.items()}


def summary_rows(data: dict) -> list[dict]:
    """Per-bag summary: id, label, predicted class, max score, and per-map
    attention entropy (low entropy = focused heatmap)."""
    scores = np.asarray(data.get("scores", np.zeros((0, 1))), np.float64)
    labels = np.asarray(data.get("labels", np.zeros((0,))))
    ids = data.get("wsi_ids", np.asarray([]))
    att_keys = sorted(k for k in data if k.startswith("att_"))
    n = scores.shape[0]
    rows = []
    for i in range(n):
        e = np.exp(scores[i] - scores[i].max())
        p = e / e.sum()
        row = {
            "wsi_id": str(ids[i]) if i < len(ids) else str(i),
            "label": int(labels[i]) if i < len(labels) else -1,
            "pred": int(np.argmax(scores[i])),
            "prob": float(p.max()),
        }
        for k in att_keys:
            v = _valid(np.asarray(data[k][i], np.float64))
            if v.size:
                q = v - v.min()
                q = q / q.sum() if q.sum() > 0 else np.full_like(v, 1 / v.size)
                ent = float(-(q * np.log(np.clip(q, 1e-12, None))).sum())
            else:
                ent = float("nan")
            row[f"entropy_{k[4:]}"] = ent
        rows.append(row)
    return rows


def render_export(npz_path: str, out_dir: str, coords_csv: str | None = None,
                  upsample: int = 8, keys: list[str] | None = None) -> list[str]:
    """Render every (bag, attention-map) pair of an export npz to PNGs and
    write ``summary.csv``.  Returns the list of files written."""
    data = load_export(npz_path)
    os.makedirs(out_dir, exist_ok=True)
    coords = read_coords_csv(coords_csv) if coords_csv else {}
    ids = [str(s) for s in data.get("wsi_ids", [])]
    att_keys = sorted(k for k in data if k.startswith("att_"))
    if keys:
        att_keys = [k for k in att_keys if k in keys or k[4:] in keys]
    written = []
    for k in att_keys:
        maps = data[k]
        for i in range(maps.shape[0]):
            wid = ids[i] if i < len(ids) else str(i)
            if wid in coords:
                img = coords_heatmap(maps[i], coords[wid], upsample)
            else:
                img = grid_heatmap(maps[i], upsample)
            safe = "".join(c if c.isalnum() or c in "-_." else "_"
                           for c in wid)
            written.append(to_png(
                img, os.path.join(out_dir, f"{safe}__{k[4:]}.png")))
    rows = summary_rows(data)
    if rows:
        spath = os.path.join(out_dir, "summary.csv")
        with open(spath, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)
        written.append(spath)
    return written
