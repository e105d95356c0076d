"""Accuracy study: bilinear-table CPB vs the exact CPB bias MLP.

The SwinV2-style CPB bias (reference models/DeformableAttention2D.py:
120-160) evaluates a 2->HID->HID->1 MLP at every (query, kv) relative
position — BH*K*N = 11.5M positions per attention per step, the teacher's
measured bottleneck (PERF.md).  But the query positions are a FIXED uniform
grid: for one kv point p, the bias row over all N queries is the smooth
function  T(d) = MLP(sign(d)*log1p|d|)  sampled on a uniform lattice shifted
by the fractional part of p.  Precomputing T on a lattice of spacing
(query spacing / divisor) turns the 11.5M MLP evaluations into ONE small
table build (~180k points) plus a bilinear window slice per kv point.

This experiment quantifies the approximation error of that table as a
function of the resolution divisor, end to end:

  - bias error (abs, and relative to the bias' dynamic range),
  - post-softmax attention-probability error (what the model actually sees),
  - attention-output error (attn @ v).

Run: python tools/exp_cpb_table_acc.py [--side 50] [--K 144] [--BH 8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def mlp(fx, fy, w1, b1, w2, b2, w3, b3):
    """Exact CPB net on transformed coords (any shape)."""
    h = np.maximum(fx[..., None] * w1[0] + fy[..., None] * w1[1] + b1, 0.0)
    h = np.maximum(h @ w2 + b2, 0.0)
    return (h @ w3 + b3)[..., 0]


def logt(d):
    return np.sign(d) * np.log1p(np.abs(d))


def exact_bias(grid_q, pts, params):
    """grid_q [N,2], pts [R,K,2] -> [R,K,N] (kv-major, like the v7 kernel)."""
    d = grid_q[None, None, :, :] - pts[:, :, None, :]      # [R,K,N,2]
    return np.swapaxes(
        mlp(logt(d[..., 0]), logt(d[..., 1]), *params), -1, -1)


def build_table(side, max_abs, divisor, params):
    """Lattice spacing h = s/divisor covering [-max_abs, max_abs]."""
    s = 2.0 / (side - 1)
    h = s / divisor
    n = int(np.ceil(max_abs / h)) + 2
    coords = (np.arange(-n, n + 1)) * h                    # [T]
    fx = logt(coords)
    T = mlp(fx[None, :], fx[:, None] * np.ones_like(fx)[None, :].T, *params)
    # T[a, b] = mlp(f(dx_b), f(dy_a)): rows = dy, cols = dx
    T = mlp(np.broadcast_to(fx[None, :], (coords.size, coords.size)),
            np.broadcast_to(fx[:, None], (coords.size, coords.size)), *params)
    return T, coords[0], h


def table_bias(grid_q, pts, params, side, divisor):
    """Bilinear-window approximation, same [R,K,N] layout."""
    max_abs = np.abs(grid_q).max() + np.abs(pts).max() + 0.1
    T, t0, h = build_table(side, max_abs, divisor, params)
    x0 = grid_q[:, 0].min()
    y0 = grid_q[:, 1].min()
    d = divisor
    R, K, _ = pts.shape
    N = grid_q.shape[0]
    out = np.empty((R, K, N))
    r_idx = np.arange(side)
    for r in range(R):
        for k in range(K):
            pkx, pky = pts[r, k]
            ty = (y0 - pky - t0) / h + d * r_idx           # [side]
            tx = (x0 - pkx - t0) / h + d * r_idx
            iy = np.floor(ty).astype(int)
            ix = np.floor(tx).astype(int)
            fy = ty - iy
            fx = tx - ix
            Ty = T[iy] * (1 - fy)[:, None] + T[iy + 1] * fy[:, None]
            W = (Ty[:, ix] * (1 - fx)[None, :]
                 + Ty[:, ix + 1] * fx[None, :])            # [side, side]
            out[r, k] = W.reshape(-1)
    return out


def init_params(rng, hid=32, scale=1.0):
    """Flax-default-like init (lecun_normal kernels, zero bias)."""
    w1 = rng.normal(size=(2, hid)) / np.sqrt(2) * scale
    w2 = rng.normal(size=(hid, hid)) / np.sqrt(hid) * scale
    w3 = rng.normal(size=(hid, 1)) / np.sqrt(hid) * scale
    return (w1, np.zeros(hid), w2, np.zeros(hid), w3, np.zeros(1))


def softmax(x, axis):
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=50)
    ap.add_argument("--K", type=int, default=144)
    ap.add_argument("--BH", type=int, default=8)
    ap.add_argument("--scales", type=float, nargs="*", default=[1.0, 2.0])
    args = ap.parse_args()
    side, K, BH = args.side, args.K, args.BH
    N = side * side
    rng = np.random.default_rng(0)

    # query grid exactly as create_grid_2d + normalize_grid_2d (x fast axis)
    lin = 2.0 * np.arange(side) / (side - 1) - 1.0
    gx, gy = np.meshgrid(lin, lin)                         # indexing='xy'
    grid_q = np.stack([gx.reshape(-1), gy.reshape(-1)], -1)

    # kv points exactly as the production path: 12x12 base grid + tanh*4
    # offsets, normalized by the SMALL grid extent (deform_attention.py:345-352)
    gh = 12
    base = 2.0 * np.arange(gh) / (gh - 1) - 1.0
    bx, by = np.meshgrid(base, base)
    off = np.tanh(rng.normal(size=(BH, 2, gh, gh))) * 4.0 * (2.0 / (gh - 1))
    pts = np.stack([bx + 0, by + 0], 0)[None] + off        # [BH,2,gh,gh]
    pts = pts.reshape(BH, 2, -1).swapaxes(1, 2)            # [BH,K,2]
    assert pts.shape == (BH, K, 2) or K != gh * gh, pts.shape
    if K != gh * gh:
        pts = pts[:, :K]

    # simulated q/v for the downstream-effect metrics
    q = rng.normal(size=(BH, N, 64)) * 0.3
    kmat = rng.normal(size=(BH, K, 64)) * 0.3
    v = rng.normal(size=(BH, K, 64))
    sim0 = np.einsum("bnd,bkd->bkn", q, kmat) / np.sqrt(64)

    for scale in args.scales:
        params = init_params(rng, scale=scale)
        ex = exact_bias(grid_q, pts, params)               # [BH,K,N]
        ptp = ex.max() - ex.min()
        print(f"\n== weight scale {scale}: bias range {ptp:.3f} "
              f"(min {ex.min():.3f} max {ex.max():.3f})")
        for divisor in (1, 2, 4, 8):
            ap_ = table_bias(grid_q, pts, params, side, divisor)
            err = np.abs(ap_ - ex)
            # downstream: attention probs + output
            a_ex = softmax(sim0 + ex, axis=1)
            a_ap = softmax(sim0 + ap_, axis=1)
            aerr = np.abs(a_ap - a_ex)
            o_ex = np.einsum("bkn,bkd->bnd", a_ex, v)
            o_ap = np.einsum("bkn,bkd->bnd", a_ap, v)
            oerr = np.abs(o_ap - o_ex)
            orel = oerr.max() / (np.abs(o_ex).max() + 1e-12)
            print(f"  div={divisor}: bias max={err.max():.2e} "
                  f"rms={np.sqrt((err**2).mean()):.2e} "
                  f"rel={err.max() / ptp:.2e} | attn max={aerr.max():.2e} "
                  f"| out max={oerr.max():.2e} rel={orel:.2e}")


if __name__ == "__main__":
    main()
