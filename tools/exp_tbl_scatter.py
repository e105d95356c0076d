"""A/B the divisor-1 table-CPB backward kernel variants (r3 follow-up).

The production `_tbl_d1_bwd_kernel` spends ~0.97 ms/attention (3x its
forward).  Per row it runs ~20 VPU passes over [win=64, cn=128] tiles plus
one read-modify-write into the shared table-cotangent scratch.  Variants:

  A  — production kernel (baseline).
  G  — algebraic fold: u = (1-fy)*m, v = fy*m with m = s*(1-fx) + s2*fx,
       so ONE x-blended cotangent feeds dfy and the scatter (2 fewer
       [win, cn] passes per row; exact reorganization, not approximate).
  GD — G + per-g split accumulators: dtab scratch [8, rows, cn], row g
       RMWs only slice [g] (static leading index), XLA sums the 8 copies.
       Tests whether Mosaic's in-order ref accesses serialize the 8 RMWs
       per grid step.
  F  — forward with derived static rolls: r2 = roll(r1, -1 sublane),
       l2 = roll(l1, -1 lane) instead of second dynamic rolls.

Each variant golden-checks against jax.vjp of `_tbl_interp_ref` before
timing.  Timing: lax.scan-chained (table depends on previous dtab) x ITERS,
one readback, interleaved min-of-REPS in this one process (tunnel drift).

Result: see the RESULT line this script prints (v5e measurements recorded
in PERF.md once run).
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from disentangled_multimodal_learning_tpu.ops.pallas.deform_attn import (
    _TBL_ROWS, _pad_n, _round_up, _tbl_consts, _tbl_d1_bwd_kernel,
    _tbl_d1_fwd_kernel, _tbl_idx, _tbl_interp_ref, _tbl_split_rows,
    _tbl_sum2d, _tbl_win_rows)

SIDE = 50          # production query grid (50x50 = fixdim 2500)
KV_BOUND = 1.0 + 2.0 * 4.0 / 11.0   # offset_scale 4, 12x12 kv grid
BH, K = 32, 144    # B=4 x heads=8; 12x12 sampled kv
ITERS = 30
REPS = 4


# --------------------------------------------------------------------------
# variant kernels
# --------------------------------------------------------------------------

def _bwd_kernel_g(idx_ref, frac_ref, tab_ref, db_ref, dtab_ref, dsh_ref):
    """Variant G: single x-blended cotangent m."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dtab_ref[...] = jnp.zeros_like(dtab_ref)

    side = db_ref.shape[1]
    cn = tab_ref.shape[1]
    win = _tbl_win_rows(side)
    dsh_rows = []
    for g in range(_TBL_ROWS):
        b = idx_ref[g, 0]
        ox = idx_ref[g, 4]
        fy = frac_ref[g, 0]
        fx = frac_ref[g, 1]
        b0 = (b // 8) * 8
        rem = b - b0
        dw = db_ref[g]
        t = tab_ref[pl.ds(b0, win), :]
        r1 = pltpu.roll(t, win - rem, axis=0)
        r2 = pltpu.roll(r1, win - 1, axis=0)
        dyt = r2 - r1
        ty = r1 * (1.0 - fy) + r2 * fy
        dwpad = jnp.pad(dw, ((0, win - side), (0, cn - side)))
        s = pltpu.roll(dwpad, ox, axis=1)
        s2 = pltpu.roll(s, 1, axis=1)
        m = s * (1.0 - fx) + s2 * fx
        dfx = _tbl_sum2d((s2 - s) * ty)
        dfy = _tbl_sum2d(m * dyt)
        dsh_rows.append(jnp.concatenate([dfy, dfx], axis=1))
        mr = pltpu.roll(m, rem, axis=0)
        w = mr * (1.0 - fy) + pltpu.roll(mr, 1, axis=0) * fy
        cur = dtab_ref[pl.ds(b0, win), :]
        dtab_ref[pl.ds(b0, win), :] = cur + w
    dsh_ref[...] = jnp.concatenate(dsh_rows, axis=0)


def _bwd_kernel_g2(idx_ref, frac_ref, tab_ref, db_ref, dtab_ref, dsh_ref):
    """Variant G2: m-fold with INDEPENDENT dynamic rolls (the fwd A/B shows
    derived static rolls serialize worse than independent dynamic ones)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dtab_ref[...] = jnp.zeros_like(dtab_ref)

    side = db_ref.shape[1]
    cn = tab_ref.shape[1]
    win = _tbl_win_rows(side)
    dsh_rows = []
    for g in range(_TBL_ROWS):
        b = idx_ref[g, 0]
        ox = idx_ref[g, 4]
        fy = frac_ref[g, 0]
        fx = frac_ref[g, 1]
        b0 = (b // 8) * 8
        rem = b - b0
        dw = db_ref[g]
        t = tab_ref[pl.ds(b0, win), :]
        r1 = pltpu.roll(t, win - rem, axis=0)
        r2 = pltpu.roll(t, win - rem - 1, axis=0)
        dyt = r2 - r1
        ty = r1 * (1.0 - fy) + r2 * fy
        dwpad = jnp.pad(dw, ((0, win - side), (0, cn - side)))
        s = pltpu.roll(dwpad, ox, axis=1)
        s2 = pltpu.roll(dwpad, ox + 1, axis=1)
        m = s * (1.0 - fx) + s2 * fx
        dfx = _tbl_sum2d((s2 - s) * ty)
        dfy = _tbl_sum2d(m * dyt)
        dsh_rows.append(jnp.concatenate([dfy, dfx], axis=1))
        w = (pltpu.roll(m, rem, axis=0) * (1.0 - fy)
             + pltpu.roll(m, rem + 1, axis=0) * fy)
        cur = dtab_ref[pl.ds(b0, win), :]
        dtab_ref[pl.ds(b0, win), :] = cur + w
    dsh_ref[...] = jnp.concatenate(dsh_rows, axis=0)


def _bwd_kernel_gd(idx_ref, frac_ref, tab_ref, db_ref, dtab_ref, dsh_ref):
    """Variant GD: G + per-g split accumulators [8, rows, cn]."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dtab_ref[...] = jnp.zeros_like(dtab_ref)

    side = db_ref.shape[1]
    cn = tab_ref.shape[1]
    win = _tbl_win_rows(side)
    dsh_rows = []
    for g in range(_TBL_ROWS):
        b = idx_ref[g, 0]
        ox = idx_ref[g, 4]
        fy = frac_ref[g, 0]
        fx = frac_ref[g, 1]
        b0 = (b // 8) * 8
        rem = b - b0
        dw = db_ref[g]
        t = tab_ref[pl.ds(b0, win), :]
        r1 = pltpu.roll(t, win - rem, axis=0)
        r2 = pltpu.roll(r1, win - 1, axis=0)
        dyt = r2 - r1
        ty = r1 * (1.0 - fy) + r2 * fy
        dwpad = jnp.pad(dw, ((0, win - side), (0, cn - side)))
        s = pltpu.roll(dwpad, ox, axis=1)
        s2 = pltpu.roll(s, 1, axis=1)
        m = s * (1.0 - fx) + s2 * fx
        dfx = _tbl_sum2d((s2 - s) * ty)
        dfy = _tbl_sum2d(m * dyt)
        dsh_rows.append(jnp.concatenate([dfy, dfx], axis=1))
        mr = pltpu.roll(m, rem, axis=0)
        w = mr * (1.0 - fy) + pltpu.roll(mr, 1, axis=0) * fy
        cur = dtab_ref[g, pl.ds(b0, win), :]
        dtab_ref[g, pl.ds(b0, win), :] = cur + w
    dsh_ref[...] = jnp.concatenate(dsh_rows, axis=0)


def _fwd_kernel_f(idx_ref, frac_ref, tab_ref, out_ref):
    """Variant F: second row/lane taps via derived static rolls."""
    side = out_ref.shape[1]
    cn = tab_ref.shape[1]
    win = _tbl_win_rows(side)
    for g in range(_TBL_ROWS):
        b = idx_ref[g, 0]
        ox = idx_ref[g, 4]
        fy = frac_ref[g, 0]
        fx = frac_ref[g, 1]
        b0 = (b // 8) * 8
        rem = b - b0
        t = tab_ref[pl.ds(b0, win), :]
        r1 = pltpu.roll(t, win - rem, axis=0)
        r2 = pltpu.roll(r1, win - 1, axis=0)
        ty = r1 * (1.0 - fy) + r2 * fy
        l1 = pltpu.roll(ty, cn - ox, axis=1)
        l2 = pltpu.roll(l1, cn - 1, axis=1)
        out_ref[g] = (l1 * (1.0 - fx) + l2 * fx)[:side, :side]


# --------------------------------------------------------------------------
# harness
# --------------------------------------------------------------------------

def _geom():
    h, t0, rn, tn = _tbl_consts(SIDE, 1, KV_BOUND)
    split = rn - 128
    rpad = _tbl_split_rows(SIDE, rn)
    return rn, split, 2 * rpad


def _make_inputs(rng, r):
    rn, split, rows = _geom()
    r_pad = _round_up(r, _TBL_ROWS)
    hi = float((rn - SIDE) - 1)
    shifts = jnp.asarray(rng.uniform(0.0, hi, size=(r, 2)), jnp.float32)
    tablep = jnp.asarray(rng.standard_normal((rows, 128)), jnp.float32)
    db = jnp.asarray(rng.standard_normal((r, SIDE, SIDE)), jnp.float32)
    idx, frac = _tbl_idx(shifts, SIDE, 1, rn, split)
    idx = _pad_n(idx, r_pad, axis=0)
    frac = _pad_n(frac, r_pad, axis=0)
    dbp = _pad_n(db, r_pad, axis=0)
    return tablep, shifts, idx, frac, dbp, r


INTERPRET = False  # set True off-TPU (CPU golden validation, no timing)


def _bwd_call(kernel, split_acc, tablep, idx, frac, dbp):
    rows, cn = tablep.shape
    r_pad = idx.shape[0]
    dtab_shape = ((_TBL_ROWS, rows, cn) if split_acc else (rows, cn))
    dtab, dsh = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        grid=(r_pad // _TBL_ROWS,),
        in_specs=[
            pl.BlockSpec((_TBL_ROWS, 6), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_TBL_ROWS, 2), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((_TBL_ROWS, SIDE, SIDE), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((_TBL_ROWS, 2), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(dtab_shape, jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 2), jnp.float32),
        ],
    )(idx, frac, tablep, dbp)
    if split_acc:
        dtab = dtab.sum(axis=0)
    return dtab, dsh


def _fwd_call(kernel, tablep, idx, frac):
    r_pad = idx.shape[0]
    return pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        grid=(r_pad // _TBL_ROWS,),
        in_specs=[
            pl.BlockSpec((_TBL_ROWS, 6), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_TBL_ROWS, 2), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TBL_ROWS, SIDE, SIDE), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((r_pad, SIDE, SIDE), jnp.float32),
    )(idx, frac, tablep)


def _timed(fn, *args, iters=ITERS):
    """Chained scan x iters, one readback.  NOTE: the dispatch+readback
    overhead (~28 ms roundtrip) is AMORTIZED over iters, not subtracted —
    so at ITERS=30 the reported ms/iter carry ~1 ms of overhead.  Absolute
    numbers are therefore inflated; A/B rankings are unaffected because the
    overhead is identical across variants."""
    @jax.jit
    def chained(tablep, *rest):
        def body(tp, _):
            outs = fn(tp, *rest)
            d = outs[0] if isinstance(outs, (tuple, list)) else outs
            probe = d.reshape(-1)[:1] * 1e-30
            return tp + probe[0], jnp.float32(0.0)

        tp, _ = jax.lax.scan(body, tablep, None, length=iters)
        return tp.reshape(-1)[0]

    float(chained(*args))  # compile + warm
    t0 = time.perf_counter()
    float(chained(*args))
    dt = time.perf_counter() - t0
    # per-call dispatch+readback overhead is identical across variants and
    # amortized /iters — fine for an interleaved A/B
    return dt / iters * 1e3  # ms


def main():
    global INTERPRET
    on_tpu = jax.default_backend() not in ("cpu",)
    if not on_tpu:
        INTERPRET = True
        print("CPU: interpret-mode golden checks only, no timing")
    rng = np.random.default_rng(0)
    rn, split, rows = _geom()
    r = BH * K if on_tpu else 32  # interpret mode is slow: tiny R on CPU
    print(f"geometry: side={SIDE} rn={rn} split={split} rows={rows} R={r}")
    tablep, shifts, idx, frac, dbp, r = _make_inputs(rng, r)

    # --- golden checks vs autodiff of the jnp reference -------------------
    ref_out, ref_vjp = jax.vjp(
        lambda tp, sh: _tbl_interp_ref(tp, sh, SIDE, 1, rn, split),
        tablep, shifts)
    dtab_ref_, dsh_ref_ = ref_vjp(dbp[:r])
    for name, kern, sacc in [("A", _tbl_d1_bwd_kernel, False),
                             ("G", _bwd_kernel_g, False),
                             ("G2", _bwd_kernel_g2, False),
                             ("GD", _bwd_kernel_gd, True)]:
        dtab, dsh = jax.jit(functools.partial(_bwd_call, kern, sacc))(
            tablep, idx, frac, dbp)
        err_t = float(jnp.max(jnp.abs(dtab - dtab_ref_)))
        err_s = float(jnp.max(jnp.abs(dsh[:r] - dsh_ref_)))
        scale = float(jnp.max(jnp.abs(dtab_ref_)))
        scale_s = float(jnp.max(jnp.abs(dsh_ref_)))
        print(f"bwd {name}: max|dtab err| {err_t:.3e} (scale {scale:.2e}), "
              f"max|dsh err| {err_s:.3e} (scale {scale_s:.2e})")
        # dsh tolerance: the in-kernel _tbl_sum2d ones-matmul runs TPU
        # default (bf16-pass) precision -> ~2e-3 relative vs the XLA
        # reference's f32 reduce; exact in CPU interpret mode.
        tol_s = (1e-3 if INTERPRET else 5e-3) * max(scale_s, 1.0)
        assert err_t < 1e-3 * max(scale, 1.0), name
        assert err_s < tol_s, name
    for name, kern in [("A", _tbl_d1_fwd_kernel), ("F", _fwd_kernel_f)]:
        out = jax.jit(functools.partial(_fwd_call, kern))(tablep, idx, frac)
        err = float(jnp.max(jnp.abs(out[:r] - ref_out)))
        print(f"fwd {name}: max err {err:.3e}")
        assert err < 1e-4, name

    # --- interleaved timing ------------------------------------------------
    if not on_tpu:
        print("golden checks passed; skipping timing off-TPU")
        return
    bwd_fns = {
        "A": functools.partial(_bwd_call, _tbl_d1_bwd_kernel, False),
        "G": functools.partial(_bwd_call, _bwd_kernel_g, False),
        "G2": functools.partial(_bwd_call, _bwd_kernel_g2, False),
        "GD": functools.partial(_bwd_call, _bwd_kernel_gd, True),
    }
    fwd_fns = {
        "fA": functools.partial(_fwd_call, _tbl_d1_fwd_kernel),
        "fF": functools.partial(_fwd_call, _fwd_kernel_f),
    }
    best = {k: float("inf") for k in list(bwd_fns) + list(fwd_fns)}
    for rep in range(REPS):
        for k, fn in bwd_fns.items():
            best[k] = min(best[k], _timed(fn, tablep, idx, frac, dbp))
        for k, fn in fwd_fns.items():
            best[k] = min(best[k], _timed(fn, tablep, idx, frac))
        print(f"rep {rep}: " + " ".join(f"{k}={best[k]:.3f}" for k in best))
    print("RESULT " + " ".join(f"{k}={best[k]:.3f}ms" for k in best))


if __name__ == "__main__":
    main()
