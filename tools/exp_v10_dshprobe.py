"""Isolate the v10 backward's dsh miscompute on real TPU (r4).

tools/exp_v10_chipdiag.py shows dsh rel err 7.3e-2 on chip (interpret
passes; dtab through the same dw/roll machinery is clean), unchanged by
moving the per-row store to a [K, 1, 2] leading-axis scratch.  This probe
runs ONLY the ibwd dsh chain (no attention) in four variants:

  A fori   — exact current ibwd: fori_loop, full math, dynamic [K,1,2]
             scratch store, scratch[:, 0, :] readout
  B store  — fori_loop + same store/readout, but dfy/dfx are trivially
             checkable SMEM-derived constants (fy + r, fx + 2r): isolates
             the store path from the math
  C unroll — Python-unrolled loop (static r), dsh rows concatenated and
             stored once (the proven _tbl_d1_bwd_kernel pattern)
  D matsum — fori_loop + dynamic store, but the [win,cn]->[1,1] reduction
             is two chained matmuls (ones on both sides) instead of
             _tbl_sum2d's matmul + lane jnp.sum
  E high   — A, but the ones-matmul runs at Precision.HIGHEST (full-f32
             passes): tests the bf16-truncation-under-cancellation theory
  F vpu    — A, but the reduction is pure-VPU keepdims sums (no MXU)

Whichever variants fail point at the broken primitive.

Usage: python tools/exp_v10_dshprobe.py [--K 16]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from disentangled_multimodal_learning_tpu.ops.pallas import deform_attn as da


def _math(tab_ref, dw, b, ox, fy, fx, win, reduce):
    b0 = (b // 8) * 8
    rem = b - b0
    t = tab_ref[pl.ds(b0, win), :]
    r1 = pltpu.roll(t, win - rem, axis=0)
    r2 = pltpu.roll(r1, win - 1, axis=0)
    dyt = r2 - r1
    ty = r1 * (1.0 - fy) + r2 * fy
    s = pltpu.roll(dw, ox, axis=1)
    s2 = pltpu.roll(s, 1, axis=1)
    m = s * (1.0 - fx) + s2 * fx
    dfx = reduce((s2 - s) * ty)
    dfy = reduce(m * dyt)
    return dfy, dfx


def _sum2d_high(x):
    r = jax.lax.dot_general(jnp.ones((1, x.shape[0]), jnp.float32), x,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    return jnp.sum(r, axis=1, keepdims=True)


def _sum2d_vpu(x):
    return jnp.sum(jnp.sum(x, axis=0, keepdims=True), axis=1, keepdims=True)


def _matsum(x):
    r = jax.lax.dot_general(jnp.ones((1, x.shape[0]), jnp.float32), x,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return jax.lax.dot_general(r, jnp.ones((x.shape[1], 1), jnp.float32),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _kernel(idx_ref, frac_ref, tab_ref, dw_ref, dsh_ref, dsh_scratch, *,
            win, variant, K):
    if variant == "C":
        rows = []
        for r in range(K):
            dfy, dfx = _math(tab_ref, dw_ref[r], idx_ref[r, 0],
                             idx_ref[r, 4], frac_ref[r, 0], frac_ref[r, 1],
                             win, da._tbl_sum2d)
            rows.append(jnp.concatenate([dfy, dfx], axis=1))
        dsh_ref[...] = jnp.concatenate(rows, axis=0)
        return

    def body(r, _):
        if variant == "B":
            dfy = jnp.full((1, 1), frac_ref[r, 0] + r, jnp.float32)
            dfx = jnp.full((1, 1), frac_ref[r, 1] + 2.0 * r, jnp.float32)
        else:
            reduce = {"D": _matsum, "E": _sum2d_high,
                      "F": _sum2d_vpu}.get(variant, da._tbl_sum2d)
            dfy, dfx = _math(tab_ref, dw_ref[pl.ds(r, 1)][0], idx_ref[r, 0],
                             idx_ref[r, 4], frac_ref[r, 0], frac_ref[r, 1],
                             win, reduce)
        dsh_scratch[pl.ds(r, 1)] = jnp.concatenate([dfy, dfx], axis=1)[None]
        return 0

    jax.lax.fori_loop(0, K, body, 0)
    dsh_ref[...] = dsh_scratch[:, 0, :]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--K", type=int, default=16)
    ap.add_argument("--side", type=int, default=50)
    args = ap.parse_args()
    side, K = args.side, args.K

    rng = np.random.default_rng(0)
    hid = 32
    w1 = jnp.asarray(rng.normal(size=(2, hid)) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(hid,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(hid, hid)) * 0.3, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(hid,)) * 0.1, jnp.float32)
    w3 = jnp.asarray(rng.normal(size=(hid, 1)) * 0.3, jnp.float32)
    b3 = jnp.asarray(rng.normal(size=(1,)) * 0.1, jnp.float32)
    gkv = jnp.asarray(rng.uniform(-2.5, 2.5, size=(1, K, 2)), jnp.float32)
    tablep, shifts, rn, split = da.cpb_bias_table_parts(
        gkv, w1, b1, w2, b2, w3, b3, side=side, kv_bound=2.5)
    idx, frac = da._tbl_idx(shifts, side, 1, rn, split)
    win = da._tbl_win_rows(side)
    cn = tablep.shape[1]
    dw = rng.standard_normal((K, win, cn)).astype(np.float32)
    dw[:, side:, :] = 0.0
    dw[:, :, side:] = 0.0

    tab_np = np.asarray(tablep)
    idx_np, frac_np = np.asarray(idx), np.asarray(frac)
    want = np.zeros((K, 2), np.float32)
    for r in range(K):
        b, ox = idx_np[r, 0], idx_np[r, 4]
        fy, fx = frac_np[r, 0], frac_np[r, 1]
        b0 = (b // 8) * 8
        rem = b - b0
        t = tab_np[b0:b0 + win, :]
        r1 = np.roll(t, win - rem, axis=0)
        r2 = np.roll(r1, win - 1, axis=0)
        s = np.roll(dw[r], ox, axis=1)
        s2 = np.roll(s, 1, axis=1)
        m = s * (1.0 - fx) + s2 * fx
        want[r, 1] = np.sum((s2 - s) * (r1 * (1.0 - fy) + r2 * fy))
        want[r, 0] = np.sum(m * (r2 - r1))
    want_b = np.stack([frac_np[:, 0] + np.arange(K),
                       frac_np[:, 1] + 2.0 * np.arange(K)], axis=1)

    interpret = jax.default_backend() != "tpu"
    print(f"backend={jax.default_backend()} win={win} cn={cn} rn={rn} "
          f"split={split}", flush=True)
    for variant in ["B", "A", "D", "C", "E", "F"]:
        got = pl.pallas_call(
            functools.partial(_kernel, win=win, variant=variant, K=K),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_shape=jax.ShapeDtypeStruct((K, 2), jnp.float32),
            scratch_shapes=[pltpu.VMEM((K, 1, 2), jnp.float32)],
            interpret=interpret,
        )(idx, frac, tablep, jnp.asarray(dw))
        ref = want_b if variant == "B" else want
        scale = np.max(np.abs(ref)) + 1e-8
        err = float(np.max(np.abs(np.asarray(got) - ref))) / scale
        print(f"  variant {variant}: rel err {err:.2e}"
              + ("  <-- FAIL" if err > 1e-4 else ""), flush=True)


if __name__ == "__main__":
    main()
