"""On-chip per-cotangent diagnostic for the v10 fused table attention.

The r4 e2e parity check failed only on real TPU (interpret mode passes):
worst rel grad error 1.16e+02 on rel_pos_bias.mlp_out_bias, i.e. the
table cotangent path.  This probe runs the kernel's own VJP against the
jnp reference at production side=50 and reports each of
dq/dk/dv/dtab/dsh separately so the mis-lowered primitive can be
isolated.

Usage: python tools/exp_v10_chipdiag.py [--BH 2] [--K 16]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--BH", type=int, default=2)
    ap.add_argument("--K", type=int, default=16)
    ap.add_argument("--side", type=int, default=50)
    ap.add_argument("--kv-bound", type=float, default=2.5)
    args = ap.parse_args()

    from disentangled_multimodal_learning_tpu.ops.pallas import (
        deform_attn as da)

    rng = np.random.default_rng(0)
    side, K, BH, D = args.side, args.K, args.BH, 8
    N = side * side
    hid = 32
    w1 = jnp.asarray(rng.normal(size=(2, hid)) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(hid,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(hid, hid)) * 0.3, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(hid,)) * 0.1, jnp.float32)
    w3 = jnp.asarray(rng.normal(size=(hid, 1)) * 0.3, jnp.float32)
    b3 = jnp.asarray(rng.normal(size=(1,)) * 0.1, jnp.float32)
    gkv = jnp.asarray(rng.uniform(-args.kv_bound, args.kv_bound,
                                  size=(BH, K, 2)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(BH, N, D)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.normal(size=(BH, K, D)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.normal(size=(BH, K, D)), jnp.float32)
    tablep, shifts, rn, split = da.cpb_bias_table_parts(
        gkv, w1, b1, w2, b2, w3, b3, side=side, kv_bound=args.kv_bound)
    print(f"backend={jax.default_backend()} rn={rn} split={split} "
          f"tablep={tablep.shape}", flush=True)
    seed = jnp.zeros((), jnp.float32)
    interp = jax.default_backend() != "tpu"

    out, attn = jax.jit(
        lambda *a: da.fused_table_attention(*a, side, rn, split, 0.0,
                                            interp))(q, k, v, tablep,
                                                     shifts, seed)
    ref_out, ref_attn = da._v10_ref(q, k, v, tablep, shifts, side, rn, split)
    print(f"fwd out err {float(jnp.abs(out - ref_out).max()):.2e} "
          f"attn err {float(jnp.abs(attn - ref_attn).max()):.2e}", flush=True)

    go = jnp.asarray(rng.normal(size=out.shape), jnp.float32)
    ga = jnp.asarray(rng.normal(size=attn.shape), jnp.float32)

    def loss_f(q, k, v, tablep, shifts):
        o, a = da.fused_table_attention(q, k, v, tablep, shifts, seed,
                                        side, rn, split, 0.0, interp)
        return jnp.sum(o * go) + jnp.sum(a * ga)

    def loss_r(q, k, v, tablep, shifts):
        o, a = da._v10_ref(q, k, v, tablep, shifts, side, rn, split)
        return jnp.sum(o * go) + jnp.sum(a * ga)

    gf = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2, 3, 4)))(
        q, k, v, tablep, shifts)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2, 3, 4)))(
        q, k, v, tablep, shifts)
    for n, a, b in zip(["dq", "dk", "dv", "dtab", "dsh"], gf, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-8
        err = float(jnp.max(jnp.abs(a - b))) / scale
        print(f"  {n:5s} rel err {err:.2e}  (scale {scale:.3e})", flush=True)


if __name__ == "__main__":
    main()
