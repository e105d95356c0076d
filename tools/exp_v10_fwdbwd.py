"""Kernel-level fwd vs bwd timing split: v9 unfused (table CPB -> XLA
attention) vs v10 fused table attention, production geometry
(BH=32, N=2500, K=144, D=64, side=50, divisor 1).

The e2e teacher train-step A/B came out -27% for v10
(tools/exp_v10_e2e.py: 206 vs 283 bags/s) despite clean parity; this
probe isolates whether the forward, the backward, or both lose.
Interleaved min-of-N in one process, chained dependent dispatches, one
readback, measured-roundtrip subtraction (CLAUDE.md timing rules).

Usage:  python tools/exp_v10_fwdbwd.py [--iters 20] [--reps 4] [--noattn]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--BH", type=int, default=32)
    ap.add_argument("--K", type=int, default=144)
    ap.add_argument("--D", type=int, default=64)
    ap.add_argument("--side", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from disentangled_multimodal_learning_tpu.ops.pallas import (
        deform_attn as da)

    BH, K, D, side = args.BH, args.K, args.D, args.side
    N = side * side
    kv_bound = 2.5  # production: offset_scale 4 / downsample 4 tanh bound
    rng = np.random.default_rng(0)

    w1 = jnp.asarray(rng.normal(size=(2, 32)) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(32,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(32, 32)) * 0.3, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(32,)) * 0.1, jnp.float32)
    w3 = jnp.asarray(rng.normal(size=(32, 1)) * 0.3, jnp.float32)
    b3 = jnp.asarray(rng.normal(size=(1,)) * 0.1, jnp.float32)
    gkv = jnp.asarray(rng.uniform(-kv_bound, kv_bound, size=(BH, K, 2)),
                      jnp.float32)
    q = jnp.asarray(rng.normal(size=(BH, N, D)) * 0.2, jnp.float32)
    k = jnp.asarray(rng.normal(size=(BH, K, D)) * 0.2, jnp.float32)
    v = jnp.asarray(rng.normal(size=(BH, K, D)), jnp.float32)
    go = jnp.asarray(rng.normal(size=(BH, N, D)), jnp.float32)
    ga = jnp.asarray(rng.normal(size=(BH, K, N)), jnp.float32)
    seed = jnp.zeros((), jnp.float32)

    tablep, shifts, rn, split = da.cpb_bias_table_parts(
        gkv, w1, b1, w2, b2, w3, b3, side=side, kv_bound=kv_bound)
    print(f"backend={jax.default_backend()} rn={rn} split={split}",
          flush=True)

    # ---- the four measured functions (all close over nothing large) ----
    def fused_fwd(q, k, v, tablep, shifts):
        out, attn = da.fused_table_attention(q, k, v, tablep, shifts, seed,
                                             side, rn, split, 0.0, False)
        return out, attn

    def unfused_fwd(q, k, v, tablep, shifts):
        wins = da._table_interp(tablep, shifts, side, 1, rn, split, False)
        bias = wins.reshape(BH, K, N)
        sim = jax.lax.dot_general(k, q, (((2,), (2,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32) + bias
        p = jax.nn.softmax(sim, axis=1)
        out = jax.lax.dot_general(p, v, (((1,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        return out, p

    def mkloss(f):
        def loss(q, k, v, tablep, shifts):
            o, a = f(q, k, v, tablep, shifts)
            return jnp.sum(o * go) + jnp.sum(a * ga)
        return jax.grad(loss, argnums=(0, 1, 2, 3, 4))

    cases = {
        "fused_fwd": jax.jit(fused_fwd),
        "unfused_fwd": jax.jit(unfused_fwd),
        "fused_grad": jax.jit(mkloss(fused_fwd)),
        "unfused_grad": jax.jit(mkloss(unfused_fwd)),
    }

    # compile + roundtrip
    outs = {n: f(q, k, v, tablep, shifts) for n, f in cases.items()}
    for o in outs.values():
        jax.block_until_ready(o)
    probe = jax.jit(lambda o: jnp.sum(jax.tree_util.tree_leaves(o)[0]) * 0.0)
    float(probe(outs["fused_fwd"]))
    t0 = time.perf_counter()
    float(probe(outs["fused_fwd"]))
    rt = time.perf_counter() - t0

    best = {n: None for n in cases}
    for rep in range(args.reps):
        for n, f in cases.items():
            carry = jnp.float32(0.0)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                o = f(q + carry, k, v, tablep, shifts)
                carry = probe(o)
            float(carry)
            dt = max(time.perf_counter() - t0 - rt, 1e-9)
            best[n] = dt if best[n] is None else min(best[n], dt)
    res = {n: round(1e3 * b / args.iters, 3) for n, b in best.items()}
    for n, ms in res.items():
        print(f"  {n:14s} {ms:8.3f} ms/call", flush=True)
    print(json.dumps({"RESULT": res, "BH": BH, "K": K, "N": N}))


if __name__ == "__main__":
    main()
