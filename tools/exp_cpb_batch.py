"""CPB launch batching A/B (VERDICT r2 #9 stretch).

Hypothesis: the teacher's 4 deformable attentions each launch the v7
transposed CPB kernel (fwd+bwd); one stacked launch over [4*BH, K, 2] rows
would amortize per-launch setup.  Counter-argument: at BH=32, K=144 each
launch already runs R/_T_ROWS = 576 grid steps, so per-LAUNCH overhead is
amortized 576x and the measured ~55%-of-peak MLP rate comes from the
32-sublane slab shapes, not launch setup.

This microbenchmark measures the upper bound of the batching win: 4
sequential kernel calls (separate weights, like the 4 independent CPB
modules) vs ONE call on 4x-stacked rows (shared weights — a real
implementation would need per-segment weight indexing, which can only be
slower).  fwd and fwd+bwd, interleaved min-of-N in one process.

Usage:  python tools/exp_cpb_batch.py [--iters 20] [--reps 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from disentangled_multimodal_learning_tpu.ops.pallas.deform_attn import (
        HID, cpb_bias_transposed)

    BH, K, N = 32, 144, 2500  # teacher production shapes (B=4, G=8)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)
    grid_q = jax.random.uniform(ks[0], (N, 2), jnp.float32) * 50.0
    gkv4 = jax.random.uniform(ks[1], (4, BH, K, 2), jnp.float32) * 50.0
    w1s = jax.random.normal(ks[2], (4, 2, HID), jnp.float32) * 0.1
    b1s = jnp.zeros((4, HID))
    w2s = jax.random.normal(ks[3], (4, HID, HID), jnp.float32) * 0.1
    b2s = jnp.zeros((4, HID))
    w3s = jax.random.normal(ks[4], (4, HID, 1), jnp.float32) * 0.1
    b3s = jnp.zeros((4, 1))

    def four_calls(gkv4, w1s, b1s, w2s, b2s, w3s, b3s):
        outs = [cpb_bias_transposed(grid_q, gkv4[i], w1s[i], b1s[i],
                                    w2s[i], b2s[i], w3s[i], b3s[i])
                for i in range(4)]
        return sum(jnp.sum(o * o) for o in outs)

    def one_call(gkv4, w1s, b1s, w2s, b2s, w3s, b3s):
        stacked = gkv4.reshape(4 * BH, K, 2)
        o = cpb_bias_transposed(grid_q, stacked, w1s[0], b1s[0],
                                w2s[0], b2s[0], w3s[0], b3s[0])
        return jnp.sum(o * o)

    fns = {
        "four_fwd": jax.jit(four_calls),
        "one_fwd": jax.jit(one_call),
        "four_fwdbwd": jax.jit(jax.grad(four_calls, argnums=(0, 1))),
        "one_fwdbwd": jax.jit(jax.grad(one_call, argnums=(0, 1))),
    }
    arrs = (gkv4, w1s, b1s, w2s, b2s, w3s, b3s)

    def fence(x):
        return float(jnp.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])

    outs = {}
    for name, fn in fns.items():
        outs[name] = fn(*arrs)
        fence(outs[name])
    t0 = time.perf_counter()
    fence(outs["four_fwd"])
    rt = time.perf_counter() - t0

    best = {name: None for name in fns}
    for rep in range(args.reps):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            o = None
            for _ in range(args.iters):
                o = fn(*arrs)
            fence(o)
            dt = max(time.perf_counter() - t0 - rt, 1e-6) / args.iters
            best[name] = dt if best[name] is None else min(best[name], dt)
            print(f"[cpbb] rep {rep} {name}: {dt * 1e3:.3f} ms", flush=True)

    print({name: round(v * 1e3, 3) for name, v in best.items()})
    for tag in ("fwd", "fwdbwd"):
        f, o = best[f"four_{tag}"], best[f"one_{tag}"]
        print(f"{tag}: four={f*1e3:.3f} ms one={o*1e3:.3f} ms "
              f"win={100 * (f - o) / f:.1f}%")


if __name__ == "__main__":
    main()
