"""On-chip A/B: exact v7 transposed CPB kernel vs table-interpolated CPB (v9).

Production geometry: side=50 (fixdim 2500), K=144, BH=32 (B=4 x 8 groups),
one attention's worth of CPB per call.  Interleaved min-of-N in ONE process
(CLAUDE.md: tunnel drift makes anything else untrustworthy), fwd and
fwd+bwd, plus the max |bias| gap between the two at the measured weights.

Run on the chip: python tools/exp_cpb_table.py [--iters 5] [--divisors 2 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--divisors", type=int, nargs="*", default=[2, 4])
    ap.add_argument("--side", type=int, default=50)
    ap.add_argument("--K", type=int, default=144)
    ap.add_argument("--BH", type=int, default=32)
    ap.add_argument("--chain", type=int, default=8,
                    help="dependent calls per timing (amortize dispatch)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from disentangled_multimodal_learning_tpu.ops.pallas.deform_attn import (
        HID, cpb_bias_table, cpb_bias_transposed)

    side, K, BH = args.side, args.K, args.BH
    N = side * side
    rng = np.random.default_rng(0)
    lin = 2.0 * np.arange(side) / (side - 1) - 1.0
    gx, gy = np.meshgrid(lin, lin)
    grid_q = jnp.asarray(np.stack([gx.reshape(-1), gy.reshape(-1)], -1),
                         jnp.float32)
    kv_bound = 1.0 + 8.0 / 11.0   # gh=12, offset_scale=4 (production)
    gkv = jnp.asarray(
        rng.uniform(-kv_bound, kv_bound, size=(BH, K, 2)), jnp.float32)
    params = (
        jnp.asarray(rng.normal(size=(2, HID)) / np.sqrt(2), jnp.float32),
        jnp.zeros(HID),
        jnp.asarray(rng.normal(size=(HID, HID)) / np.sqrt(HID), jnp.float32),
        jnp.zeros(HID),
        jnp.asarray(rng.normal(size=(HID, 1)) / np.sqrt(HID), jnp.float32),
        jnp.zeros(1))

    def exact_fwd(gkv_, *p):
        return cpb_bias_transposed(grid_q, gkv_, *p)

    def table_fwd(div):
        def f(gkv_, *p):
            return cpb_bias_table(gkv_, *p, side=side, divisor=div,
                                  kv_bound=kv_bound)
        return f

    def chain(fn):
        def c(gkv_, *p):
            x = gkv_
            tot = 0.0
            for i in range(args.chain):
                out = fn(x, *p)
                tot = tot + jnp.sum(out) * 1e-6
                # data dependency: feed a tiny function of out back in
                x = gkv_ + 1e-9 * tot
            return tot            # scalar readback: no 46 MB host shipping
        return jax.jit(c)

    def chain_bwd(fn):
        def loss(gkv_, *p):
            x = gkv_
            tot = 0.0
            for i in range(args.chain):
                b = fn(x, *p)
                tot = tot + jnp.sum(b * b) * 1e-6
                x = gkv_ + 1e-9 * tot
            return tot
        return jax.jit(jax.grad(loss, argnums=(0, 1, 3, 5)))

    def fence(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return np.asarray(leaf.ravel()[:1] if leaf.ndim else leaf)

    variants = [("exact_v7", chain(exact_fwd), chain_bwd(exact_fwd))]
    for d in args.divisors:
        variants.append((f"table_d{d}", chain(table_fwd(d)),
                         chain_bwd(table_fwd(d))))

    # accuracy gap at these weights
    be = exact_fwd(gkv, *params)
    for name, _, _ in variants[1:]:
        d = int(name.split("_d")[1])
        bt = cpb_bias_table(gkv, *params, side=side, divisor=d,
                            kv_bound=kv_bound)
        gap = float(jnp.abs(bt - be).max())
        rng_ = float(be.max() - be.min())
        print(f"{name}: max|bias gap| = {gap:.2e} (range {rng_:.3f})")

    # warm up everything (compiles + platform init), THEN measure the
    # empty-roundtrip floor
    for name, f, g in variants:
        fence(f(gkv, *params))
        fence(g(gkv, *params))
    z = jnp.zeros(())
    np.asarray(z + 0.0)
    t0 = time.perf_counter()
    for i in range(5):
        np.asarray(z + float(i + 1))  # fresh dispatch+readback each time
    floor = (time.perf_counter() - t0) / 5

    best = {name: [1e9, 1e9] for name, _, _ in variants}
    for it in range(args.iters):
        for name, f, g in variants:
            t0 = time.perf_counter()
            fence(f(gkv, *params))
            dt = (time.perf_counter() - t0 - floor) / args.chain * 1e3
            best[name][0] = min(best[name][0], dt)
            t0 = time.perf_counter()
            fence(g(gkv, *params))
            dt = (time.perf_counter() - t0 - floor) / args.chain * 1e3
            best[name][1] = min(best[name][1], dt)
    print(f"\nper-call ms (chain={args.chain}, min of {args.iters}, "
          f"floor {floor*1e3:.1f} ms):")
    for name, (fw, bw) in best.items():
        print(f"  {name:10s} fwd {fw:6.2f}  fwd+bwd {bw:6.2f}")


if __name__ == "__main__":
    main()
