"""1-D deformable attention A/B on chip: bf16 vs f32 materialized streams.

PERF.md's post-v10 headroom section names this the one untried lever for
the `attn_dim=1` mode (reference models/DeformCrossTransMIL.py:113-149):
the 1-D attention's ~20 ms/call floor is set by its [B,H,K,N] sim/attn
streams (K ~= N/4 = 626 at downsample 4 — 4.3x the 2-D mode's K=144), so
the bf16-streams trade that won +15% on the 2-D teacher should transfer.
Measures fwd and fwd+bwd for {exact, table-d1} x {f32, bf16} streams,
interleaved min-of-N, chained-scan amortized dispatch, one process.

Usage: python tools/exp_attn1d_bf16.py [--iters 10] [--reps 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

B, N, C = 4, 2501, 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from disentangled_multimodal_learning_tpu.models import (
        deform_attention as dam)

    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    kw = dict(dim=C, dim_head=64, heads=8, offset_groups=4, dropout=0.0,
              downsample_factor=4, offset_scale=2.0, offset_kernel_size=6,
              attn_layout="kn")

    def make_chained(fn, iters):
        @jax.jit
        def chained(x0):
            def body(c, _):
                d = fn(c)
                probe = jnp.asarray(d).reshape(-1)[:1].astype(jnp.float32)
                return c + probe[0] * 1e-30, jnp.float32(0.0)

            c, _ = jax.lax.scan(body, x0, None, length=iters)
            return c.reshape(-1)[0]

        return chained

    setups = {}
    for name, div, bf16 in (("exact_f32", 0, False), ("exact_bf16", 0, True),
                            ("tbl_f32", 1, False), ("tbl_bf16", 1, True)):
        dam.ATTN_BF16_STREAMS = bf16
        mod = dam.DeformCrossAttention1D(**kw, cpb_table_divisor=div)
        variables = mod.init(jax.random.PRNGKey(0), x1, x2,
                             deterministic=True)

        def fwd(a, v=variables, m=mod):
            return m.apply(v, a, x2, deterministic=True)

        def fwdbwd(a, v=variables, m=mod):
            return jax.grad(lambda z: jnp.sum(
                m.apply(v, z, x2, deterministic=True)))(a)

        cf = make_chained(fwd, args.iters)
        cb = make_chained(fwdbwd, args.iters)
        float(cf(x1))  # compile before the next flag flip (the streams
        float(cb(x1))  # global is read at trace time)
        setups[name] = {"cf": cf, "cb": cb,
                        "best_f": float("inf"), "best_b": float("inf")}
        print(f"[attn1d_bf16] {name} compiled", flush=True)
    dam.ATTN_BF16_STREAMS = False

    for rep in range(args.reps):
        for name, su in setups.items():
            t0 = time.perf_counter()
            float(su["cf"](x1))
            su["best_f"] = min(su["best_f"],
                               (time.perf_counter() - t0) / args.iters * 1e3)
            t0 = time.perf_counter()
            float(su["cb"](x1))
            su["best_b"] = min(su["best_b"],
                               (time.perf_counter() - t0) / args.iters * 1e3)
            print(f"[attn1d_bf16] rep {rep} {name}: fwd {su['best_f']:.2f} "
                  f"fwdbwd {su['best_b']:.2f} ms", flush=True)

    print("RESULT " + json.dumps({
        name: {"fwd_ms": round(su["best_f"], 3),
               "fwdbwd_ms": round(su["best_b"], 3)}
        for name, su in setups.items()}))


if __name__ == "__main__":
    main()
