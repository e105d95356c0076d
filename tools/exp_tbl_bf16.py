"""Train-step A/B: f32 vs bf16 table-interp window stores (cpb_table_bf16).

Follow-on to the adopted bf16 sim/attn streams (r5): the d1 table interp's
[R, side, side] window output, its [R,side,side]->[BH,K,N] relayout and
the bias-add read are still f32.  TBL_BF16_OUT quantizes only the window
STORE (interp arithmetic stays f32 in-kernel; backward window cotangents
arrive bf16 and are upcast per-row in-kernel, dtab/dsh accumulate f32),
halving those streams both ways.

Interleaved min-of-N in one process, same harness as
tools/exp_attn_bf16_streams.py; production operating point
(cpb_table_divisor=1 + attn_bf16_streams) on both sides.

Usage: python tools/exp_tbl_bf16.py [--mode teacher] [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build(mode, B, fixdim, tbl_bf16):
    import jax

    from disentangled_multimodal_learning_tpu.config import Config
    from disentangled_multimodal_learning_tpu.data import (BagLoader,
                                                           SyntheticBagDataset)
    from disentangled_multimodal_learning_tpu.models.factory import define_net
    from disentangled_multimodal_learning_tpu.train.optim import make_optimizer
    from disentangled_multimodal_learning_tpu.train.steps import (
        batch_to_arrays, make_train_step)
    from disentangled_multimodal_learning_tpu.train.trainers import (
        init_model_state)

    cfg = Config(mode=mode, task_type="diag2021", label_dim=4,
                 fixdim=fixdim, batch_size=B, gradient_modulate=True,
                 multiscale_attention=True, cpb_table_divisor=1,
                 attn_bf16_streams=True, cpb_table_bf16=tbl_bf16,
                 checkpoints="#", debug=True).validate()
    ds = SyntheticBagDataset(size=B, fixdim=fixdim, label_dim=4, seed=0,
                             args=cfg)
    batch = next(iter(BagLoader(ds, B, shuffle=False)))
    arrays = batch_to_arrays(batch)
    model = define_net(cfg)
    tx = make_optimizer(cfg, 100)
    state = init_model_state(model, cfg, batch, tx)
    step = jax.jit(make_train_step(model, cfg, tx), donate_argnums=(0,))
    return state, arrays, step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="teacher")
    ap.add_argument("--fixdim", type=int, default=2500)
    ap.add_argument("--B", type=int, default=4)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")

    def fence(s):
        return float(jax.tree_util.tree_leaves(s.params)[0].sum())

    setups = {}
    for flag in (True, False):
        state, arrays, step = build(args.mode, args.B, args.fixdim, flag)
        rng = jax.random.PRNGKey(0)
        for _ in range(3):
            rng, k = jax.random.split(rng)
            state, _ = step(state, arrays, k, None)
        fence(state)
        setups[flag] = {"state": state, "arrays": arrays, "step": step,
                        "rng": rng, "best": None}
        print(f"[tbl_bf16] cpb_table_bf16={flag} compiled", flush=True)

    some = next(iter(setups.values()))
    t0 = time.perf_counter()
    fence(some["state"])
    roundtrip = time.perf_counter() - t0

    for rep in range(args.reps):
        for flag, su in setups.items():
            state, rng = su["state"], su["rng"]
            t0 = time.perf_counter()
            for _ in range(args.iters):
                rng, k = jax.random.split(rng)
                state, _ = su["step"](state, su["arrays"], k, None)
            fence(state)
            dt = max(time.perf_counter() - t0 - roundtrip, 1e-6)
            su["state"], su["rng"] = state, rng
            su["best"] = dt if su["best"] is None else min(su["best"], dt)
            print(f"[tbl_bf16] rep {rep} cpb_table_bf16={flag}: "
                  f"{args.B * args.iters / dt:.1f} bags/s", flush=True)

    results = {str(flag): args.B * args.iters / su["best"]
               for flag, su in setups.items()}
    print("RESULT " + json.dumps({"mode": args.mode, "bags_per_s": results}))


if __name__ == "__main__":
    main()
