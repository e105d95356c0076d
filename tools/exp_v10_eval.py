"""Eval-step (need_attention=False) A/B: v9 unfused table CPB vs v10 fused
table attention, at divisor 1 (VERDICT r4 #2b).

The metrics-eval step drops the attention-map outputs
(make_eval_step(need_attention=False), the Evaluator default), so XLA
DCE's their materialization in the unfused path — the case the r4 v10
teacher-TRAIN negative doesn't cover.  Note v10's forward always writes its
attn output (it is the backward residual), so the prior fwd numbers
(1.13 fused vs 0.70 unfused ms/attention) predict a negative here too;
this records the end-to-end number either way.

Same chained-eval harness as tools/bench_eval.py, interleaved min-of-N in
one process.

Usage: python tools/exp_v10_eval.py [--mode teacher] [--iters 50] [--reps 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build(mode, B, fixdim, fused):
    import jax

    from disentangled_multimodal_learning_tpu.config import Config
    from disentangled_multimodal_learning_tpu.data import (BagLoader,
                                                           SyntheticBagDataset)
    from disentangled_multimodal_learning_tpu.models.factory import define_net
    from disentangled_multimodal_learning_tpu.train.optim import make_optimizer
    from disentangled_multimodal_learning_tpu.train.steps import (
        batch_to_arrays, make_eval_step)
    from disentangled_multimodal_learning_tpu.train.trainers import (
        init_model_state)

    kw = dict(mode=mode, task_type="diag2021", label_dim=4, fixdim=fixdim,
              batch_size=B, checkpoints="#", debug=True, cpb_table_divisor=1,
              fused_table_attention=fused)
    if mode == "deformpathomic":
        kw.update(return_vgrid=True, gradient_modulate=True)
    cfg = Config(**kw).validate()
    ds = SyntheticBagDataset(size=B, fixdim=fixdim, label_dim=4, seed=0,
                             args=cfg)
    batch = next(iter(BagLoader(ds, B, shuffle=False)))
    arrays = batch_to_arrays(batch)
    model = define_net(cfg)
    if mode == "distillation":
        model = model[0]
    state = init_model_state(model, cfg, batch, make_optimizer(cfg, 1))
    step = jax.jit(make_eval_step(model, cfg, need_attention=False))
    return state, arrays, step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="teacher")
    ap.add_argument("--fixdim", type=int, default=2500)
    ap.add_argument("--B", type=int, default=4)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")

    def probe(out):
        return jnp.sum(jax.tree_util.tree_leaves(out)[0]) * 0.0

    setups = {}
    for fused in (True, False):
        state, arrays, step = build(args.mode, args.B, args.fixdim, fused)
        out = step(state.params, state.batch_stats, arrays)
        float(probe(out) + 1.0)  # compile + fence (before the next build
        # flips the FUSED_TABLE_ATTENTION module global — trace-time read)
        setups[fused] = {"state": state, "arrays": arrays, "step": step,
                         "best": None}
        print(f"[v10_eval] fused={fused} compiled", flush=True)

    some = next(iter(setups.values()))
    out = some["step"](some["state"].params, some["state"].batch_stats,
                       some["arrays"])
    t0 = time.perf_counter()
    float(probe(out) + 1.0)
    rt = time.perf_counter() - t0

    for rep in range(args.reps):
        for fused, su in setups.items():
            state, arrays, step = su["state"], su["arrays"], su["step"]
            t0 = time.perf_counter()
            carry = jnp.float32(0.0)
            for _ in range(args.iters):
                arr = dict(arrays)
                arr["x_omic"] = arrays["x_omic"] + carry
                out = step(state.params, state.batch_stats, arr)
                carry = probe(out)
            float(carry)
            dt = max(time.perf_counter() - t0 - rt, 1e-9)
            su["best"] = dt if su["best"] is None else min(su["best"], dt)
            print(f"[v10_eval] rep {rep} fused={fused}: "
                  f"{args.B * args.iters / dt:.1f} bags/s", flush=True)

    results = {str(f): args.B * args.iters / su["best"]
               for f, su in setups.items()}
    print("RESULT " + json.dumps({"mode": args.mode,
                                  "eval_bags_per_s": results}))


if __name__ == "__main__":
    main()
