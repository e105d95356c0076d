"""Serving (eval-only) batch-size sweep on the real chip.

Training's operating point is B=4 (tools/exp_bsweep.py: backward memory
and the modest per-step win cap it), but serving has no backward — the
per-dispatch floor (~9 ms) and the fixed per-step overheads amortize
with B, so the serving optimum can sit much higher.  Same timing method
as tools/bench_eval.py (chained dependent evals, one readback, measured
roundtrip subtracted, min of REPS in one process), need_attention=False
(the Evaluator's metrics path).

Usage:  python tools/exp_eval_bsweep.py [--modes teacher,deformpathomic]
            [--batches 4,8,16,32] [--iters 30] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench(mode, B, fixdim, iters, reps):
    import jax
    import jax.numpy as jnp

    from disentangled_multimodal_learning_tpu.config import Config
    from disentangled_multimodal_learning_tpu.data import (BagLoader,
                                                           SyntheticBagDataset)
    from disentangled_multimodal_learning_tpu.models.factory import define_net
    from disentangled_multimodal_learning_tpu.train.optim import make_optimizer
    from disentangled_multimodal_learning_tpu.train.steps import (
        batch_to_arrays, make_eval_step)
    from disentangled_multimodal_learning_tpu.train.trainers import (
        init_model_state)

    cfg = Config(mode=mode, task_type="diag2021", label_dim=4, fixdim=fixdim,
                 batch_size=B, checkpoints="#", debug=True,
                 cpb_table_divisor=1).validate()
    ds = SyntheticBagDataset(size=B, fixdim=fixdim, label_dim=4, seed=0,
                             args=cfg)
    batch = next(iter(BagLoader(ds, B, shuffle=False)))
    arrays = batch_to_arrays(batch)
    model = define_net(cfg)
    state = init_model_state(model, cfg, batch, make_optimizer(cfg, 1))
    step = jax.jit(make_eval_step(model, cfg, need_attention=False))

    def probe(out):
        leaves = jax.tree_util.tree_leaves(out)
        return jnp.sum(leaves[0]) * 0.0

    out = step(state.params, state.batch_stats, arrays)
    float(probe(out) + 1.0)
    t0 = time.perf_counter()
    float(probe(out) + 1.0)
    rt = time.perf_counter() - t0

    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        carry = jnp.float32(0.0)
        for _ in range(iters):
            arr = dict(arrays)
            arr["x_omic"] = arrays["x_omic"] + carry
            out = step(state.params, state.batch_stats, arr)
            carry = probe(out)
        float(carry)
        dt = max(time.perf_counter() - t0 - rt, 1e-9)
        best = dt if best is None else min(best, dt)
    bags = B * iters / best
    print(f"  {mode:16s} B={B:<3d} {bags:9.1f} bags/s "
          f"({best / iters * 1e3:7.2f} ms/step)", flush=True)
    return round(bags, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="teacher,deformpathomic")
    ap.add_argument("--batches", default="4,8,16,32")
    ap.add_argument("--fixdim", type=int, default=2500)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    res = {}
    for mode in args.modes.split(","):
        res[mode] = {}
        for b in (int(x) for x in args.batches.split(",")):
            res[mode][b] = bench(mode, b, args.fixdim, args.iters, args.reps)
    print(json.dumps({"RESULT": res, "fixdim": args.fixdim}))


if __name__ == "__main__":
    main()
