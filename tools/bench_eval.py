"""Inference/serving throughput: eval-only (no grads, deterministic) step
for the flagship modes, same chained-dispatch + single-readback method as
bench.py.  Appends BENCH-style records to BENCH_MODES.json (metric suffix
``_eval_``) when run with no mode arguments.

Usage:  python tools/bench_eval.py [mode ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MODES = ["teacher", "student", "deformpathomic", "multiscale"]
ITERS = 50
REPS = 3


def bench(mode, B=4, fixdim=2500):
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

    # cpb_table_divisor=1: the production operating point (PERF.md)
    cfg = Config(mode=mode, task_type="diag2021", label_dim=4, fixdim=fixdim,
                 batch_size=B, checkpoints="#", debug=True,
                 cpb_table_divisor=1, attn_bf16_streams=True).validate()
    ds = SyntheticBagDataset(size=B, fixdim=fixdim, label_dim=4, seed=0,
                             args=cfg)
    batch = next(iter(BagLoader(ds, B, shuffle=False)))
    arrays = batch_to_arrays(batch)
    model = define_net(cfg)
    state = init_model_state(model, cfg, batch, make_optimizer(cfg, 1))
    # production serving parity: Evaluator drops the attention maps from the
    # jitted output (need_attention=False) so XLA never materializes them
    step = jax.jit(make_eval_step(model, cfg, need_attention=False))

    # r5: ITERS dependent evals inside ONE device-side lax.scan (one
    # dispatch + one readback per rep — immune to per-dispatch tunnel
    # overhead/degradation, same rationale as tools/bench_modes.py).  Eval
    # has no state carry, so each iteration perturbs x_path10 — consumed by
    # EVERY mode — by probe*1e-30 (value-preserving in f32, but a real data
    # dependence XLA can neither hoist nor reorder across iterations).
    # arrays enters as a jit argument (closure-captured large arrays break
    # remote compile, CLAUDE.md).
    @jax.jit
    def multi(params, batch_stats, arrays):
        def body(carry, _):
            arr = dict(arrays)
            arr["x_path10"] = arrays["x_path10"] + carry * 1e-30
            out = step(params, batch_stats, arr)
            # the carry must consume EVERY output leaf: the old per-dispatch
            # method materialized all outputs at the jit boundary, but
            # inside one scan any branch not feeding the carry is DCE'd
            # (first seen as multiscale-eval 2010 bags/s — one scale's
            # whole branch dead)
            leaves = jax.tree_util.tree_leaves(out)
            tot = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
            return tot, jnp.float32(0.0)

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return carry

    ready = multi(state.params, state.batch_stats, arrays)  # compile+warmup
    float(ready)
    t0 = time.perf_counter()
    float(ready)  # readback of an already-computed scalar = empty roundtrip
    rt = time.perf_counter() - t0

    best = None
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(multi(state.params, state.batch_stats, arrays))
        dt = max(time.perf_counter() - t0 - rt, 1e-9)
        best = dt if best is None else min(best, dt)
    bags = B * ITERS / best
    print(f"{mode:16s} eval B={B}  {bags:9.1f} bags/s/chip "
          f"({best / ITERS * 1e3:7.2f} ms/step)", flush=True)
    return {"metric": f"{mode}_eval_bags_per_sec_fixdim{fixdim}_b{B}",
            "value": round(bags, 3), "unit": "bags/sec/chip",
            "step_ms": round(best / ITERS * 1e3, 3), "task": "diag2021"}


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    picks = sys.argv[1:]
    records = []
    for mode in MODES:
        if picks and mode not in picks:
            continue
        try:
            records.append(bench(mode))
        except Exception as e:
            print(f"{mode:16s} FAILED: {type(e).__name__}: {str(e)[:120]}")
    if not picks and records:
        out = os.path.join(os.path.dirname(__file__), "..", "BENCH_MODES.json")
        existing = []
        if os.path.exists(out):
            existing = [json.loads(l) for l in open(out) if l.strip()]
        existing = [r for r in existing if "_eval_" not in r["metric"]]
        with open(out, "w") as f:
            for r in existing + records:
                f.write(json.dumps(r) + "\n")
        print(f"updated {os.path.abspath(out)}")


if __name__ == "__main__":
    main()
