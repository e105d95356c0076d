"""Batch operating-point sweep for the teacher production path (VERDICT r2
#3): the numbers in bench.py's old comment predated the v7 CPB kernel + kn
layout; re-measure B in {1, 2, 4, 8, 16} with interleaved min-of-N so the
tunnel's +-2x drift cannot fake a winner.

Method (CLAUDE.md measurement rules): per rep and per B, chain ITERS
dependent train steps (state carry forces device-sequential execution),
fence ONCE via a scalar readback, subtract the measured empty-roundtrip.
Reps interleave across B values in one process; report per-B minimum.

Usage:  python tools/exp_bsweep.py [--fixdim 2500] [--iters 30] [--reps 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build(B, fixdim, remat):
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

    cfg = Config(mode="teacher", task_type="diag2021", label_dim=4,
                 fixdim=fixdim, batch_size=B, gradient_modulate=True,
                 multiscale_attention=True, remat=remat, checkpoints="#",
                 cpb_table_divisor=1, attn_bf16_streams=True,  # r5 prod point
                 debug=True).validate()
    ds = SyntheticBagDataset(size=B, fixdim=fixdim, label_dim=4, seed=0,
                             args=cfg)
    batch = next(iter(BagLoader(ds, B, shuffle=False)))
    arrays = batch_to_arrays(batch)
    model = define_net(cfg)
    tx = make_optimizer(cfg, 100)
    state = init_model_state(model, cfg, batch, tx)
    raw_step = make_train_step(model, cfg, tx)
    return state, arrays, raw_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixdim", type=int, default=2500)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--batches", type=str, default="1,2,4,8,16")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")

    def fence(s):
        return float(jax.tree_util.tree_leaves(s.params)[0].sum())

    import functools

    setups = {}
    for B in [int(b) for b in args.batches.split(",")]:
        remat = B > 4  # remat=False fits at B<=4 (bench.py)
        try:
            state, arrays, raw_step = build(B, args.fixdim, remat)

            # r5: device-side scan chain (one dispatch + one readback per
            # rep), same method as bench.py/bench_modes — see PERF.md's
            # headline measurement note
            @functools.partial(jax.jit, donate_argnums=(0,))
            def multi(state, rng, arrays, raw_step=raw_step):
                def body(carry, _):
                    st, key = carry
                    key, k2 = jax.random.split(key)
                    st, m = raw_step(st, arrays, k2, None)
                    return (st, key), m["loss"]
                (state, _), losses = jax.lax.scan(
                    body, (state, rng), None, length=args.iters)
                return state, losses

            rng = jax.random.PRNGKey(0)
            state, _ = multi(state, rng, arrays)  # compile + warmup
            fence(state)
            setups[B] = {"state": state, "arrays": arrays, "step": multi,
                         "rng": rng, "remat": remat, "best": None}
            print(f"[bsweep] B={B} compiled (remat={remat})", flush=True)
        except Exception as e:  # OOM at large B without remat etc.
            print(f"[bsweep] B={B} SKIPPED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # measured empty roundtrip (fence latency)
    some = next(iter(setups.values()))
    t0 = time.perf_counter()
    fence(some["state"])
    roundtrip = time.perf_counter() - t0

    for rep in range(args.reps):
        for B, su in setups.items():  # interleaved: one rep per B per pass
            state, rng = su["state"], su["rng"]
            t0 = time.perf_counter()
            state, _ = su["step"](state, rng, su["arrays"])
            fence(state)
            dt = max(time.perf_counter() - t0 - roundtrip, 1e-6)
            su["state"] = state
            su["best"] = dt if su["best"] is None else min(su["best"], dt)
            print(f"[bsweep] rep {rep} B={B}: "
                  f"{B * args.iters / dt:.1f} bags/s", flush=True)

    results = {}
    for B, su in setups.items():
        bags = B * args.iters / su["best"]
        results[str(B)] = {"bags_per_sec": round(bags, 1),
                           "step_ms": round(1e3 * su["best"] / args.iters, 2),
                           "remat": su["remat"]}
    print(json.dumps({"fixdim": args.fixdim, "iters": args.iters,
                      "reps": args.reps, "results": results}))


if __name__ == "__main__":
    main()
