"""Where does multiscale's cost go? (VERDICT r2 #3 / weak #4)

The joint multiscale graph trains the TEACHER pair and the STUDENT pair in
one step (train/steps.py mode=='multiscale'), so its throughput is bounded
by the harmonic combination of the separately-trained modes:

    t_multi >= t_teacher + t_student
    bags/s  <= 1 / (1/tp_teacher + 1/tp_student)

This tool measures all three modes interleaved min-of-N in ONE process
(tunnel drift rule, CLAUDE.md) and reports the measured joint throughput
against that bound, attributing any gap beyond it to the multiscale-only
extras (second task loss + both consistency losses + combine_logits).

Usage:  python tools/exp_multiscale_breakdown.py [--iters 30] [--reps 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build(mode, B, fixdim):
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

    kw = dict(mode=mode, task_type="diag2021", label_dim=4, fixdim=fixdim,
              batch_size=B, remat=False, checkpoints="#", debug=True,
              multiscale_attention=True)
    if mode in ("teacher", "multiscale"):
        kw.update(gradient_modulate=(mode == "teacher"))
    cfg = Config(**kw).validate()
    ds = SyntheticBagDataset(size=B, fixdim=fixdim, label_dim=4, seed=0,
                             args=cfg)
    batch = next(iter(BagLoader(ds, B, shuffle=False)))
    arrays = batch_to_arrays(batch)
    model = define_net(cfg)
    tx = make_optimizer(cfg, 100)
    state = init_model_state(model, cfg, batch, tx)
    step = jax.jit(make_train_step(model, cfg, tx), donate_argnums=(0,))
    return {"state": state, "arrays": arrays, "step": step,
            "rng": jax.random.PRNGKey(0), "best": None}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--fixdim", type=int, default=2500)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")

    def fence(s):
        return float(jax.tree_util.tree_leaves(s.params)[0].sum())

    setups = {}
    for mode in ("teacher", "student", "multiscale"):
        setups[mode] = build(mode, args.batch, args.fixdim)
        su = setups[mode]
        for _ in range(3):
            su["rng"], k = jax.random.split(su["rng"])
            su["state"], _ = su["step"](su["state"], su["arrays"], k, None)
        fence(su["state"])
        print(f"[msb] {mode} compiled", flush=True)

    t0 = time.perf_counter()
    fence(setups["teacher"]["state"])
    roundtrip = time.perf_counter() - t0

    for rep in range(args.reps):
        for mode, su in setups.items():
            state, rng = su["state"], su["rng"]
            t0 = time.perf_counter()
            for _ in range(args.iters):
                rng, k = jax.random.split(rng)
                state, _ = su["step"](state, su["arrays"], k, None)
            fence(state)
            dt = max(time.perf_counter() - t0 - roundtrip, 1e-6)
            su["state"], su["rng"] = state, rng
            su["best"] = dt if su["best"] is None else min(su["best"], dt)
            print(f"[msb] rep {rep} {mode}: "
                  f"{args.batch * args.iters / dt:.1f} bags/s", flush=True)

    out = {}
    for mode, su in setups.items():
        out[mode] = {
            "bags_per_sec": round(args.batch * args.iters / su["best"], 1),
            "step_ms": round(1e3 * su["best"] / args.iters, 2)}
    bound = 1.0 / (1.0 / out["teacher"]["bags_per_sec"]
                   + 1.0 / out["student"]["bags_per_sec"])
    out["harmonic_bound_bags_per_sec"] = round(bound, 1)
    out["multiscale_pct_of_bound"] = round(
        100.0 * out["multiscale"]["bags_per_sec"] / bound, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
