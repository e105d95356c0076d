"""Multiscale remat A/B on chip (r5).

The scan-chained r5 refresh put multiscale at 227.6 bags/s = 90.8% of its
teacher/student harmonic roofline (393.8/690); the residual is working-set
pressure — the joint graph carries both models' params, activations and
opt state.  `remat=True` trades CPB/attention recompute for activation
memory; this measures whether that wins at B=4.  Interleaved min-of-N,
device-side scan chain, one process.

Usage: python tools/exp_multiscale_remat.py [--iters 30] [--reps 4]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build(remat):
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

    cfg = Config(mode="multiscale", task_type="diag2021", label_dim=4,
                 fixdim=2500, batch_size=4, remat=remat, checkpoints="#",
                 cpb_table_divisor=1, attn_bf16_streams=True,
                 debug=True).validate()
    ds = SyntheticBagDataset(size=4, fixdim=2500, label_dim=4, seed=0,
                             args=cfg)
    batch = next(iter(BagLoader(ds, 4, shuffle=False)))
    arrays = batch_to_arrays(batch)
    model = define_net(cfg)
    tx = make_optimizer(cfg, 100)
    state = init_model_state(model, cfg, batch, tx)
    return state, arrays, make_train_step(model, cfg, tx)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")

    def fence(s):
        return float(jax.tree_util.tree_leaves(s.params)[0].sum())

    setups = {}
    for name, remat in (("remat_off", False), ("remat_on", True)):
        state, arrays, raw_step = build(remat)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def multi(state, rng, arrays, raw_step=raw_step):
            def body(carry, _):
                st, key = carry
                key, k2 = jax.random.split(key)
                st, m = raw_step(st, arrays, k2, None)
                return (st, key), m["loss"]
            (state, _), losses = jax.lax.scan(body, (state, rng), None,
                                              length=args.iters)
            return state, losses

        rng = jax.random.PRNGKey(0)
        state, _ = multi(state, rng, arrays)
        fence(state)
        setups[name] = {"state": state, "arrays": arrays, "multi": multi,
                        "rng": rng, "best": None}
        print(f"[ms_remat] {name} compiled", flush=True)

    some = next(iter(setups.values()))
    t0 = time.perf_counter()
    fence(some["state"])
    roundtrip = time.perf_counter() - t0

    for rep in range(args.reps):
        for name, su in setups.items():
            t0 = time.perf_counter()
            su["state"], _ = su["multi"](su["state"], su["rng"], su["arrays"])
            fence(su["state"])
            dt = max(time.perf_counter() - t0 - roundtrip, 1e-6)
            su["best"] = dt if su["best"] is None else min(su["best"], dt)
            print(f"[ms_remat] rep {rep} {name}: "
                  f"{4 * args.iters / su['best']:.1f} bags/s", flush=True)

    print("RESULT " + json.dumps({
        name: {"bags_per_sec": round(4 * args.iters / su["best"], 1),
               "step_ms": round(1e3 * su["best"] / args.iters, 2)}
        for name, su in setups.items()}))


if __name__ == "__main__":
    main()
