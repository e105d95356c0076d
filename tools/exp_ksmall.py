"""Student train-step A/B: gather-based vs min-reduce `_k_smallest`.

The DPC-KNN k-nearest pass is 43% of the student step
(tools/exp_student_anatomy.py: dpc ~2.4 ms of an 11.3 ms step, x2 scales).
The r4 rewrite (a) takes the min VALUE from ``jnp.min`` instead of a
[B,N,1]-from-[B,N,N] ``take_along_axis`` gather (bit-identical: dd[argmin]
IS the min), and (b) skips the dead final mask rewrite (a full [B,N,N]
read+write nobody consumes).  Interleaved min-of-N in one process, same
harness as tools/exp_softmax_shift.py.

Usage: python tools/exp_ksmall.py [--iters 30] [--reps 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _k_smallest_gather(dist, k):
    """The pre-r4 implementation (argmin + take_along gather, k mask
    rewrites including a dead final one)."""
    import jax
    import jax.numpy as jnp

    B, N, M = dist.shape
    big = jnp.asarray(jnp.finfo(dist.dtype).max, dist.dtype)
    vals = []
    dd = dist
    for _ in range(k):
        idx = jnp.argmin(dd, axis=-1)
        v = jnp.take_along_axis(dd, idx[..., None], axis=-1)
        vals.append(v[..., 0])
        dd = jnp.where(jax.nn.one_hot(idx, M, dtype=jnp.bool_), big, dd)
    return jnp.stack(vals, axis=-1)


def build(mode, B, fixdim, use_old):
    import jax

    from disentangled_multimodal_learning_tpu.config import Config
    from disentangled_multimodal_learning_tpu.data import (BagLoader,
                                                           SyntheticBagDataset)
    from disentangled_multimodal_learning_tpu.models.factory import define_net
    from disentangled_multimodal_learning_tpu.ops import cluster as CL
    from disentangled_multimodal_learning_tpu.train.optim import make_optimizer
    from disentangled_multimodal_learning_tpu.train.steps import (
        batch_to_arrays, make_train_step)
    from disentangled_multimodal_learning_tpu.train.trainers import (
        init_model_state)

    new_impl = CL._k_smallest
    if use_old:
        CL._k_smallest = _k_smallest_gather
    try:
        cfg = Config(mode=mode, task_type="diag2021", label_dim=4,
                     fixdim=fixdim, batch_size=B, cpb_table_divisor=1,
                     checkpoints="#", debug=True).validate()
        ds = SyntheticBagDataset(size=B, fixdim=fixdim, label_dim=4, seed=0,
                                 args=cfg)
        batch = next(iter(BagLoader(ds, B, shuffle=False)))
        arrays = batch_to_arrays(batch)
        model = define_net(cfg)
        tx = make_optimizer(cfg, 100)
        state = init_model_state(model, cfg, batch, tx)
        step = jax.jit(make_train_step(model, cfg, tx), donate_argnums=(0,))
        # trace NOW while the monkeypatch is installed
        rng = jax.random.PRNGKey(0)
        rng, k = jax.random.split(rng)
        state, _ = step(state, arrays, k, None)
    finally:
        CL._k_smallest = new_impl
    return state, arrays, step, rng


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="student")
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
    for name, use_old in (("gather", True), ("minreduce", False)):
        state, arrays, step, rng = build(args.mode, args.B, args.fixdim,
                                         use_old)
        for _ in range(2):
            rng, k = jax.random.split(rng)
            state, _ = step(state, arrays, k, None)
        fence(state)
        setups[name] = {"state": state, "arrays": arrays, "step": step,
                        "rng": rng, "best": None}
        print(f"[ksmall] {name} compiled", flush=True)

    some = next(iter(setups.values()))
    t0 = time.perf_counter()
    fence(some["state"])
    roundtrip = time.perf_counter() - t0

    for rep in range(args.reps):
        for name, su in setups.items():
            state, rng = su["state"], su["rng"]
            t0 = time.perf_counter()
            for _ in range(args.iters):
                rng, k = jax.random.split(rng)
                state, _ = su["step"](state, su["arrays"], k, None)
            fence(state)
            dt = max(time.perf_counter() - t0 - roundtrip, 1e-6)
            su["state"], su["rng"] = state, rng
            su["best"] = dt if su["best"] is None else min(su["best"], dt)
            print(f"[ksmall] rep {rep} {name}: "
                  f"{args.B * args.iters / dt:.1f} bags/s", flush=True)

    results = {name: args.B * args.iters / su["best"]
               for name, su in setups.items()}
    print("RESULT " + json.dumps({"mode": args.mode, "bags_per_s": results}))


if __name__ == "__main__":
    main()
