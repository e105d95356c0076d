"""Student train-step A/B: XLA DPC-KNN vs the streaming Pallas kernels.

The XLA path materializes the [B,2500,2500] distance matrix and makes ~12
full passes over it (~1.2 GB HBM traffic/scale); the streamed path
(ops/pallas/dpc_knn.py) recomputes distance tiles in VMEM flash-style.
On-chip parity is checked first (assignments must match exactly), then the
full student step is timed interleaved min-of-N in one process (same
harness as tools/exp_ksmall.py).

Usage: python tools/exp_dpc_stream.py [--iters 30] [--reps 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build(mode, B, fixdim, use_kernel):
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

    orig = CL.dpc_knn_cluster
    if not use_kernel:
        import functools
        CL.dpc_knn_cluster = functools.partial(orig, use_kernel=False)
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
        CL.dpc_knn_cluster = orig
    return state, arrays, step, rng


def parity_check(B, N, C):
    """On-chip assignment equality, XLA vs streamed, on random data."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from disentangled_multimodal_learning_tpu.ops import cluster as CL

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    nz = jnp.asarray(rng.uniform(size=(B, N)), jnp.float32)
    f_x = jax.jit(lambda a, z: CL.dpc_knn_cluster(
        a, 8, k=5, density_noise=z, use_kernel=False))
    f_k = jax.jit(lambda a, z: CL.dpc_knn_cluster(
        a, 8, k=5, density_noise=z, use_kernel=True))
    i1, d1 = jax.device_get(f_x(x, nz))
    i2, d2 = jax.device_get(f_k(x, nz))
    same_down = bool((d1 == d2).all())
    frac = float((i1 == i2).mean())
    print(f"[dpc-stream] parity: centers equal={same_down} "
          f"assignment agreement={frac:.6f}", flush=True)
    return same_down and frac > 0.999


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
    if jax.default_backend() == "cpu":
        print("needs the TPU; aborting")
        return

    ok = parity_check(args.B, args.fixdim, 128)
    if not ok:
        print("RESULT " + json.dumps({"parity": False}))
        return

    def fence(s):
        return float(jax.tree_util.tree_leaves(s.params)[0].sum())

    setups = {}
    for name, use_kernel in (("xla", False), ("streamed", True)):
        state, arrays, step, rng = build(args.mode, args.B, args.fixdim,
                                         use_kernel)
        for _ in range(2):
            rng, k = jax.random.split(rng)
            state, _ = step(state, arrays, k, None)
        fence(state)
        setups[name] = {"state": state, "arrays": arrays, "step": step,
                        "rng": rng, "best": None}
        print(f"[dpc-stream] {name} compiled", flush=True)

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
            print(f"[dpc-stream] rep {rep} {name}: "
                  f"{args.B * args.iters / dt:.1f} bags/s", flush=True)

    results = {name: args.B * args.iters / su["best"]
               for name, su in setups.items()}
    print("RESULT " + json.dumps({"mode": args.mode, "bags_per_s": results}))


if __name__ == "__main__":
    main()
