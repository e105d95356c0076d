"""End-to-end train-step A/B: v9 unfused table CPB vs v10 fused table
attention (both divisor 1).

Same harness as tools/exp_cpb_table_e2e.py (chain ITERS donated train
steps, one scalar fence, subtract the measured roundtrip, interleaved
min-of-N reps in one process), with cfg.fused_table_attention as the
swept knob.  Before timing, runs an on-chip parity check of the fused
module against the unfused one (fwd out/attn + a parameter-grad probe).

Usage:  python tools/exp_v10_e2e.py [--iters 30] [--reps 4] \
            [--mode teacher] [--skip-parity]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parity_check():
    """Fused vs unfused module on the live backend at production geometry."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from disentangled_multimodal_learning_tpu.models import (
        deform_attention as dam)

    B, N, C = 2, 2500, 128
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    kw = dict(dim=C, dim_head=64, heads=8, offset_groups=8, dropout=0.0,
              downsample_factor=4, offset_scale=4, offset_kernel_size=6,
              attn_layout="kn", cpb_table_divisor=1)
    unfused = dam.DeformCrossAttention2D(**kw, fused_table=0)
    fused = dam.DeformCrossAttention2D(**kw, fused_table=1)
    variables = unfused.init(jax.random.PRNGKey(0), x1, x2,
                             deterministic=True)

    @jax.jit
    def f_unfused(v, x1, x2):
        return unfused.apply(v, x1, x2, deterministic=True)

    @jax.jit
    def f_fused(v, x1, x2):
        return fused.apply(v, x1, x2, deterministic=True)

    o1, a1 = f_unfused(variables, x1, x2)
    o2, a2 = f_fused(variables, x1, x2)
    eo = float(jnp.abs(o1 - o2).max())
    ea = float(jnp.abs(a1 - a2).max())
    print(f"[v10_e2e] parity fwd: out {eo:.2e} attn {ea:.2e}", flush=True)

    def loss(mod):
        def f(params, x1, x2):
            o, a = mod.apply({"params": params}, x1, x2, deterministic=True)
            return jnp.sum(o ** 2) + jnp.sum(jnp.sin(a))
        return jax.jit(jax.grad(f))

    g1 = loss(unfused)(variables["params"], x1, x2)
    g2 = loss(fused)(variables["params"], x1, x2)
    # per-leaf scale floored at 1e-3 of the global grad magnitude: leaves
    # whose TRUE gradient is ~0 by algebra (e.g. the CPB output bias b3 —
    # a per-query constant in the bias, which softmax is invariant to)
    # otherwise amplify f32 noise into huge rel errors
    gmax = max(float(jnp.abs(l).max())
               for l in jax.tree_util.tree_leaves(g1))
    worst = 0.0
    for (p1, l1), (p2, l2) in zip(
            jax.tree_util.tree_leaves_with_path(g1),
            jax.tree_util.tree_leaves_with_path(g2)):
        scale = max(float(jnp.abs(l1).max()), 1e-3 * gmax)
        err = float(jnp.abs(l1 - l2).max()) / scale
        if err > worst:
            worst, wname = err, jax.tree_util.keystr(p1)
    print(f"[v10_e2e] parity grad: worst rel {worst:.2e} ({wname})",
          flush=True)
    # same gates as the v9 acceptance study (exact kernel's own MXU
    # rounding is ~9e-3 on this bias range)
    assert eo < 5e-3 and ea < 5e-3 and worst < 5e-2, "v10 parity FAILED"


def build(mode, B, fixdim, fused):
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
                 multiscale_attention=True, return_vgrid=(
                     mode == "deformpathomic"),
                 cpb_table_divisor=1, fused_table_attention=fused,
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
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")

    if not args.skip_parity:
        parity_check()

    def fence(s):
        return float(jax.tree_util.tree_leaves(s.params)[0].sum())

    setups = {}
    for fused in (False, True):
        state, arrays, step = build(args.mode, args.B, args.fixdim, fused)
        rng = jax.random.PRNGKey(0)
        for _ in range(3):
            rng, k = jax.random.split(rng)
            state, _ = step(state, arrays, k, None)
        fence(state)
        setups[fused] = {"state": state, "arrays": arrays, "step": step,
                         "rng": rng, "best": None}
        print(f"[v10_e2e] fused={fused} compiled", flush=True)

    some = next(iter(setups.values()))
    t0 = time.perf_counter()
    fence(some["state"])
    roundtrip = time.perf_counter() - t0

    for rep in range(args.reps):
        for fused, su in setups.items():
            state, rng = su["state"], su["rng"]
            t0 = time.perf_counter()
            for _ in range(args.iters):
                rng, k = jax.random.split(rng)
                state, _ = su["step"](state, su["arrays"], k, None)
            fence(state)
            dt = max(time.perf_counter() - t0 - roundtrip, 1e-6)
            su["state"], su["rng"] = state, rng
            su["best"] = dt if su["best"] is None else min(su["best"], dt)
            print(f"[v10_e2e] rep {rep} fused={fused}: "
                  f"{args.B * args.iters / dt:.1f} bags/s", flush=True)

    results = {}
    for fused, su in setups.items():
        results["v10" if fused else "v9"] = {
            "bags_per_sec": round(args.B * args.iters / su["best"], 1),
            "step_ms": round(1e3 * su["best"] / args.iters, 2)}
    print(json.dumps({"mode": args.mode, "B": args.B, "fixdim": args.fixdim,
                      "results": results}))


if __name__ == "__main__":
    main()
