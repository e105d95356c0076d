"""Decompose the teacher's non-attention residual at the r5 operating point.

The r5 anatomy (PERF.md "Where the time goes now") accounts ~6.8 ms of the
10.16 ms step to the 4 attention modules; this tool decomposes the ~3.3 ms
residual with config-variant step graphs, all timed as device-side scan
chains, interleaved min-of-N in one process:

  full          production step (gradient_modulate + multiscale_attention)
  no_modulate   gradient_modulate=False     (delta = modulation surgery)
  no_msattn     multiscale_attention=False  (delta = Gram losses + the
                attention-map materialization XLA can then DCE)
  fwd_loss      loss value only, no grad    (fwd/bwd split)

Usage: python tools/exp_teacher_residual.py [--iters 30] [--reps 4]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build(modulate, msattn, mode="teacher"):
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
                 fixdim=2500, batch_size=4, gradient_modulate=modulate,
                 multiscale_attention=msattn, remat=False, checkpoints="#",
                 cpb_table_divisor=1, attn_bf16_streams=True,
                 debug=True).validate()
    ds = SyntheticBagDataset(size=4, fixdim=2500, label_dim=4, seed=0,
                             args=cfg)
    batch = next(iter(BagLoader(ds, 4, shuffle=False)))
    arrays = batch_to_arrays(batch)
    model = define_net(cfg)
    tx = make_optimizer(cfg, 100)
    state = init_model_state(model, cfg, batch, tx)
    return state, arrays, make_train_step(model, cfg, tx), cfg, model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--mode", default="teacher",
                    choices=("teacher", "student"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")

    def fence(s):
        return float(jax.tree_util.tree_leaves(s.params)[0].sum())

    from disentangled_multimodal_learning_tpu.train import losses as L
    _orig = {k: getattr(L, k) for k in
             ("omic_domain_scale_loss", "path_batch_loss",
              "path_batch_loss_stacked")}

    def _patch(wrap):
        for k, fn in _orig.items():
            setattr(L, k, (lambda f: lambda *a: f(*wrap(a)))(fn))

    def _restore():
        for k, fn in _orig.items():
            setattr(L, k, fn)

    variants = [("full", True, True), ("no_modulate", False, True),
                ("no_msattn", True, False), ("msattn_sg", True, True),
                ("msattn_barrier", True, True)]
    if args.mode == "student":  # no modulation branch; barrier known negative
        variants = [("full", True, True), ("no_msattn", True, False),
                    ("msattn_sg", True, True)]

    setups = {}
    for name, modulate, msattn in variants:
        if name == "msattn_sg":
            # Gram loss VALUE computed, but its backward path severed:
            # isolates the bwd share of the msattn delta
            _patch(lambda a: [jax.lax.stop_gradient(m) for m in a])
        elif name == "msattn_barrier":
            # isolated Gram fwd+bwd is ~roofline (anatomy gram4 row), so
            # the e2e delta is fusion interaction: test whether an
            # optimization barrier on the Gram's inputs decouples XLA's
            # attention-pipeline fusion decisions from the extra consumer
            _patch(lambda a: jax.lax.optimization_barrier(tuple(a)))
        state, arrays, raw_step, cfg, model = build(modulate, msattn,
                                                    args.mode)

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
        state, _ = multi(state, rng, arrays)  # traces under the active patch
        fence(state)
        _restore()
        setups[name] = {"state": state, "arrays": arrays, "multi": multi,
                        "rng": rng, "best": None}
        print(f"[residual] {name} compiled", flush=True)
        if name == "full":
            full_state, full_arrays = state, arrays
            full_cfg, full_model = cfg, model

    # fwd loss value only (no grad), same production graph, scan-chained:
    # perturb x_path10 by loss*1e-30 per iteration (prevents hoisting,
    # forces sequencing — same trick as tools/bench_eval.py)
    from disentangled_multimodal_learning_tpu.train.steps import (
        make_train_step)  # noqa: F401  (already imported via build)

    raw_full = None
    # rebuild a fresh loss-only callable from the production step pieces:
    # jax.value_and_grad is what the step uses; here we call the loss fn
    # through the same make_train_step-internal path by just running the
    # model forward + losses via a grad-free wrapper.  Simplest honest
    # proxy: jax.eval_shape-free fwd = value of the step's loss without
    # computing grads is not directly exposed, so time the model forward
    # with the production outputs consumed instead.
    # fresh buffers: full_state gets DONATED by its multi() in the rep loop,
    # which would invalidate aliased param buffers under fwd_multi
    params = jax.tree_util.tree_map(lambda x: x + 0, full_state.params)

    @jax.jit
    def fwd_multi(params, arrays):
        def body(carry, _):
            arr = dict(arrays)
            arr["x_path10"] = arrays["x_path10"] + carry * 1e-30
            if args.mode == "teacher":
                out = full_model.apply(
                    {"params": params}, x_path10=arr["x_path10"],
                    x_path20=arr["x_path20"],
                    x_omic_tumor=arr["x_omic_tumor"],
                    x_omic_immune=arr["x_omic_immune"], deterministic=True)
            else:  # student (deterministic: no dropout/DPC-noise rngs)
                out = full_model.apply(
                    {"params": params}, x_path10=arr["x_path10"],
                    x_path20=arr["x_path20"], deterministic=True)
            leaves = jax.tree_util.tree_leaves(out)
            tot = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
            return tot, jnp.float32(0.0)
        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                length=args.iters)
        return carry

    ready = fwd_multi(params, full_arrays)
    float(ready)
    t0 = time.perf_counter()
    float(ready)
    roundtrip = time.perf_counter() - t0
    fwd_best = None

    for rep in range(args.reps):
        for name, su in setups.items():
            t0 = time.perf_counter()
            su["state"], _ = su["multi"](su["state"], su["rng"], su["arrays"])
            fence(su["state"])
            dt = max(time.perf_counter() - t0 - roundtrip, 1e-6)
            su["best"] = dt if su["best"] is None else min(su["best"], dt)
        t0 = time.perf_counter()
        float(fwd_multi(params, full_arrays))
        dt = max(time.perf_counter() - t0 - roundtrip, 1e-6)
        fwd_best = dt if fwd_best is None else min(fwd_best, dt)
        print(f"[residual] rep {rep}: " + " ".join(
            f"{n}={1e3 * su['best'] / args.iters:.2f}ms"
            for n, su in setups.items()) +
            f" fwd={1e3 * fwd_best / args.iters:.2f}ms", flush=True)

    print("RESULT " + json.dumps(
        {**{n: round(1e3 * su["best"] / args.iters, 3)
            for n, su in setups.items()},
         "fwd_all_outputs": round(1e3 * fwd_best / args.iters, 3)}))


if __name__ == "__main__":
    main()
