"""Experiment: bf16 weights + activations for the SERVING (eval-only) path.

The deformable attentions already run their hot matmuls in bf16 on TPU
(models/deform_attention.py _compute_dtype); this measures casting the
REST — the params tree and the input bags — to bf16 for the deterministic
eval step.  Candidate wins: the [B,2500,1024]x[1024,128] _fc1 projections
(the largest non-attention matmuls), halved HBM traffic for weights and
activations, and bf16 Nystrom/MaxNet chains.  Risk: the CPB bias MLP is
VPU-bound (PERF.md) — bf16 there was measured SLOWER for training; eval
may differ because the backward pass (where the loss was) is absent.

Method: interleaved min-of-N in ONE process (tunnel drift, CLAUDE.md),
chained dependent evals + one readback, identical to tools/bench_eval.py.
Also reports the numeric drift of the combined logits vs the f32 step.

Usage: python tools/exp_eval_bf16.py [mode ...]   (default: teacher student)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ITERS = 30
REPS = 4


def run(mode, B=4, fixdim=2500):
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
                 batch_size=B, checkpoints="#", debug=True).validate()
    ds = SyntheticBagDataset(size=B, fixdim=fixdim, label_dim=4, seed=0,
                             args=cfg)
    batch = next(iter(BagLoader(ds, B, shuffle=False)))
    arrays = batch_to_arrays(batch)
    model = define_net(cfg)
    state = init_model_state(model, cfg, batch, make_optimizer(cfg, 1))
    step = jax.jit(make_eval_step(model, cfg, need_attention=False))

    def cast16(tree):
        # keep conv kernels f32 (lax.conv requires matching dtypes and the
        # activations feeding them stay f32) and the CPB MLP weights f32
        # (consumed by the Pallas kernel, which manages its own dtypes)
        def leaf(path, x):
            keys = [getattr(k, "key", getattr(k, "name", "")) for k in path]
            if any(k in ("offset_conv", "rel_pos_bias", "pos_conv")
                   or str(k).startswith("offset_conv") for k in keys):
                return x
            if hasattr(x, "dtype") and x.dtype == jnp.float32:
                return x.astype(jnp.bfloat16)
            return x

        return jax.tree_util.tree_map_with_path(leaf, tree)

    p16 = cast16(state.params)
    feat16 = {k: (v.astype(jnp.bfloat16)
                  if k.startswith("x_") else v) for k, v in arrays.items()}

    def probe(out):
        return jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32) * 0.0

    # numeric drift on the combined logits
    out32 = step(state.params, state.batch_stats, arrays)
    out16 = step(p16, state.batch_stats, feat16)
    l32 = jax.tree_util.tree_leaves(out32)[0]
    l16 = jax.tree_util.tree_leaves(out16)[0]
    import numpy as np

    drift = float(np.max(np.abs(np.asarray(l32, np.float32)
                                - np.asarray(l16, np.float32))))
    scale = float(np.max(np.abs(np.asarray(l32, np.float32)))) or 1.0

    float(probe(out32) + 1.0)
    t0 = time.perf_counter()
    float(probe(out32) + 1.0)
    rt = time.perf_counter() - t0

    def timeit(params, arrs):
        t0 = time.perf_counter()
        carry = jnp.float32(0.0)
        for _ in range(ITERS):
            a = dict(arrs)
            a["x_omic"] = arrs["x_omic"] + carry.astype(arrs["x_omic"].dtype)
            out = step(params, state.batch_stats, a)
            carry = probe(out)
        float(carry)
        return max(time.perf_counter() - t0 - rt, 1e-9)

    best32 = best16 = None
    for _ in range(REPS):  # interleave to decorrelate tunnel drift
        d32 = timeit(state.params, arrays)
        d16 = timeit(p16, feat16)
        best32 = d32 if best32 is None else min(best32, d32)
        best16 = d16 if best16 is None else min(best16, d16)
    b32 = B * ITERS / best32
    b16 = B * ITERS / best16
    print(f"{mode:14s} f32 {b32:8.1f} bags/s | bf16 {b16:8.1f} bags/s "
          f"({(b16 / b32 - 1) * 100:+5.1f}%) | logit drift "
          f"{drift:.3e} (rel {drift / scale:.2e})", flush=True)


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    modes = sys.argv[1:] or ["teacher", "student"]
    for m in modes:
        try:
            run(m)
        except Exception as e:
            print(f"{m:14s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
