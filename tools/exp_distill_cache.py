"""Measure the teacher-output cache's effect on distillation throughput.

Steady state (every sample cached, epochs >= 2) runs the student-only
cached step (train/steps.py make_distill_cached_step); epoch 1 runs the
teacher boundary forward + the cached step per batch.  Compares both
against the monolithic uncached step (the reference's shape,
train_test.py:585-660) with the same interleaved min-of-N method as
tools/bench_modes.py.

Usage: python tools/exp_distill_cache.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ITERS = 30
REPS = 3


def main(B=4, fixdim=2500):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")

    from disentangled_multimodal_learning_tpu.config import Config
    from disentangled_multimodal_learning_tpu.data import (BagLoader,
                                                           SyntheticBagDataset)
    from disentangled_multimodal_learning_tpu.models.factory import define_net
    from disentangled_multimodal_learning_tpu.train.distill_cache import (
        BOUNDARY_KEYS)
    from disentangled_multimodal_learning_tpu.train.optim import make_optimizer
    from disentangled_multimodal_learning_tpu.train.steps import (
        batch_to_arrays, make_distill_cached_step, make_teacher_boundary_fn,
        make_train_step)
    from disentangled_multimodal_learning_tpu.train.trainers import (
        init_model_state)

    cfg = Config(mode="distillation", task_type="diag2021", label_dim=4,
                 fixdim=fixdim, batch_size=B, remat=False, checkpoints="#",
                 debug=True).validate()
    ds = SyntheticBagDataset(size=B, fixdim=fixdim, label_dim=4, seed=0,
                             args=cfg)
    batch = next(iter(BagLoader(ds, B, shuffle=False)))
    arrays = batch_to_arrays(batch)
    student, teacher = define_net(cfg)
    tx = make_optimizer(cfg, 100)
    state0 = init_model_state(student, cfg, batch, tx)
    tstate = init_model_state(teacher, cfg, batch, tx, mode="teacher")
    tvars = {"params": tstate.params, "batch_stats": tstate.batch_stats}

    boundary = jax.jit(make_teacher_boundary_fn(teacher))
    cached_step = jax.jit(make_distill_cached_step(student, cfg, tx),
                          donate_argnums=(0,))
    mono_step = jax.jit(make_train_step(student, cfg, tx, teacher),
                        donate_argnums=(0,))

    tea = dict(zip(BOUNDARY_KEYS, boundary(tvars, arrays)))
    arrays_c = {**arrays, **tea}

    def fence(s):
        return float(jax.tree_util.tree_leaves(s.params)[0].sum())

    def timeit(fn, state):
        rng = jax.random.PRNGKey(0)
        for _ in range(3):
            rng, k = jax.random.split(rng)
            state = fn(state, k)
        fence(state)
        t0 = time.perf_counter()
        fence(state)
        rt = time.perf_counter() - t0
        best = None
        for _ in range(REPS):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                rng, k = jax.random.split(rng)
                state = fn(state, k)
            fence(state)
            dt = max(time.perf_counter() - t0 - rt, 1e-9)
            best = dt if best is None else min(best, dt)
        return B * ITERS / best, best / ITERS * 1e3

    import copy

    def mono(state, k):
        return mono_step(state, arrays, k, tvars)[0]

    def steady(state, k):
        return cached_step(state, arrays_c, k, None)[0]

    def first_epoch(state, k):
        t = dict(zip(BOUNDARY_KEYS, boundary(tvars, arrays)))
        return cached_step(state, {**arrays, **t}, k, None)[0]

    for name, fn in [("uncached (monolithic)", mono),
                     ("epoch-1 (boundary+cached)", first_epoch),
                     ("steady-state (cached)", steady)]:
        bags, ms = timeit(fn, copy.deepcopy(state0))
        print(f"{name:28s} {bags:8.1f} bags/s/chip ({ms:6.2f} ms/step)",
              flush=True)


if __name__ == "__main__":
    main()
