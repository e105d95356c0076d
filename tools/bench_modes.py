"""Per-mode training throughput on the real chip (the PERF.md table).

Usage:  python tools/bench_modes.py [mode ...]
Modes default to every family.  Sub-millisecond models are measured with
``lax.scan``-chained steps (one dispatch per SCAN steps) because the
tunneled single-chip setup has a ~9 ms/call dispatch floor; the heavier
models use the same chained-dispatch + single-readback method as bench.py.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SCAN = 30
HEAVY = {"teacher", "uniteacher", "student", "distillation", "multiscale",
         "deformpathomic", "distillation_steadystate"}
DEFAULT_MODES = [
    ("teacher", "diag2021"), ("uniteacher", "diag2021"),
    ("multiscale", "diag2021"), ("student", "diag2021"),
    ("deformpathomic", "diag2021"), ("distillation", "diag2021"),
    # steady-state distillation: every sample's frozen-teacher boundary
    # tensors already cached (trainers.py teacher-output cache, epochs >= 2)
    # — the student-only cached step (train/steps.py
    # make_distill_cached_step).  The cold 'distillation' line above is the
    # reference-shaped epoch-1 cost (teacher recomputed per step,
    # train_test.py:585-588).
    ("distillation_steadystate", "diag2021"),
    ("transmil", "diag2021"),
    ("path", "diag2021"), ("omic", "diag2021"), ("pathomic", "diag2021"),
    ("mcat", "survival"), ("cmta", "survival"),
]


def bench(mode, task, B=4, fixdim=2500):
    import jax
    import jax.numpy as jnp

    from disentangled_multimodal_learning_tpu.config import Config
    from disentangled_multimodal_learning_tpu.data import (BagLoader,
                                                           SyntheticBagDataset)
    from disentangled_multimodal_learning_tpu.models.factory import define_net
    from disentangled_multimodal_learning_tpu.train.optim import make_optimizer
    from disentangled_multimodal_learning_tpu.train.steps import (
        batch_to_arrays, make_distill_cached_step, make_teacher_boundary_fn,
        make_train_step)
    from disentangled_multimodal_learning_tpu.train.trainers import (
        init_model_state)

    bench_name = mode
    steadystate = mode == "distillation_steadystate"
    if steadystate:
        mode = "distillation"
    label_dim = {"diag2021": 4, "survival": 4, "grade": 3}[task]
    # cpb_table_divisor=1: the production operating point (bench.py,
    # config/ presets) — table-interpolated CPB, more accurate than the
    # exact kernel's own MXU rounding (PERF.md)
    kw = dict(mode=mode, task_type=task, label_dim=label_dim, fixdim=fixdim,
              batch_size=B, remat=False, checkpoints="#", debug=True,
              cpb_table_divisor=1, attn_bf16_streams=True)
    if mode in ("teacher", "uniteacher"):
        kw.update(gradient_modulate=True, multiscale_attention=True)
    if mode == "deformpathomic":
        kw.update(return_vgrid=True, gradient_modulate=True)
    cfg = Config(**kw).validate()
    ds = SyntheticBagDataset(size=B, fixdim=fixdim, label_dim=label_dim,
                             seed=0, args=cfg)
    batch = next(iter(BagLoader(ds, B, shuffle=False)))
    arrays = batch_to_arrays(batch)
    tx = make_optimizer(cfg, 100)
    teacher_model = tvars = None
    if mode == "distillation":  # frozen-teacher KD (reference :548-777)
        model, teacher_model = define_net(cfg)
        tstate = init_model_state(teacher_model, cfg, batch, tx,
                                  mode="teacher")
        tvars = {"params": tstate.params, "batch_stats": tstate.batch_stats}
    else:
        model = define_net(cfg)
    state = init_model_state(model, cfg, batch, tx)
    if steadystate:
        # precompute the boundary tensors once (what the cache replays) and
        # bench the student-only cached step
        boundary = jax.jit(make_teacher_boundary_fn(teacher_model))(
            tvars, arrays)
        arrays.update({k: jnp.asarray(v) for k, v in zip(
            ("tea_lt10", "tea_lt20", "tea_ft10", "tea_ft20"), boundary)})
        step_fn = make_distill_cached_step(model, cfg, tx)
        teacher_model = tvars = None
    else:
        step_fn = make_train_step(model, cfg, tx, teacher_model)

    def fence(s):
        return float(jax.tree_util.tree_leaves(s.params)[0].sum())

    rng = jax.random.PRNGKey(0)
    if mode in HEAVY:
        # device-side scan chain (r5): one dispatch + one readback per rep,
        # so the number reflects the CHIP even when the tunnel's dispatch
        # path degrades (the r4-era 30-individual-dispatch loop relied on
        # dispatch pipelining and under-reported heavy modes 2-5x in
        # degraded tunnel phases).  arrays/tvars enter as jit ARGUMENTS —
        # closure-captured large arrays break remote compile (CLAUDE.md).
        # Cold distillation ONLY: the frozen-teacher forward depends on
        # (tvars, arrays) alone, so with loop-invariant arrays XLA hoists
        # the ENTIRE teacher forward out of the scan (measured: 744 bags/s,
        # i.e. faster than the student-only step — impossible).  Real
        # training streams a new batch every step; thread a loss-derived
        # probe (v + loss*1e-30 == v in f32) through the float arrays to
        # force per-iteration dependence.  Other modes carry their state
        # through every major computation already — no probe, no extra
        # bandwidth.
        probe_arrays = tvars is not None

        @functools.partial(jax.jit, donate_argnums=(0,))
        def multi_heavy(state, rng, arrays, tvars):
            def body(carry, _):
                st, key, arrs = carry
                key, k2 = jax.random.split(key)
                st, m = step_fn(st, arrs, k2, tvars)
                if probe_arrays:
                    p = m["loss"].astype(jnp.float32) * 1e-30
                    arrs = jax.tree_util.tree_map(
                        lambda v: v + p.astype(v.dtype)
                        if jnp.issubdtype(v.dtype, jnp.floating) else v,
                        arrs)
                return (st, key, arrs), m["loss"]
            (state, _, _), losses = jax.lax.scan(
                body, (state, rng, arrays), None, length=SCAN)
            return state, losses

        state, _ = multi_heavy(state, rng, arrays, tvars)
        fence(state)
        t0 = time.perf_counter()
        fence(state)
        rt = time.perf_counter() - t0
        best = None
        for _ in range(4):
            t0 = time.perf_counter()
            state, _ = multi_heavy(state, rng, arrays, tvars)
            fence(state)
            dt = max(time.perf_counter() - t0 - rt, 1e-9)
            best = dt if best is None else min(best, dt)
    else:
        @jax.jit
        def multi(state, rng):
            def body(carry, _):
                st, key = carry
                key, k2 = jax.random.split(key)
                st, m = step_fn(st, arrays, k2, tvars)
                return (st, key), m["loss"]
            (state, _), losses = jax.lax.scan(body, (state, rng), None,
                                              length=SCAN)
            return state, losses

        state, _ = multi(state, rng)
        fence(state)
        t0 = time.perf_counter()
        fence(state)
        rt = time.perf_counter() - t0
        # chain enough multi() calls that the measured window dwarfs the
        # roundtrip noise — a single 30-step scan of a sub-0.1 ms model
        # finishes INSIDE the ~28 ms readback jitter and divides to garbage
        chain = 1
        while True:
            t0 = time.perf_counter()
            for _ in range(chain):
                state, _ = multi(state, rng)
            fence(state)
            dt = time.perf_counter() - t0 - rt
            if dt > 10 * max(rt, 1e-3) or chain >= 512:
                break
            chain *= 4
        best = max(dt, 1e-9)
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(chain):
                state, _ = multi(state, rng)
            fence(state)
            dt = max(time.perf_counter() - t0 - rt, 1e-9)
            best = min(best, dt)
        best /= chain
    print(f"{bench_name:16s} {task:9s} B={B}  {B * SCAN / best:9.1f} bags/s/chip "
          f"({best / SCAN * 1e3:7.2f} ms/step)", flush=True)
    return {"metric": f"{bench_name}_train_bags_per_sec_fixdim{fixdim}_b{B}",
            "value": round(B * SCAN / best, 3), "unit": "bags/sec/chip",
            "step_ms": round(best / SCAN * 1e3, 3), "task": task}


def main():
    import json

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    picks = sys.argv[1:]
    records = []
    for mode, task in DEFAULT_MODES:
        if picks and mode not in picks:
            continue
        try:
            records.append(bench(mode, task))
        except Exception as e:  # keep the sweep alive
            print(f"{mode:16s} FAILED: {type(e).__name__}: {str(e)[:120]}")
    if not picks:  # full sweep: check the BENCH-style lines into the repo
        out = os.path.join(os.path.dirname(__file__), "..", "BENCH_MODES.json")
        with open(out, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
        print(f"wrote {os.path.abspath(out)}")


if __name__ == "__main__":
    main()
