"""Pipeline parallelism: the distillation mode as a two-stage pipeline.

Distillation (reference train_test.py:580-660) is the one mode whose step
runs TWO full models back-to-back: a frozen teacher forward whose logits and
features feed the student's loss.  That producer->consumer structure is a
natural pipeline cut — stage 0 runs the teacher, stage 1 the student — and
because the teacher is frozen, no gradient ever crosses the seam, so the
backward pipeline is trivial (stage 1 only).

Schedule (GPipe-style microbatching, ``M`` microbatches, ``M + 1`` ticks):

    tick t:   stage 0  teacher_forward(micro[t])        (t < M)
              --- ppermute the boundary tensors 0 -> 1 over ICI ---
              stage 1  student fwd+bwd on micro[t-1]    (t >= 1)

so from tick 1 to M-1 both stages compute concurrently (bubble fraction
``1/(M+1)``).  The boundary tensors are tiny — two ``[b, C]`` logit blocks
and two ``[b, 256]`` feature blocks per microbatch — so the ppermute is
KB-scale regardless of fixdim.

Exactness: every distillation loss term decomposes as (sum of per-sample
terms) / (a denominator independent of the student parameters) — weighted CE
normalizes by the summed class weights of the GLOBAL batch, the KL / MSE
distillation terms by the global batch size (steps.py:178-198).  The global
denominators are computed up front, each microbatch contributes the gradient
of its numerator sum, and the accumulated gradient psum'd over
``('data', 'stage')`` equals the unpipelined global-batch gradient to float
reassociation (tests/test_parallel.py::test_pipe_*).  The dropout masks
inside each microbatch's student forward are drawn from per-(microbatch,
data-shard) rngs — decorrelated, but necessarily a different realization
from the one full-batch forward (the same situation as dp resharding any
stochastic step); the DECOMPOSITION itself is verified exactly with
deterministic forwards.

The only non-exact quantity is the LOGGING-ONLY ``batchloss`` metric
(reference computes the student Gram consistency over the global batch for
display, train_test.py:627-632): a Gram over B rows has cross-microbatch
terms and cannot be accumulated, so the pipelined step omits it from its
metrics dict (it never contributes to the distillation loss).

Composition: the mesh is 2-D ``('data', 'stage')`` — batch rows split over
'data' exactly like parallel/mesh.py, each data group pipelining its local
rows through the two stages.  Reachable via ``cfg.pipe_devices = 2`` +
``cfg.pipe_microbatches``; exercised by the ``distillation_dp_pipe``
multichip dryrun mode.

Because each stage's per-device program is ordinary single-device code under
``shard_map``, the single-chip Pallas CPB kernels stay ENABLED under
pipeline parallelism — unlike the GSPMD-partitioned tensor/branch axes
(tp_shard.py / branch_shard.py), nothing here needs the XLA fallback path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..train import losses as L
from ..train.steps import (TASK_LABEL_COL, _model_kwargs,
                           make_teacher_boundary_fn, task_class_weights)


def make_dp_stage_mesh(dp: int) -> Mesh:
    """2-D ``('data', 'stage')`` mesh: dp-way batch sharding x the two
    pipeline stages (teacher, student)."""
    devices = jax.devices()
    if dp * 2 > len(devices):
        raise ValueError(f"need {dp * 2} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[: dp * 2]).reshape(dp, 2),
                axis_names=("data", "stage"))


def _ce_num(logits, labels, class_weights):
    """Numerator SUM of torch-semantics (weighted) CE — the caller divides by
    the global denominator (sample count, or summed sample weights)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    if class_weights is None:
        return jnp.sum(nll)
    w = jnp.asarray(class_weights, dtype=logits.dtype)[labels]
    return jnp.sum(w * nll)


def _kl_num(student_logits, teacher_logits, temperature):
    """Numerator of distillation_loss (losses.py:109-119): the summed KL x
    T^2; the caller divides by the global batch size."""
    t = temperature
    soft_targets = jax.nn.softmax(teacher_logits / t, axis=1)
    soft_prob = jax.nn.log_softmax(student_logits / t, axis=1)
    kl = soft_targets * (jnp.log(jnp.clip(soft_targets, 1e-12)) - soft_prob)
    return jnp.sum(kl) * (t ** 2)


def global_denominators(cfg, arrays):
    """The theta-independent global normalizers: ``(d_task, d_batch)``.

    d_task — summed CE sample weights of the GLOBAL batch (torch weighted-CE
    denominator) or the global batch size; d_batch — the global batch size
    (KL / MSE distillation denominator)."""
    task = cfg.task_type
    cw = task_class_weights(cfg, task)
    label_col = int(TASK_LABEL_COL[task])
    B = arrays["label"].shape[0]
    if task != "survival" and cw is not None:
        w = jnp.asarray(cw, jnp.float32)[arrays["label"][:, label_col]]
        d_task = jnp.sum(w)
    else:
        d_task = jnp.float32(B)
    return d_task, jnp.float32(B)


def make_micro_fns(model, teacher_model, cfg):
    """The two per-microbatch programs of the pipeline, exposed so tests can
    run an exact SEQUENTIAL reference of the decomposition:

    - ``teacher_fwd(teacher_vars, micro)`` — stage-0 program: frozen teacher
      forward returning exactly the boundary tensors the student loss
      consumes (steps.py:166-175): two ``[b, C]`` logit blocks and two
      ``[b, 256]`` concatenated feature blocks.
    - ``student_micro_loss(params, micro, tea, rng, denoms, deterministic)``
      — stage-1 program: the microbatch's scalar loss CONTRIBUTION, already
      divided by the global denominators, so contributions sum exactly to
      the unpipelined global-batch loss.
    """
    task = cfg.task_type
    cw = task_class_weights(cfg, task)
    label_col = int(TASK_LABEL_COL[task])
    distill_logits = bool(cfg.distill_logits)
    distill_feature = bool(cfg.distill_feature)
    temperature = float(cfg.temperature)

    teacher_fwd = make_teacher_boundary_fn(teacher_model)

    # honor cfg.deterministic_training like every other train step
    # (steps.py:124): dropout off makes the microbatch decomposition equal
    # the monolithic step EXACTLY (with dropout on, the per-(microbatch,
    # shard) rng derivation is necessarily a different mask pattern than the
    # full-batch step's — both correct, not comparable)
    _cfg_det = bool(getattr(cfg, "deterministic_training", False))

    def student_micro_loss(params, micro, tea, rng, denoms,
                           deterministic=_cfg_det):
        d_task, d_batch = denoms
        lt10, lt20, ft10, ft20 = tea
        out = model.apply(
            {"params": params}, **_model_kwargs("student", micro, True),
            deterministic=deterministic,
            rngs=None if deterministic else {"dropout": rng})
        fd_s, _, ld_s = out[0], out[1], out[2]
        label = micro["label"]
        if task == "survival":
            # nll_surv is a plain mean: numerator = mean * local rows
            rows = label.shape[0]
            num_t = rows * (
                L.task_loss(task, logits=ld_s["logits_stu10"],
                            hazards=out[3]["hazards_stu10"],
                            S=out[4]["S_stu10"], label=label)
                + L.task_loss(task, logits=ld_s["logits_stu20"],
                              hazards=out[3]["hazards_stu20"],
                              S=out[4]["S_stu20"], label=label))
        else:
            num_t = (_ce_num(ld_s["logits_stu10"], label[:, label_col], cw)
                     + _ce_num(ld_s["logits_stu20"], label[:, label_col], cw))
        taskloss = num_t / d_task
        dl = df = jnp.zeros((), jnp.float32)
        if distill_logits:
            dl = (_kl_num(ld_s["logits_stu10"], lt10, temperature)
                  + _kl_num(ld_s["logits_stu20"], lt20, temperature)) / d_batch
        if distill_feature:
            d_elems = d_batch * ft10.shape[-1]
            df = (jnp.sum((fd_s["feature_stu10"] - ft10) ** 2)
                  + jnp.sum((fd_s["feature_stu20"] - ft20) ** 2)) / d_elems
        # weighting exactly as steps.py:192-198 / reference :635-642
        if distill_logits and distill_feature:
            loss = taskloss + 0.01 * dl + 0.01 * df
        elif distill_logits:
            loss = taskloss + dl
        elif distill_feature:
            loss = taskloss + df
        else:
            loss = taskloss
        return loss, (taskloss, dl, df)

    return teacher_fwd, student_micro_loss


def make_pipe_distill_step(model, teacher_model, cfg, tx, mesh: Mesh):
    """Build the pipelined distillation train step (same signature as
    steps.make_train_step's: ``step(state, arrays, rng, teacher_vars)``).

    ``mesh`` must be the 2-D ``('data', 'stage')`` mesh from
    :func:`make_dp_stage_mesh`; the per-data-shard batch must divide
    ``cfg.pipe_microbatches``."""
    M = max(1, int(getattr(cfg, "pipe_microbatches", 1) or 1))
    distill_logits = bool(cfg.distill_logits)
    distill_feature = bool(cfg.distill_feature)
    teacher_fwd, student_micro_loss = make_micro_fns(model, teacher_model, cfg)

    def step(state, arrays, rng, teacher_vars):
        assert state.batch_stats is None, \
            "pipelined distillation assumes a batch-stats-free student"
        denoms = global_denominators(cfg, arrays)
        rngs = jax.random.split(rng, M)

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(), jax.tree_util.tree_map(lambda _: P("data"), arrays),
                      P(), P(), (P(), P())),
            out_specs=(P(), (P(), P(), P(), P())),
            check_vma=False)
        def _pipe(params, arrs, tvars, mrngs, dnms):
            stage = jax.lax.axis_index("stage")
            data_idx = jax.lax.axis_index("data")
            local_b = arrs["label"].shape[0]
            if local_b % M:
                raise ValueError(
                    f"per-data-shard batch {local_b} not divisible by "
                    f"pipe_microbatches={M}")
            micro = jax.tree_util.tree_map(
                lambda a: a.reshape((M, local_b // M) + a.shape[1:]), arrs)

            def at(t):
                return jax.tree_util.tree_map(
                    lambda a: jax.lax.dynamic_index_in_dim(
                        a, t, 0, keepdims=False), micro)

            tea_shapes = jax.eval_shape(teacher_fwd, tvars, at(0))
            zeros_tea = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), tea_shapes)
            zeros_g = jax.tree_util.tree_map(jnp.zeros_like, params)
            zeros_m = (jnp.zeros((), jnp.float32),) * 4

            def _grad_one(mi, tea):
                # per-(microbatch, data-shard) dropout rng — decorrelated
                # across both the pipeline and the data axis
                rng_t = jax.random.fold_in(
                    jax.lax.dynamic_index_in_dim(mrngs, mi, 0,
                                                 keepdims=False), data_idx)
                (loss, (tl, dl, df)), g = jax.value_and_grad(
                    student_micro_loss, has_aux=True)(
                        params, at(mi), tea, rng_t, dnms)
                return g, (loss, tl, dl, df)

            def tick(carry, t):
                recv, g_acc, m_acc = carry
                out_t = jax.lax.cond(
                    jnp.logical_and(stage == 0, t < M),
                    lambda: teacher_fwd(tvars, at(jnp.clip(t, 0, M - 1))),
                    lambda: zeros_tea)
                g_t, m_t = jax.lax.cond(
                    jnp.logical_and(stage == 1, t >= 1),
                    lambda: _grad_one(jnp.clip(t - 1, 0, M - 1), recv),
                    lambda: (zeros_g, zeros_m))
                recv_next = jax.tree_util.tree_map(
                    lambda x: jax.lax.ppermute(x, "stage", [(0, 1)]), out_t)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g_t)
                m_acc = jax.tree_util.tree_map(jnp.add, m_acc, m_t)
                return (recv_next, g_acc, m_acc), None

            (_, g_acc, m_acc), _ = jax.lax.scan(
                tick, (zeros_tea, zeros_g, zeros_m), jnp.arange(M + 1))
            g = jax.lax.psum(g_acc, ("data", "stage"))
            m = jax.lax.psum(m_acc, ("data", "stage"))
            return g, m

        grads, (loss, tl, dl, df) = _pipe(
            state.params, arrays, teacher_vars, rngs, denoms)
        metrics = {"loss": loss, "taskloss": tl}
        if distill_logits:
            metrics["distillloss_logits"] = dl
        if distill_feature:
            metrics["distillloss_feature"] = df
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=new_params, opt_state=new_opt_state,
                                  step=state.step + 1)
        return new_state, metrics

    return step
