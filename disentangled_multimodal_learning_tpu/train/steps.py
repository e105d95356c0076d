"""Jitted train/eval steps — one compiled function per (mode, task).

This replaces the reference's four Python trainer loops' inner bodies
(reference train_test.py:52-230 teacher, :373-435 student, :580-660
 distillation, :817-981 deformpathomic) with pure functions:

    state, metrics = train_step(state, batch_arrays, rng)

Everything data-dependent (loss switches, gradient-modulation branches,
max-confidence combination) is masked arithmetic — no Python control flow on
traced values.  The batch is the GLOBAL batch; under a ``data``-sharded mesh
XLA inserts the gradient psum (DDP equivalent) and the similarity losses span
all replicas (GatherLayer equivalent) automatically.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..data.contract import LabelCol
from . import losses as L
from .grad_modulate import modulate_kernel_grad
from .state import TrainState

TASK_LABEL_COL = {
    "diag2021": LabelCol.DIAG,
    "grade": LabelCol.GRADE,
    "subtype": LabelCol.SUBTYPE,
    "survival": LabelCol.SURVIVAL_BIN,
}


def batch_to_arrays(batch) -> dict:
    return dict(
        x_path10=jnp.asarray(batch.x_path10),
        x_path20=jnp.asarray(batch.x_path20),
        x_omic=jnp.asarray(batch.x_omic),
        x_omic_tumor=jnp.asarray(batch.x_omic_tumor),
        x_omic_immune=jnp.asarray(batch.x_omic_immune),
        label=jnp.asarray(batch.label, dtype=jnp.int32),
    )


def _model_kwargs(mode: str, arrays: dict, train: bool) -> dict:
    if mode in ("teacher", "uniteacher", "multiscale"):
        return {k: arrays[k] for k in
                ("x_path10", "x_path20", "x_omic_tumor", "x_omic_immune")}
    if mode == "student":
        return {k: arrays[k] for k in ("x_path10", "x_path20")}
    if mode == "deformpathomic":
        return dict(x_path=arrays["x_path10"], x_omic=arrays["x_omic"],
                    x_omic_tumor=arrays["x_omic_tumor"],
                    x_omic_immune=arrays["x_omic_immune"])
    if mode in ("pathomic", "pathomic_original", "mcat", "cmta"):
        return dict(x_path=arrays["x_path10"], x_omic=arrays["x_omic"])
    if mode in ("pathomic_fg", "pathomic_ensemble"):
        return dict(x_path=arrays["x_path10"], x_omic=arrays["x_omic"],
                    is_training=train)
    if mode in ("path", "transmil"):
        return dict(x=arrays["x_path10"])
    if mode == "omic":
        return dict(x_omic=arrays["x_omic"])
    raise NotImplementedError(mode)


def _apply(model, state_params, batch_stats, mode, arrays, rng, train: bool):
    variables = {"params": state_params}
    mutable = False
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
        mutable = ["batch_stats"] if train else False
    kwargs = _model_kwargs(mode, arrays, train)
    rngs = {"dropout": rng} if train else None
    out = model.apply(variables, **kwargs, deterministic=not train, rngs=rngs,
                      mutable=mutable)
    if mutable:
        out, updates = out
        return out, updates.get("batch_stats")
    return out, batch_stats


def _task_loss_from_dicts(task, label, logits_dict, hazards_dict, S_dict, key10,
                          key20, class_weights):
    l10 = L.task_loss(task, logits=logits_dict[key10],
                      hazards=hazards_dict["hazards_" + key10.split("_")[1]],
                      S=S_dict["S_" + key10.split("_")[1]],
                      label=label, class_weights=class_weights)
    l20 = L.task_loss(task, logits=logits_dict[key20],
                      hazards=hazards_dict["hazards_" + key20.split("_")[1]],
                      S=S_dict["S_" + key20.split("_")[1]],
                      label=label, class_weights=class_weights)
    return l10 + l20


def task_class_weights(cfg, task: str):
    """CE class weights for ``task``.  external_eval removes the weights ONLY
    for diag2021 (reference train_test.py:24-29); grade/subtype losses stay
    weighted unconditionally."""
    if task == "survival" or (task == "diag2021" and cfg.external_eval):
        return None
    return cfg.class_weights


def make_train_step(model, cfg, tx: optax.GradientTransformation,
                    teacher_model=None) -> Callable:
    """Build the jitted global-batch train step for ``cfg.mode``."""
    mode = cfg.mode
    task = cfg.task_type
    cw = task_class_weights(cfg, task)
    label_col = int(TASK_LABEL_COL[task])
    multiscale_attention = bool(cfg.multiscale_attention)
    gradient_modulate = bool(cfg.gradient_modulate)
    return_vgrid = bool(cfg.return_vgrid)
    distill_logits = bool(cfg.distill_logits)
    distill_feature = bool(cfg.distill_feature)
    temperature = float(cfg.temperature)
    # deterministic_training: dropout off / DPC noise pinned / BN frozen —
    # the trajectory-parity configuration (config.py); train math unchanged
    train_flag = not bool(getattr(cfg, "deterministic_training", False))

    model_mode = "student" if mode == "distillation" else mode

    def loss_and_aux(params, batch_stats, arrays, rng, teacher_vars):
        label = arrays["label"]
        out, new_bs = _apply(model, params, batch_stats, model_mode, arrays,
                             rng, train_flag)
        metrics = {}
        aux = {}

        if mode in ("teacher", "uniteacher"):
            feature_dict, att_dict, logits_dict, hazards_dict, S_dict, _ = out
            taskloss = _task_loss_from_dicts(
                task, label, logits_dict, hazards_dict, S_dict,
                "logits_tea10", "logits_tea20", cw)
            loss = taskloss
            metrics["taskloss"] = taskloss
            if multiscale_attention:
                batchloss = L.omic_domain_scale_loss(
                    att_dict["att1_tea10"], att_dict["att1_tea20"],
                    att_dict["att2_tea10"], att_dict["att2_tea20"])
                loss = loss + batchloss
                metrics["batchloss"] = batchloss
            aux["features"] = feature_dict

        elif mode == "student":
            _, att_dict, logits_dict, hazards_dict, S_dict, _ = out
            taskloss = _task_loss_from_dicts(
                task, label, logits_dict, hazards_dict, S_dict,
                "logits_stu10", "logits_stu20", cw)
            loss = taskloss
            metrics["taskloss"] = taskloss
            if multiscale_attention:
                # the stacked variant keeps the scale axis leading so a
                # 'scale'-sharded mesh contracts each map locally
                # (parallel/branch_shard.py)
                if "att_stu_stacked" in att_dict:
                    batchloss = 1000.0 * L.path_batch_loss_stacked(
                        att_dict["att_stu_stacked"])
                else:
                    batchloss = 1000.0 * L.path_batch_loss(
                        att_dict["att_stu10"], att_dict["att_stu20"])
                loss = loss + batchloss
                metrics["batchloss"] = batchloss

        elif mode == "distillation":
            # frozen teacher forward (reference train_test.py:585-588)
            tea_out, _ = _apply(teacher_model, teacher_vars["params"],
                                teacher_vars.get("batch_stats"), "teacher",
                                arrays, rng, False)
            fd_t, _, ld_t, _, _, _ = jax.lax.stop_gradient(tea_out)
            feat_tea10 = jnp.concatenate(
                [fd_t["feature1_tea10"], fd_t["feature2_tea10"]], axis=-1)
            feat_tea20 = jnp.concatenate(
                [fd_t["feature1_tea20"], fd_t["feature2_tea20"]], axis=-1)

            fd_s, att_s, ld_s, hd_s, sd_s, _ = out
            taskloss = _task_loss_from_dicts(
                task, label, ld_s, hd_s, sd_s, "logits_stu10", "logits_stu20", cw)
            metrics["taskloss"] = taskloss
            loss = taskloss
            if distill_logits:
                dl = (L.distillation_loss(ld_s["logits_stu10"], ld_t["logits_tea10"],
                                          temperature)
                      + L.distillation_loss(ld_s["logits_stu20"], ld_t["logits_tea20"],
                                            temperature))
                metrics["distillloss_logits"] = dl
            if distill_feature:
                df = (L.feature_distillation_loss(fd_s["feature_stu10"], feat_tea10)
                      + L.feature_distillation_loss(fd_s["feature_stu20"], feat_tea20))
                metrics["distillloss_feature"] = df
            # weighting exactly as reference train_test.py:635-642
            if distill_logits and distill_feature:
                loss = taskloss + 0.01 * dl + 0.01 * df
            elif distill_logits:
                loss = taskloss + dl
            elif distill_feature:
                loss = taskloss + df
            if multiscale_attention:  # computed for logging only (ref :627-632)
                metrics["batchloss"] = L.path_batch_loss(
                    att_s["att_stu10"], att_s["att_stu20"])

        elif mode == "multiscale":
            # joint two-scale teacher+student training.  The reference defines
            # MultiScaleNet (models/model.py:606-706) but never dispatches a
            # trainer for it (main.py:209-220 covers only 4 modes); the loss
            # here is the natural union of the teacher and student trainers:
            # task losses on all four logits + both attention-consistency
            # losses.
            _, att_dict, logits_dict, hazards_dict, S_dict, _ = out
            taskloss = (_task_loss_from_dicts(task, label, logits_dict,
                                              hazards_dict, S_dict,
                                              "logits_tea10", "logits_tea20", cw)
                        + _task_loss_from_dicts(task, label, logits_dict,
                                                hazards_dict, S_dict,
                                                "logits_stu10", "logits_stu20",
                                                cw))
            loss = taskloss
            metrics["taskloss"] = taskloss
            if multiscale_attention:
                if "att_stu_stacked" in att_dict:  # branch-parallel layout
                    stu_batchloss = 1000.0 * L.path_batch_loss_stacked(
                        att_dict["att_stu_stacked"])
                else:
                    stu_batchloss = 1000.0 * L.path_batch_loss(
                        att_dict["att_stu10"], att_dict["att_stu20"])
                batchloss = (L.omic_domain_scale_loss(
                    att_dict["att1_tea10"], att_dict["att1_tea20"],
                    att_dict["att2_tea10"], att_dict["att2_tea20"])
                    + stu_batchloss)
                loss = loss + batchloss
                metrics["batchloss"] = batchloss

        elif mode == "deformpathomic":
            features, vec_t, vec_i, logits, *_ = out
            fused = logits[2]
            if task == "survival":
                S = jnp.cumprod(1.0 - fused, axis=1)
                loss3 = L.nll_surv_loss(fused, S, label[:, LabelCol.SURVIVAL_BIN],
                                        label[:, LabelCol.CENSOR], alpha=0.0)
            else:
                loss3 = L.weighted_cross_entropy(fused, label[:, label_col], cw)
            loss = loss3
            metrics["loss3"] = loss3
            if return_vgrid:
                bs_t = L.batch_loss_vgrid(logits[3], logits[4])
                bs_i = L.batch_loss_vgrid(logits[5], logits[6])
                batch_sim = 0.5 * bs_t + 0.5 * bs_i
                loss = loss3 + batch_sim
                metrics["batch_sim_loss"] = batch_sim
            aux["features"] = {"tumor": vec_t, "immune": vec_i}

        else:
            # simple baselines: loss on the final/fused logits
            if mode in ("mcat", "cmta"):
                logits, hazards, S = out[0], out[1], out[2]
                if task == "survival":
                    loss = L.nll_surv_loss(hazards, S,
                                           label[:, LabelCol.SURVIVAL_BIN],
                                           label[:, LabelCol.CENSOR], alpha=0.0)
                else:
                    loss = L.weighted_cross_entropy(logits, label[:, label_col], cw)
            elif mode in ("path", "transmil", "omic"):
                logits = out[1]
                loss = L.weighted_cross_entropy(logits, label[:, label_col], cw)
            else:  # pathomic family: loss on fused logits[2]
                logits = out[3][2]
                loss = L.weighted_cross_entropy(logits, label[:, label_col], cw)
            metrics["taskloss"] = loss

        metrics["loss"] = loss
        return loss, (metrics, aux, new_bs)

    def train_step(state: TrainState, arrays: dict, rng, teacher_vars=None):
        grad_fn = jax.value_and_grad(loss_and_aux, has_aux=True)
        (_, (metrics, aux, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, arrays, rng, teacher_vars)

        if gradient_modulate and mode in ("teacher", "uniteacher"):
            label = arrays["label"][:, label_col]
            if "teacher_nets" in state.params:  # stacked_scales layout
                cls = state.params["teacher_nets"]["classifier"]
                kg = grads["teacher_nets"]["classifier"]["kernel"]
                for i, suffix in enumerate(("10", "20")):
                    f1 = aux["features"][f"feature1_tea{suffix}"]
                    f2 = aux["features"][f"feature2_tea{suffix}"]
                    kg = kg.at[i].set(modulate_kernel_grad(
                        kg[i], f1, f2, cls["kernel"][i], cls["bias"][i],
                        label))
                grads = _set_in(grads, ("teacher_nets", "classifier", "kernel"),
                                kg)
            else:
                for net in ("teacher10_net", "teacher20_net"):
                    suffix = net[7:9]  # "10" / "20"
                    f1 = aux["features"][f"feature1_tea{suffix}"]
                    f2 = aux["features"][f"feature2_tea{suffix}"]
                    cls = state.params[net]["classifier"]
                    new_kernel_grad = modulate_kernel_grad(
                        grads[net]["classifier"]["kernel"], f1, f2,
                        cls["kernel"], cls["bias"], label)
                    grads = _set_in(grads, (net, "classifier", "kernel"),
                                    new_kernel_grad)
        elif gradient_modulate and mode == "deformpathomic":
            label = arrays["label"][:, label_col]
            cls = state.params["classifier"]
            new_kernel_grad = modulate_kernel_grad(
                grads["classifier"]["kernel"],
                aux["features"]["tumor"], aux["features"]["immune"],
                cls["kernel"], cls["bias"], label)
            grads = _set_in(grads, ("classifier", "kernel"), new_kernel_grad)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=new_params, opt_state=new_opt_state,
                                  batch_stats=new_bs, step=state.step + 1)
        return new_state, metrics

    return train_step


def make_teacher_boundary_fn(teacher_model) -> Callable:
    """Frozen-teacher forward returning exactly the boundary tensors the
    distillation loss consumes (reference train_test.py:585-623): the two
    ``[B, C]`` logit blocks and the two ``[B, 256]`` concatenated feature
    blocks.  Shared by the teacher-output cache (trainers.py) and the
    pipeline stage-0 program (parallel/pipe_shard.py)."""

    def teacher_boundary(teacher_vars, arrays):
        variables = {"params": teacher_vars["params"]}
        if teacher_vars.get("batch_stats") is not None:
            variables["batch_stats"] = teacher_vars["batch_stats"]
        out = teacher_model.apply(
            variables, **_model_kwargs("teacher", arrays, False),
            deterministic=True)
        fd, _, ld = out[0], out[1], out[2]
        return (ld["logits_tea10"], ld["logits_tea20"],
                jnp.concatenate([fd["feature1_tea10"], fd["feature2_tea10"]],
                                axis=-1),
                jnp.concatenate([fd["feature1_tea20"], fd["feature2_tea20"]],
                                axis=-1))

    return teacher_boundary


def make_distill_cached_step(model, cfg, tx: optax.GradientTransformation) -> Callable:
    """Distillation train step consuming PRECOMPUTED teacher boundary
    tensors (``arrays['tea_lt10'/'tea_lt20'/'tea_ft10'/'tea_ft20']``)
    instead of running the teacher forward.

    The frozen teacher is deterministic, so its outputs for a given sample
    never change across epochs — recomputing them every step (as the
    reference does, train_test.py:585-588) spends a full teacher forward
    per step for identical bits.  With the trainers.py teacher-output cache
    each sample's boundary tensors (~1 KB) are computed once and replayed,
    making steady-state distillation run at student-only speed.  The loss
    math is identical to make_train_step's distillation branch."""
    task = cfg.task_type
    cw = task_class_weights(cfg, task)
    multiscale_attention = bool(cfg.multiscale_attention)
    distill_logits = bool(cfg.distill_logits)
    distill_feature = bool(cfg.distill_feature)
    temperature = float(cfg.temperature)

    def loss_fn(params, batch_stats, arrays, rng):
        label = arrays["label"]
        out, new_bs = _apply(model, params, batch_stats, "student", arrays,
                             rng, True)
        fd_s, att_s, ld_s, hd_s, sd_s, _ = out
        metrics = {}
        taskloss = _task_loss_from_dicts(
            task, label, ld_s, hd_s, sd_s, "logits_stu10", "logits_stu20", cw)
        metrics["taskloss"] = taskloss
        loss = taskloss
        if distill_logits:
            dl = (L.distillation_loss(ld_s["logits_stu10"],
                                      arrays["tea_lt10"], temperature)
                  + L.distillation_loss(ld_s["logits_stu20"],
                                        arrays["tea_lt20"], temperature))
            metrics["distillloss_logits"] = dl
        if distill_feature:
            df = (L.feature_distillation_loss(fd_s["feature_stu10"],
                                              arrays["tea_ft10"])
                  + L.feature_distillation_loss(fd_s["feature_stu20"],
                                                arrays["tea_ft20"]))
            metrics["distillloss_feature"] = df
        # weighting exactly as reference train_test.py:635-642
        if distill_logits and distill_feature:
            loss = taskloss + 0.01 * dl + 0.01 * df
        elif distill_logits:
            loss = taskloss + dl
        elif distill_feature:
            loss = taskloss + df
        if multiscale_attention:  # logging only (reference :627-632)
            metrics["batchloss"] = L.path_batch_loss(
                att_s["att_stu10"], att_s["att_stu20"])
        metrics["loss"] = loss
        return loss, (metrics, new_bs)

    def train_step(state: TrainState, arrays: dict, rng, teacher_vars=None):
        (_, (metrics, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, arrays,
                                   rng)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=new_params, opt_state=new_opt_state,
                                  batch_stats=new_bs, step=state.step + 1)
        return new_state, metrics

    return train_step


def _set_in(tree: dict, path: tuple, value):
    """Immutable nested-dict update."""
    if len(path) == 1:
        new = dict(tree)
        new[path[0]] = value
        return new
    new = dict(tree)
    new[path[0]] = _set_in(tree[path[0]], path[1:], value)
    return new


def make_eval_step(model, cfg, mode: str | None = None,
                   need_attention: bool = True) -> Callable:
    """Deterministic forward returning the model's raw structured output.

    ``need_attention=False`` empties the attention-map dict (position 1 of
    the teacher/student/multiscale 6-tuple — four ``[B, 8, 2500, 144]``
    maps, ~184 MB at B=4) so XLA dead-code-eliminates their
    materialization and ``device_get`` never ships them to the host.
    Metrics eval only reads logits/risk (evaluation.py distill_val); the
    visualization export path keeps its attention-bearing step."""
    mode = mode or cfg.mode
    if mode == "distillation":
        mode = "student"

    def eval_step(params, batch_stats, arrays):
        out, _ = _apply(model, params, batch_stats, mode, arrays, None, False)
        if (not need_attention and isinstance(out, tuple) and len(out) == 6
                and isinstance(out[1], dict)):
            out = (out[0], {}, *out[2:])
        return out

    return eval_step
