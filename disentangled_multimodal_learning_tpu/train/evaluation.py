"""Held-out evaluation loops (the reference's ``epoch*Val*`` family,
utils/metrics.py:97-661): run the jitted eval step over a loader, accumulate
softmax activations / risks on host, compute metric dicts.

Key difference from the reference: evaluation is a separate jitted function
and its cadence is configurable (the reference runs a FULL test pass every 10
training iterations on rank 0 while other ranks idle at the next collective —
train_test.py:234-253 — a major host-sync anti-pattern we keep optional)."""

from __future__ import annotations

import jax
import numpy as np

from ..data.contract import LabelCol
from .metrics import cindex, compute_avg_metrics
from .steps import batch_to_arrays, make_eval_step


def _label_col(task_type: str) -> int:
    return {"diag2021": LabelCol.DIAG, "grade": LabelCol.GRADE,
            "subtype": LabelCol.SUBTYPE}[task_type]


def _softmax_np(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _strip_pad(out, batch_size: int, pad: int):
    """Drop the trailing ``pad`` duplicated samples from every per-sample
    array in a model output pytree (leaves whose leading dim == batch_size)."""
    keep = batch_size - pad
    return jax.tree_util.tree_map(
        lambda a: a[:keep]
        if (hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == batch_size)
        else a,
        out)


class Evaluator:
    """Caches the jitted eval step across epochs/folds."""

    def __init__(self, model, cfg, mode: str | None = None):
        self.cfg = cfg
        self.mode = (mode or cfg.mode)
        self._model = model
        # metrics only read logits/risk — drop the attention maps from the
        # jitted output so XLA DCEs them and device_get skips ~184 MB/batch
        self.step = jax.jit(make_eval_step(model, cfg, self.mode,
                                           need_attention=False))
        self._attn_step = None  # built lazily for export_attention_maps

    @property
    def step_with_attention(self):
        if self._attn_step is None:
            self._attn_step = jax.jit(
                make_eval_step(self._model, self.cfg, self.mode,
                               need_attention=True))
        return self._attn_step

    def _run(self, state, loader):
        outs, labels = [], []
        for batch in loader:
            arrays = batch_to_arrays(batch)
            out = self.step(state.params, state.batch_stats, arrays)
            out = jax.device_get(out)
            pad = getattr(batch, "pad", 0)
            label = np.asarray(batch.label)
            if pad:  # strip loader-duplicated rows (loader.py pad contract)
                out = _strip_pad(out, label.shape[0], pad)
                label = label[: label.shape[0] - pad]
            outs.append(out)
            labels.append(label)
        return outs, np.concatenate(labels, axis=0)

    # -- teacher/student dict models (epochDistillVal, utils/metrics.py:97-332)
    def distill_val(self, state, loader, model_type: str):
        cfg = self.cfg
        outs, labels = self._run(state, loader)
        tags = {"teacher": ("tea10", "tea20", "teas"),
                "student": ("stu10", "stu20", "stus"),
                # multiscale joint model (reference epochScalesVal,
                # utils/metrics.py:335-493): per-scale teacher + student +
                # combined student logits
                "scales": ("tea10", "tea20", "stu10", "stu20", "stus")}[model_type]
        if cfg.task_type == "survival":
            risks = {t: np.concatenate([o[5][f"risk_{t}"] for o in outs]) for t in tags}
            censor = labels[:, LabelCol.CENSOR]
            times = labels[:, LabelCol.SURVIVAL_TIME]
            return {f"cindex_{t}": cindex(risks[t], censor, times) for t in tags}
        y = labels[:, _label_col(cfg.task_type)]
        names = ("acc", "f1", "auc", "bac", "sens", "spec", "prec")
        dicts = {n: {} for n in names}
        for t in tags:
            probs = _softmax_np(np.concatenate([o[2][f"logits_{t}"] for o in outs]))
            vals = compute_avg_metrics(y, probs)
            for n, v in zip(names, vals):
                dicts[n][f"{n}_{t}"] = v
            if getattr(cfg, "save4roc", False):
                import os

                os.makedirs(cfg.checkpoints if cfg.checkpoints != "#" else ".",
                            exist_ok=True)
                base = cfg.checkpoints if cfg.checkpoints != "#" else "."
                save_roc_csv(os.path.join(base, f"roc_{t}_fold{cfg.cur_fold}.csv"),
                             y, probs)
        return tuple(dicts[n] for n in names)

    def export_attention_maps(self, state, loader, path: str):
        """Visualization export (reference train_test.py:1121-1177): for EVERY
        attention map the model emits (both compartments x both scales, e.g.
        att1_tea10 AND att2_tea10) dump the per-head max then mean over kv
        positions, alongside the combined prediction scores, the task labels
        and the wsi ids — everything the reference's heatmap analyses consume.
        Layout-aware: on TPU the 2-D deform attention emits kv-major "kn"
        maps (models/deform_attention.py attn_kv_axis)."""
        from ..models.deform_attention import attn_kv_axis

        kv_ax = attn_kv_axis()  # -1 ("nk") or -2 ("kn") for the 4-D map
        maps: dict[str, list] = {}
        scores, labels, ids = [], [], []
        score_key = None
        step = self.step_with_attention
        for batch in loader:
            arrays = batch_to_arrays(batch)
            out = step(state.params, state.batch_stats, arrays)
            att_dict, logits_dict = out[1], out[2]
            pad = getattr(batch, "pad", 0)
            keep = np.asarray(batch.label).shape[0] - pad
            for key in sorted(att_dict):
                if key.endswith("_stacked"):
                    continue  # scale-leading loss-only view (branch_shard.py)
                att = np.asarray(att_dict[key])[:keep]  # [B,H,N,K] / [B,H,K,N]
                maps.setdefault(key, []).append(
                    att.max(axis=1).mean(axis=kv_ax))  # [B, N]
            if score_key is None:
                # combined logits: student over teacher when both exist
                # (reference dumps logits_teas, train_test.py:1156)
                combined = [k for k in logits_dict
                            if k.endswith(("stus", "teas"))]
                score_key = (sorted(combined)[-1] if combined
                             else sorted(logits_dict)[0])
            scores.append(np.asarray(logits_dict[score_key])[:keep])
            labels.append(np.asarray(batch.label)[:keep, self._task_col()])
            if batch.wsi_id is not None:
                ids.extend(list(batch.wsi_id)[:keep])
        arrays_out = {
            "scores": (np.concatenate(scores) if scores
                       else np.zeros((0, self.cfg.label_dim))),
            "labels": np.concatenate(labels) if labels else np.zeros((0,)),
            "wsi_ids": np.asarray(ids),
        }
        # bucketed eval yields per-bucket bag lengths; NaN-pad to the widest
        # so one [n_bags, max_N] array still round-trips (NaN = past end)
        for key, chunks in maps.items():
            max_n = max(m.shape[1] for m in chunks)
            chunks = [np.pad(m, ((0, 0), (0, max_n - m.shape[1])),
                             constant_values=np.nan)
                      if m.shape[1] < max_n else m for m in chunks]
            arrays_out[f"att_{key}"] = np.concatenate(chunks)
        if maps:  # legacy alias: the first key's map (pre-r3 schema)
            arrays_out["attention"] = arrays_out[f"att_{sorted(maps)[0]}"]
        else:  # empty loader (tiny external-eval split): write empty arrays
            arrays_out["attention"] = np.zeros((0, 0))
        np.savez(path, **arrays_out)
        return path

    def _task_col(self) -> int:
        """Label column exported next to the attention maps (the reference
        dumps label[:,5] for diag2021, train_test.py:1157)."""
        if self.cfg.task_type == "survival":
            return LabelCol.SURVIVAL_BIN
        return _label_col(self.cfg.task_type)

    # -- deformpathomic / pathomic family: metrics on fused logits[2]
    # (epochVal / epochBaselineModelVal, utils/metrics.py:496-661)
    def fused_val(self, state, loader):
        cfg = self.cfg
        outs, labels = self._run(state, loader)
        fused = np.concatenate([np.asarray(o[3][2]) for o in outs])
        if cfg.task_type == "survival":
            # risk = -sum(cumprod(1 - hazards)) over bins
            S = np.cumprod(1.0 - fused, axis=1)
            risk = -S.sum(axis=1)
            return cindex(risk, labels[:, LabelCol.CENSOR],
                          labels[:, LabelCol.SURVIVAL_TIME])
        y = labels[:, _label_col(cfg.task_type)]
        return compute_avg_metrics(y, _softmax_np(fused))

    # -- simple (logits, hazards, S) models: mcat / cmta / unimodal
    def simple_val(self, state, loader):
        cfg = self.cfg
        outs, labels = self._run(state, loader)
        if self.mode in ("path", "transmil", "omic"):
            logits = np.concatenate([np.asarray(o[1]) for o in outs])
        else:
            logits = np.concatenate([np.asarray(o[0]) for o in outs])
        if cfg.task_type == "survival":
            S = np.concatenate([np.asarray(o[2]) for o in outs])
            risk = -S.sum(axis=1)
            return cindex(risk, labels[:, LabelCol.CENSOR],
                          labels[:, LabelCol.SURVIVAL_TIME])
        y = labels[:, _label_col(cfg.task_type)]
        return compute_avg_metrics(y, _softmax_np(logits))

    def __call__(self, state, loader, model_type: str | None = None):
        if self.mode in ("teacher", "uniteacher", "student", "multiscale",
                         "distillation"):
            mt = model_type or {"student": "student", "distillation": "student",
                                "multiscale": "scales"}.get(self.mode, "teacher")
            return self.distill_val(state, loader, mt)
        if self.mode in ("deformpathomic", "pathomic", "pathomic_original",
                         "pathomic_fg", "pathomic_ensemble"):
            return self.fused_val(state, loader)
        return self.simple_val(state, loader)


def save_roc_csv(path: str, ground_truth, activations):
    """ROC score dump (reference train_test.py:1095-1119 save4roc)."""
    import csv

    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["label"] + [f"score_{i}" for i in range(activations.shape[1])])
        for y, row in zip(ground_truth, activations):
            w.writerow([int(y)] + [float(v) for v in row])


def save_attention_maps(path: str, att: np.ndarray, wsi_ids, kv_axis=None):
    """Attention-map export for heatmap visualization: per-head max then mean
    over kv positions (reference train_test.py:1138-1141).  ``kv_axis``
    defaults to the active 2-D deform-attention layout (attn_kv_axis)."""
    if kv_axis is None:
        from ..models.deform_attention import attn_kv_axis

        kv_axis = attn_kv_axis()
    maps = att.max(axis=1).mean(axis=kv_axis) if att.ndim == 4 else att
    np.savez(path, attention=maps, wsi_ids=np.asarray(wsi_ids))
