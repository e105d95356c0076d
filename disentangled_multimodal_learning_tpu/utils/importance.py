"""Gene-importance tooling (interpretability layer).

Reference mapping:
- ablation importance  -> utils/metrics.py:664-697 (ablation_epochVal):
  zero one gene column at a time, measure metric drop;
- permutation importance -> utils/permutation_importance.py:20-100
  (get_score_importances): shuffle one gene column at a time over several
  trials, measure score decrease;
- SHAP DeepExplainer (utils/feature_importance.py:37-72) is not reproduced
  (no shap package in this image); ablation + permutation cover the use case.

Both run the jitted eval step; only the omic column is perturbed host-side.
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def ablation_feature_importance(score_fn: Callable[[np.ndarray], float],
                                x_omic: np.ndarray) -> np.ndarray:
    """score_fn maps a [M, G] omic matrix to a scalar metric (e.g. AUC using
    fixed path features); returns per-gene importance = base - ablated."""
    base = score_fn(x_omic)
    G = x_omic.shape[1]
    imp = np.zeros(G, dtype=np.float64)
    for g in range(G):
        ablated = x_omic.copy()
        ablated[:, g] = 0.0
        imp[g] = base - score_fn(ablated)
    return imp


def permutation_feature_importance(score_fn: Callable[[np.ndarray], float],
                                   x_omic: np.ndarray, n_trials: int = 3,
                                   seed: int = 0) -> np.ndarray:
    """eli5-style permutation importance (reference
    utils/permutation_importance.py:20-100): average score drop over
    ``n_trials`` shuffles of each gene column."""
    rng = np.random.default_rng(seed)
    base = score_fn(x_omic)
    G = x_omic.shape[1]
    imp = np.zeros(G, dtype=np.float64)
    for g in range(G):
        drops = []
        for _ in range(n_trials):
            shuffled = x_omic.copy()
            rng.shuffle(shuffled[:, g])
            drops.append(base - score_fn(shuffled))
        imp[g] = float(np.mean(drops))
    return imp


def make_omic_score_fn(model, state, cfg, batches) -> Callable[[np.ndarray], float]:
    """Build a score_fn over a fixed evaluation set for mode='omic'/'pathomic'
    style models: returns accuracy of the fused/omic logits as the score."""
    import jax
    import jax.numpy as jnp

    from ..data.contract import LabelCol
    from ..train.steps import make_eval_step

    step = jax.jit(make_eval_step(model, cfg))
    col = {"diag2021": LabelCol.DIAG, "grade": LabelCol.GRADE,
           "subtype": LabelCol.SUBTYPE,
           "survival": LabelCol.SURVIVAL_BIN}[cfg.task_type]
    fixed = [
        dict(x_path10=jnp.asarray(b.x_path10), x_path20=jnp.asarray(b.x_path20),
             x_omic=jnp.asarray(b.x_omic), x_omic_tumor=jnp.asarray(b.x_omic_tumor),
             x_omic_immune=jnp.asarray(b.x_omic_immune),
             label=jnp.asarray(b.label, jnp.int32))
        for b in batches
    ]
    sizes = np.cumsum([0] + [a["x_omic"].shape[0] for a in fixed])

    def score_fn(x_omic: np.ndarray) -> float:
        correct = 0
        total = 0
        for i, arrays in enumerate(fixed):
            arr = dict(arrays)
            arr["x_omic"] = jnp.asarray(x_omic[sizes[i]: sizes[i + 1]])
            out = step(state.params, state.batch_stats, arr)
            if cfg.mode == "omic":
                logits = out[1]
            elif cfg.mode in ("mcat", "cmta"):
                logits = out[0]
            else:
                logits = out[3][2]
            pred = np.asarray(jnp.argmax(logits, axis=-1))
            y = np.asarray(arrays["label"][:, col])
            correct += int((pred == y).sum())
            total += len(y)
        return correct / max(total, 1)

    return score_fn
