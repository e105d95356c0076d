"""Gene-importance tooling (interpretability layer).

Reference mapping:
- ablation importance  -> utils/metrics.py:664-697 (ablation_epochVal):
  zero one gene column at a time, measure metric drop;
- permutation importance -> utils/permutation_importance.py:20-100
  (get_score_importances): shuffle one gene column at a time over several
  trials, measure score decrease;
- SHAP DeepExplainer (utils/feature_importance.py:37-72) -> JAX-native
  integrated gradients below: the same gradient-based per-gene attribution
  use case (average contribution of each gene to the target-class logit),
  without the shap package (absent from this image).  IG satisfies the same
  completeness axiom as DeepSHAP (attributions sum to f(x) - f(baseline)).

All run the jitted eval step; only the omic input is perturbed/attributed.
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


def export_gene_importance(importance: np.ndarray, gene_list,
                           out_dir: str = ".", top_k: int = 2) -> dict:
    """Reference workflow surface (utils/feature_importance.py:8-23): write
    the per-gene score vector to ``difference_acc_list.csv`` and the top-k
    gene names (the reference hardcodes top 2) to ``gene_importance.csv``.
    Returns {"scores": path, "genes": path}."""
    import csv
    import os

    os.makedirs(out_dir, exist_ok=True)
    scores_path = os.path.join(out_dir, "difference_acc_list.csv")
    with open(scores_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["0"])  # pandas to_csv(index=False) header of a 1-col df
        for v in importance:
            w.writerow([float(v)])
    order = np.argsort(importance)[::-1]
    genes_path = os.path.join(out_dir, "gene_importance.csv")
    with open(genes_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["0"])
        for i in order[:top_k]:
            w.writerow([gene_list[int(i)]])
    return {"scores": scores_path, "genes": genes_path}


def integrated_gradients(logit_fn: Callable, x_omic: np.ndarray,
                         baseline: np.ndarray | None = None,
                         steps: int = 32) -> np.ndarray:
    """Per-sample integrated gradients of a scalar-per-sample function over
    the omic input (the JAX-native replacement for the reference's SHAP
    DeepExplainer gene attribution, utils/feature_importance.py:37-72).

    ``logit_fn``: [M, G] -> [M] (e.g. the target-class logit per sample).
    Returns attributions [M, G] with the completeness property
    ``ig.sum(axis=1) == logit_fn(x) - logit_fn(baseline)`` (exact for the
    midpoint rule on (piecewise-)linear models, approximate otherwise).
    Default baseline is the zero vector (matching ablation's "gene absent").
    """
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(x_omic)
    x0 = jnp.zeros_like(x) if baseline is None else jnp.asarray(baseline)

    grad_fn = jax.grad(lambda xo: jnp.sum(logit_fn(xo)))
    alphas = (jnp.arange(steps, dtype=x.dtype) + 0.5) / steps  # midpoint rule

    def body(acc, a):
        return acc + grad_fn(x0 + a * (x - x0)), None

    total, _ = jax.lax.scan(body, jnp.zeros_like(x), alphas)
    return np.asarray((x - x0) * total / steps)


def expected_gradients_shap(logit_fn: Callable, x: np.ndarray,
                            background: np.ndarray, n_baselines: int = 8,
                            steps: int = 16, seed: int = 0) -> np.ndarray:
    """SHAP attributions via expected gradients — the GradientExplainer
    estimator of the same SHAP values the reference's DeepExplainer
    approximates (reference utils/feature_importance.py:37-72, which uses
    the whole test set as the background distribution).

    Integrated gradients averaged over ``n_baselines`` background samples:
        phi(x) = E_{b~background}[ IG(x; baseline=b) ]
    Completeness holds in expectation:
        phi(x).sum() == f(x) - E_b[f(b)]
    (exact for the sampled baseline set on (piecewise-)linear models).
    Returns per-sample attributions [M, G]."""
    rng = np.random.default_rng(seed)
    background = np.asarray(background)
    n = min(n_baselines, len(background))
    idx = rng.choice(len(background), size=n, replace=n > len(background))
    acc = np.zeros_like(np.asarray(x), dtype=np.float64)
    for i in idx:
        base = np.broadcast_to(background[i], np.shape(x))
        acc += integrated_gradients(logit_fn, x, baseline=base, steps=steps)
    return acc / n


def deep_shap_importance(model, state, cfg, batches, n_baselines: int = 8,
                         steps: int = 16, seed: int = 0) -> np.ndarray:
    """Gene-importance vector [G] from expected-gradients SHAP of the
    true-class logit, using the evaluation set itself as the background
    distribution — mirroring the reference's DeepExplainer workflow
    (background = entire test set, mean |contribution| per gene,
    utils/feature_importance.py:37-72)."""
    import jax
    import jax.numpy as jnp

    from ..data.contract import LabelCol
    from ..train.steps import make_eval_step

    step = make_eval_step(model, cfg)
    col = {"diag2021": LabelCol.DIAG, "grade": LabelCol.GRADE,
           "subtype": LabelCol.SUBTYPE,
           "survival": LabelCol.SURVIVAL_BIN}[cfg.task_type]
    background = np.concatenate([np.asarray(b.x_omic) for b in batches])

    attributions = []
    for b in batches:
        arrays = dict(
            x_path10=jnp.asarray(b.x_path10), x_path20=jnp.asarray(b.x_path20),
            x_omic=jnp.asarray(b.x_omic),
            x_omic_tumor=jnp.asarray(b.x_omic_tumor),
            x_omic_immune=jnp.asarray(b.x_omic_immune),
            label=jnp.asarray(b.label, jnp.int32))
        y = arrays["label"][:, col]

        def logit_fn(x_omic, arrays=arrays, y=y):
            arr = dict(arrays)
            arr["x_omic"] = x_omic
            out = step(state.params, state.batch_stats, arr)
            if cfg.mode == "omic":
                logits = out[1]
            elif cfg.mode in ("mcat", "cmta"):
                logits = out[0]
            else:
                logits = out[3][2]
            return logits[jnp.arange(logits.shape[0]), y]

        phi = expected_gradients_shap(jax.jit(logit_fn), np.asarray(b.x_omic),
                                      background, n_baselines=n_baselines,
                                      steps=steps, seed=seed)
        pad = getattr(b, "pad", 0)
        attributions.append(phi[: phi.shape[0] - pad] if pad else phi)
    return np.abs(np.concatenate(attributions, axis=0)).mean(axis=0)


def integrated_gradients_importance(model, state, cfg, batches,
                                    steps: int = 32) -> np.ndarray:
    """Per-gene importance [G]: mean |IG| of the true-class logit over every
    sample of ``batches`` — same output shape/orientation as ablation and
    permutation importance (higher = more influential)."""
    import jax
    import jax.numpy as jnp

    from ..data.contract import LabelCol
    from ..train.steps import make_eval_step

    step = make_eval_step(model, cfg)
    col = {"diag2021": LabelCol.DIAG, "grade": LabelCol.GRADE,
           "subtype": LabelCol.SUBTYPE,
           "survival": LabelCol.SURVIVAL_BIN}[cfg.task_type]

    def logits_of(out):
        if cfg.mode == "omic":
            return out[1]
        if cfg.mode in ("mcat", "cmta"):
            return out[0]
        return out[3][2]  # pathomic/deformpathomic fused logits

    attributions = []
    for b in batches:
        arrays = dict(
            x_path10=jnp.asarray(b.x_path10), x_path20=jnp.asarray(b.x_path20),
            x_omic=jnp.asarray(b.x_omic),
            x_omic_tumor=jnp.asarray(b.x_omic_tumor),
            x_omic_immune=jnp.asarray(b.x_omic_immune),
            label=jnp.asarray(b.label, jnp.int32))
        y = arrays["label"][:, col]

        def logit_fn(x_omic, arrays=arrays, y=y):
            arr = dict(arrays)
            arr["x_omic"] = x_omic
            out = step(state.params, state.batch_stats, arr)
            logits = logits_of(out)
            return logits[jnp.arange(logits.shape[0]), y]

        ig = integrated_gradients(jax.jit(logit_fn), np.asarray(b.x_omic),
                                  steps=steps)
        pad = getattr(b, "pad", 0)
        attributions.append(ig[: ig.shape[0] - pad] if pad else ig)
    return np.abs(np.concatenate(attributions, axis=0)).mean(axis=0)


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
