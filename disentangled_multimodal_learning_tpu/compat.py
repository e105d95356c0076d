"""Reference-named compatibility aliases (drop-in import surface).

Every public name the reference exposes maps here to its implementation in
this framework, so ``from dml_tpu.compat import NLLSurvLoss, define_optimizer``
works for code written against the reference's API.  Pure aliases — no
duplicate logic.  Names the reference defines but never uses (its vendored
SyncBatchNorm machinery, ``StudentNet_old``, ``OmicDomainScaleLoss_wrong``,
``DeformableMultiheadAttention``, ``BatchNorm2dReimpl``) are deliberately
absent; SyncBatchNorm semantics are subsumed by global-batch BN over the
data mesh (parallel/mesh.py docstring).

Reference sources: models/model.py:107-168 (define_optimizer/scheduler),
utils/utils.py:245-308 (survival losses), utils/loss.py, models/fusion.py
(TrilinearFusion_A/B), models/cmta_utils.py:1091-1228 (define_loss),
utils/utils.py:34-72 (regularizers), utils/feature_importance.py.
"""

from __future__ import annotations

import functools

from .models.fusion import TrilinearFusion
from .train import losses as _L
from .train.optim import make_optimizer, make_schedule
from .utils.importance import integrated_gradients_importance

# ---- fusion variants (reference models/fusion.py:66-201) ------------------
TrilinearFusion_A = functools.partial(TrilinearFusion, variant="A")
TrilinearFusion_B = functools.partial(TrilinearFusion, variant="B")

# ---- survival / task losses (reference utils/utils.py:245-308) ------------
nll_loss = _L.nll_surv_loss
CoxLoss = _L.cox_loss
ce_surv = _L.ce_surv_loss


class NLLSurvLoss:
    """reference utils/utils.py:263-272 (callable wrapper, default alpha)."""

    def __init__(self, alpha: float = 0.15):
        self.alpha = alpha

    def __call__(self, hazards, S, Y, c, alpha=None):
        a = self.alpha if alpha is None else alpha
        return _L.nll_surv_loss(hazards, S, Y, c, alpha=a)


class CrossEntropySurvLoss:
    """reference models/cmta_utils.py:1139-1156."""

    def __init__(self, alpha: float = 0.15):
        self.alpha = alpha

    def __call__(self, hazards, S, Y, c, alpha=None):
        a = self.alpha if alpha is None else alpha
        return _L.ce_surv_loss(hazards, S, Y, c, alpha=a)


class CoxSurvLoss:
    """reference utils/utils.py:293-308 (callable wrapper)."""

    def __call__(self, survtime, censor, hazard_pred):
        return _L.cox_loss(survtime, censor, hazard_pred)


def define_loss(which: str):
    """reference models/cmta_utils.py:1091-1111 loss-name dispatch."""
    table = {
        "ce_surv": CrossEntropySurvLoss(),
        "nll_surv": NLLSurvLoss(),
        "cox_surv": CoxSurvLoss(),
        "kl": _L.kl_loss,
        "cosine": _L.cosine_loss,
        "orthogonal": _L.orthogonal_loss,
    }
    if which not in table:
        raise NotImplementedError(f"unknown loss: {which}")
    return table[which]


# ---- optimizer / scheduler (reference models/model.py:107-168) ------------

def define_optimizer(args, steps_per_epoch: int = 1):
    """reference models/model.py:107-119 — returns the optax transformation
    (schedule included; JAX optimizers are created in one piece)."""
    return make_optimizer(args, steps_per_epoch)


def define_scheduler(args, steps_per_epoch: int = 1):
    """reference models/model.py:121-168 — returns the step -> lr schedule."""
    return make_schedule(args, steps_per_epoch)


# ---- weight regularizers (reference utils/utils.py:34-72) ------------------

def regularize_weights(params):
    """L1 over all params (reference utils/utils.py:34-42)."""
    return _L.l1_regularizer(params)


def _subtree(params, key_fragment):
    return {k: v for k, v in params.items() if key_fragment in k.lower()}


def regularize_path_weights(params):
    """reference utils/utils.py:45-53 — L1 over the path-branch params."""
    return _L.l1_regularizer(_subtree(params, "path"))


def regularize_MM_weights(params):
    """reference utils/utils.py:56-63 — L1 over the multimodal-fusion params."""
    return _L.l1_regularizer(_subtree(params, "fusion"))


def regularize_MM_omic(params):
    """reference utils/utils.py:66-72 — L1 over the omic-branch params."""
    return _L.l1_regularizer(_subtree(params, "omic"))


# ---- interpretability (reference utils/feature_importance.py:37-72) --------

def shap_feature_importance(*args, **kwargs):
    """The reference binds shap.DeepExplainer (unavailable here and in any
    torch-free environment); the JAX-native equivalent is expected-gradients
    SHAP (the GradientExplainer estimator of the same SHAP values), using
    the evaluation set as the background distribution exactly like the
    reference does (utils/feature_importance.py:37-72).  See
    utils/importance.py deep_shap_importance."""
    from .utils.importance import deep_shap_importance

    return deep_shap_importance(*args, **kwargs)
