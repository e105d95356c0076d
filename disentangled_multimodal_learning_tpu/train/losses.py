"""Losses: task heads + similarity/consistency family + distillation.

Reference mapping:
- weighted CE                      -> torch CrossEntropyLoss(weight=...)
                                      (train_test.py:27-29)
- nll_surv / cox                   -> utils/utils.py:245-308
- DistillationLoss (KL, T^2)       -> utils/loss.py:7-23
- PathBatchLoss                    -> utils/loss.py:25-64
- OmicDomainScaleLoss (+diag var)  -> utils/loss.py:82-143
- BatchLoss (omic vs vgrid sim)    -> utils/loss.py:220-253
- KL/Cosine/Orthogonal (CMTA)      -> models/cmta_utils.py:1199-1228

Cross-replica note: the reference all_gathers activations across DDP ranks
before the batch-similarity losses (GatherLayer, utils/loss.py:36-38,101-105,
231-233).  Here the jitted step computes the loss on the GLOBAL batch (sharded
over the ``data`` mesh axis), so the N x N similarity matrices already span
all replicas and XLA inserts the collectives — no explicit gather, and unlike
the reference's GatherLayer backward (which drops cross-replica gradient
contributions, utils/gather.py:16-19) the gradient here is exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- task losses

def weighted_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                           class_weights=None) -> jnp.ndarray:
    """torch CrossEntropyLoss semantics: mean over samples, weighted mean when
    per-class weights are given (normalized by the sum of sample weights)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    if class_weights is None:
        return jnp.mean(nll)
    w = jnp.asarray(class_weights, dtype=logits.dtype)[labels]
    return jnp.sum(w * nll) / jnp.sum(w)


def nll_surv_loss(hazards: jnp.ndarray, S: jnp.ndarray | None, Y: jnp.ndarray,
                  c: jnp.ndarray, alpha: float = 0.4, eps: float = 1e-7) -> jnp.ndarray:
    """Discrete-time survival NLL with censoring (reference utils/utils.py:245-261).

    hazards/S: [B, K]; Y: [B] int bin; c: [B] censorship (1 = censored).
    """
    Y = Y[:, None]
    c = c[:, None].astype(hazards.dtype)
    if S is None:
        S = jnp.cumprod(1.0 - hazards, axis=1)
    S_padded = jnp.concatenate([jnp.ones_like(c), S], axis=1)

    s_y = jnp.take_along_axis(S_padded, Y, axis=1)
    h_y = jnp.take_along_axis(hazards, Y, axis=1)
    s_y1 = jnp.take_along_axis(S_padded, Y + 1, axis=1)

    uncensored = -(1.0 - c) * (jnp.log(jnp.clip(s_y, eps)) + jnp.log(jnp.clip(h_y, eps)))
    censored = -c * jnp.log(jnp.clip(s_y1, eps))
    neg_l = censored + uncensored
    loss = (1.0 - alpha) * neg_l + alpha * uncensored
    return jnp.mean(loss)


def cox_loss(survtime: jnp.ndarray, censor: jnp.ndarray,
             hazard_pred: jnp.ndarray) -> jnp.ndarray:
    """Cox partial likelihood with O(B^2) risk-set matrix
    (reference utils/utils.py:293-308; note it multiplies by ``censor`` —
    reproduced as-is)."""
    theta = hazard_pred.reshape(-1)
    risk_mat = (survtime[None, :] >= survtime[:, None]).astype(theta.dtype)
    log_risk = jnp.log(jnp.sum(jnp.exp(theta)[None, :] * risk_mat, axis=1))
    return -jnp.mean((theta - log_risk) * censor)


def ce_surv_loss(hazards, S, Y, c, alpha=0.4, eps=1e-7):
    """CrossEntropySurvLoss (reference models/cmta_utils.py:1139-1156)."""
    Y = Y[:, None]
    c = c[:, None].astype(hazards.dtype)
    S_padded = jnp.concatenate([jnp.ones_like(c), S], axis=1)
    s_pad_y = jnp.take_along_axis(S_padded, Y, axis=1)
    h_y = jnp.take_along_axis(hazards, Y, axis=1)
    s_y = jnp.take_along_axis(S, Y, axis=1)
    reg = -(1.0 - c) * (jnp.log(s_pad_y + eps) + jnp.log(jnp.clip(h_y, eps)))
    ce_l = -c * jnp.log(jnp.clip(s_y, eps)) - (1.0 - c) * jnp.log(jnp.clip(1.0 - s_y, eps))
    return jnp.mean((1.0 - alpha) * ce_l + alpha * reg)


def task_loss(task_type: str, logits=None, hazards=None, S=None, label=None,
              class_weights=None):
    """Dispatch matching reference trainer switch (train_test.py:61-79):
    diag2021/grade/subtype -> weighted CE on the task's label column;
    survival -> NLL-surv with alpha=0 (the per-step call, train_test.py:69)."""
    from ..data.contract import LabelCol

    if task_type == "survival":
        return nll_surv_loss(hazards, S, label[:, LabelCol.SURVIVAL_BIN],
                             label[:, LabelCol.CENSOR], alpha=0.0)
    col = {"diag2021": LabelCol.DIAG, "grade": LabelCol.GRADE,
           "subtype": LabelCol.SUBTYPE}[task_type]
    return weighted_cross_entropy(logits, label[:, col], class_weights)


# -------------------------------------------------------- distillation losses

def distillation_loss(student_logits: jnp.ndarray, teacher_logits: jnp.ndarray,
                      temperature: float = 2.0) -> jnp.ndarray:
    """KL(student || teacher) with temperature, batchmean x T^2
    (reference utils/loss.py:7-23)."""
    t = temperature
    soft_targets = jax.nn.softmax(teacher_logits / t, axis=1)
    soft_prob = jax.nn.log_softmax(student_logits / t, axis=1)
    kl = soft_targets * (jnp.log(jnp.clip(soft_targets, 1e-12)) - soft_prob)
    return jnp.sum(kl) / student_logits.shape[0] * (t ** 2)


def feature_distillation_loss(student_feat, teacher_feat):
    """MSE feature KD (reference train_test.py:623-625)."""
    return jnp.mean((student_feat - teacher_feat) ** 2)


# ----------------------------------------------- batch-similarity consistency

def _row_normalized_gram(a: jnp.ndarray) -> jnp.ndarray:
    """S = A A^T normalized by row L2 norms of S (reference utils/loss.py:48-51)."""
    s = a @ a.T
    norm = jnp.linalg.norm(s, axis=1, keepdims=True)
    return s / norm


def path_batch_loss(att10: jnp.ndarray, att20: jnp.ndarray) -> jnp.ndarray:
    """Cross-scale attention-similarity consistency for the student
    (reference utils/loss.py:25-64; trainers take torch.sum of the matrix,
    train_test.py:409, so this returns the summed scalar).

    att10/att20: [N, 8, L1, L2] global-batch attention maps.

    The per-head Grams are contracted DIRECTLY in the native [N,8,L1,L2]
    layout (einsum over the trailing axes == the reference's
    reshape(n,-1) @ .T — the sum is order-independent); the explicit
    flatten+transpose forced XLA to relayout the 46 MB maps on TPU.
    """
    n = att10.shape[0]

    def gram_mean(a):
        s = jnp.einsum("bhij,chij->hbc", a, a,
                        preferred_element_type=jnp.float32)  # [8,N,N] Grams
        norm = jnp.linalg.norm(s, axis=2, keepdims=True)
        return jnp.mean(s / norm, axis=0)

    m10 = gram_mean(att10)
    m20 = gram_mean(att20)
    return jnp.sum((m10 - m20) ** 2 / n)


def path_batch_loss_stacked(att: jnp.ndarray) -> jnp.ndarray:
    """``path_batch_loss(att[0], att[1])`` computed with the scale axis still
    LEADING: ``att`` is the ``[2, N, 8, L1, L2]`` stacked two-scale map from a
    ``stacked_scales`` model (parallel/branch_shard.py).

    Under a ``'scale'``-sharded mesh the per-scale Gram contraction
    (``sbhij,schij->shbc``) keeps the scale axis partitioned, so each device
    group reduces its OWN magnification's 46 MB map down to an [8, N, N] Gram
    locally and only the KB-scale Grams cross the scale seam — slicing the
    maps first (as ``path_batch_loss`` on ``att[0]``/``att[1]`` would) forces
    GSPMD to replicate both full maps across the seam (measured:
    tools/exp_branch_partition.py)."""
    n = att.shape[1]
    s = jnp.einsum("sbhij,schij->shbc", att, att,
                   preferred_element_type=jnp.float32)  # [2, 8, N, N]
    norm = jnp.linalg.norm(s, axis=3, keepdims=True)
    m = jnp.mean(s / norm, axis=1)  # [2, N, N]
    return jnp.sum((m[0] - m[1]) ** 2 / n)


def diag_variance_loss(x: jnp.ndarray, weight: float = 1.0) -> jnp.ndarray:
    """Unbiased variance of the matrix diagonal (reference utils/loss.py:82-85;
    torch.var defaults to the n-1 denominator)."""
    d = jnp.diagonal(x)
    return weight * jnp.var(d, ddof=1)


def omic_domain_scale_loss(att1_10, att1_20, att2_10, att2_20) -> jnp.ndarray:
    """Teacher cross-scale attention consistency: cosine-style cross-Gram of
    flattened attention maps per compartment, penalizing diagonal variance
    x10000 (reference utils/loss.py:90-143)."""
    def sim_loss(a, b):
        # cross-Gram contracted in the native [N, H, L1, L2] layout: equal to
        # the reference's a.reshape(n,-1) @ b.reshape(n,-1).T (the inner
        # product is flatten-order-independent) without the 46 MB relayout
        # the explicit flatten costs on TPU
        s = jnp.einsum("bhij,chij->bc", a, b,
                       preferred_element_type=jnp.float32)
        s = s / jnp.linalg.norm(s, axis=1, keepdims=True)
        return diag_variance_loss(s, weight=10000.0)

    return sim_loss(att1_10, att1_20) + sim_loss(att2_10, att2_20)


def batch_loss_vgrid(omic: jnp.ndarray, vgrid: jnp.ndarray) -> jnp.ndarray:
    """Omic-similarity vs vgrid-similarity consistency for deformpathomic
    (reference utils/loss.py:220-253; summed like train_test.py:846-848).

    omic: [N, ...] broadcast omic features; vgrid: [N*G, 2, gh, gw] with G=8
    offset groups.  The reference reshapes vgrid to (8, N, -1) in flat C
    order — reproduced verbatim (note: that interleaves batch/group axes since
    the leading axis is (batch, group)-major; a documented reference quirk).
    """
    n = omic.shape[0]
    o = omic.reshape(n, -1)
    s = o @ o.T
    s = s / jnp.linalg.norm(s, axis=1, keepdims=True)

    vg = vgrid.reshape(8, n, -1)
    vs = jax.vmap(_row_normalized_gram)(vg)
    mean_vs = jnp.mean(vs, axis=0)
    return jnp.sum((s - mean_vs) ** 2 / n)


# ------------------------------------------------------------- CMTA auxiliary

def kl_loss(y: jnp.ndarray, y_hat: jnp.ndarray) -> jnp.ndarray:
    """reference models/cmta_utils.py:1199-1201 (sum-reduced KL of softmaxes)."""
    p = jax.nn.softmax(y, axis=-1)
    logq = jax.nn.log_softmax(y_hat, axis=-1)
    return jnp.sum(p * (jnp.log(jnp.clip(p, 1e-12)) - logq))


def _cossim(a, b, axis=1, eps=1e-8):
    num = jnp.sum(a * b, axis=axis)
    den = jnp.linalg.norm(a, axis=axis) * jnp.linalg.norm(b, axis=axis)
    return num / jnp.maximum(den, eps)


def cosine_loss(y, y_hat):
    """1 - cos(y, y_hat) (reference models/cmta_utils.py:1204-1206)."""
    return 1.0 - _cossim(y, y_hat)


def orthogonal_loss(P, P_hat, G, G_hat, gamma: float = 0.5):
    """CMTA orthogonal alignment loss (reference models/cmta_utils.py:1209-1228)."""
    sg = jax.lax.stop_gradient
    pos = (1.0 - jnp.abs(_cossim(sg(P), P_hat))) + (1.0 - jnp.abs(_cossim(sg(G), G_hat)))
    neg = (jnp.abs(_cossim(P, G)) + jnp.abs(_cossim(sg(P), G_hat))
           + jnp.abs(_cossim(sg(G), P_hat)))
    return pos + gamma * neg


def low_rank_loss(x: jnp.ndarray) -> jnp.ndarray:
    """Sum of all singular values but the largest (reference utils/loss.py:67-74)."""
    s = jnp.linalg.svd(x, compute_uv=False)
    return jnp.sum(s[1:])


# ------------------------------------------------- misc reference utilities

def sigmoid_rampup(current: float, rampup_length: float) -> float:
    """Exponential rampup for mean-teacher style schedules
    (reference utils/utils.py:21-28)."""
    import numpy as _np

    if rampup_length == 0:
        return 1.0
    current = float(_np.clip(current, 0.0, rampup_length))
    phase = 1.0 - current / rampup_length
    return float(_np.exp(-5.0 * phase * phase))


def l1_regularizer(params) -> jnp.ndarray:
    """Sum of |W| over a params pytree (reference regularize_weights,
    utils/utils.py:34-42; the module-targeted variants reduce to applying
    this to a subtree)."""
    import jax as _jax

    leaves = _jax.tree_util.tree_leaves(params)
    return sum(jnp.sum(jnp.abs(l)) for l in leaves)


def directional_consistency_loss(m: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """(|mean sign of row delta| - 1)^2 over non-tied entries
    (reference utils/loss.py:147-180)."""
    diff = m[0] - m[1]
    nz = (jnp.abs(diff) > eps).astype(diff.dtype)
    n_nz = jnp.sum(nz)
    signs = jnp.sign(diff) * nz
    x = jnp.where(n_nz > 0, jnp.sum(signs) / jnp.maximum(n_nz, 1.0), 0.0)
    return (jnp.abs(x) - 1.0) ** 2
