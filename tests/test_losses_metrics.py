"""Golden tests: losses vs torch CPU transcriptions; metrics vs sklearn/hand."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from disentangled_multimodal_learning_tpu.train import losses as L
from disentangled_multimodal_learning_tpu.train import metrics as M

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


# ------------------------------------------------------------------ CE / surv
def test_weighted_ce_matches_torch(rng):
    logits = rng.normal(size=(6, 4)).astype(np.float32)
    y = rng.integers(0, 4, size=6)
    w = np.array([1.0, 4.15, 2.93, 2.43], dtype=np.float32)
    want = torch.nn.CrossEntropyLoss(weight=torch.from_numpy(w))(
        torch.from_numpy(logits), torch.from_numpy(y)).item()
    got = float(L.weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(y), w))
    assert abs(got - want) < 1e-5
    # unweighted
    want0 = F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(y)).item()
    got0 = float(L.weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(y)))
    assert abs(got0 - want0) < 1e-5


def _torch_nll_surv(hazards, S, Y, c, alpha, eps=1e-7):
    # independent transcription of discrete-time survival NLL with censoring
    Y = Y.view(-1, 1)
    c = c.view(-1, 1).float()
    S_padded = torch.cat([torch.ones_like(c), S], 1)
    unc = -(1 - c) * (torch.log(torch.gather(S_padded, 1, Y).clamp(min=eps))
                      + torch.log(torch.gather(hazards, 1, Y).clamp(min=eps)))
    cen = -c * torch.log(torch.gather(S_padded, 1, Y + 1).clamp(min=eps))
    neg = cen + unc
    return ((1 - alpha) * neg + alpha * unc).mean().item()


@pytest.mark.parametrize("alpha", [0.0, 0.15, 0.4])
def test_nll_surv_matches_torch(rng, alpha):
    B, K = 5, 4
    logits = rng.normal(size=(B, K)).astype(np.float32)
    h = 1 / (1 + np.exp(-logits))
    S = np.cumprod(1 - h, axis=1)
    Y = rng.integers(0, K, size=B)
    c = rng.integers(0, 2, size=B)
    want = _torch_nll_surv(torch.from_numpy(h), torch.from_numpy(S),
                           torch.from_numpy(Y), torch.from_numpy(c), alpha)
    got = float(L.nll_surv_loss(jnp.asarray(h), jnp.asarray(S), jnp.asarray(Y),
                                jnp.asarray(c), alpha=alpha))
    assert abs(got - want) < 1e-5


def test_cox_loss_matches_torch(rng):
    B = 7
    survtime = rng.integers(10, 100, size=B).astype(np.float32)
    censor = rng.integers(0, 2, size=B).astype(np.float32)
    hazard = rng.normal(size=(B, 1)).astype(np.float32)
    # torch transcription (reference utils/utils.py:293-308)
    R = torch.tensor([[float(survtime[j] >= survtime[i]) for j in range(B)]
                      for i in range(B)])
    theta = torch.from_numpy(hazard).reshape(-1)
    want = (-torch.mean((theta - torch.log(torch.sum(torch.exp(theta) * R, dim=1)))
                        * torch.from_numpy(censor))).item()
    got = float(L.cox_loss(jnp.asarray(survtime), jnp.asarray(censor),
                           jnp.asarray(hazard)))
    assert abs(got - want) < 1e-4


# -------------------------------------------------------------- distillation
def test_distillation_loss_matches_torch(rng):
    s = rng.normal(size=(4, 4)).astype(np.float32)
    t = rng.normal(size=(4, 4)).astype(np.float32)
    T = 2.0
    soft_t = F.softmax(torch.from_numpy(t) / T, dim=1)
    soft_s = F.log_softmax(torch.from_numpy(s) / T, dim=1)
    want = (F.kl_div(soft_s, soft_t, reduction="batchmean") * T ** 2).item()
    got = float(L.distillation_loss(jnp.asarray(s), jnp.asarray(t), T))
    assert abs(got - want) < 1e-5


# ------------------------------------------------------- batch similarity fam
def test_path_batch_loss_matches_torch(rng):
    N = 4
    a10 = rng.normal(size=(N, 8, 6, 5)).astype(np.float32)
    a20 = rng.normal(size=(N, 8, 6, 5)).astype(np.float32)

    def torch_version(x, y):
        x = torch.from_numpy(x).view(N, 8, -1).transpose(0, 1)
        y = torch.from_numpy(y).view(N, 8, -1).transpose(0, 1)

        def mean_sim(t):
            sims = []
            for item in t:
                s = item.mm(item.t())
                s = s / torch.norm(s, 2, 1).view(-1, 1)
                sims.append(s)
            return torch.mean(torch.stack(sims), dim=0)

        return torch.sum((mean_sim(x) - mean_sim(y)) ** 2 / N).item()

    want = torch_version(a10, a20)
    got = float(L.path_batch_loss(jnp.asarray(a10), jnp.asarray(a20)))
    assert abs(got - want) < 1e-4


def test_omic_domain_scale_loss_matches_torch(rng):
    N = 4
    atts = [rng.normal(size=(N, 8, 6, 5)).astype(np.float32) for _ in range(4)]

    def torch_version(a1_10, a1_20, a2_10, a2_20):
        def sim(a, b):
            a = torch.from_numpy(a).view(N, -1)
            b = torch.from_numpy(b).view(N, -1)
            s = a.mm(b.t())
            s = s / torch.norm(s, 2, 1).view(-1, 1)
            return 10000 * torch.var(s.diagonal())

        return (sim(a1_10, a1_20) + sim(a2_10, a2_20)).item()

    want = torch_version(*atts)
    got = float(L.omic_domain_scale_loss(*[jnp.asarray(a) for a in atts]))
    assert abs(got - want) / max(abs(want), 1) < 1e-4


def test_batch_loss_vgrid_matches_torch(rng):
    N, G = 4, 8
    omic = rng.normal(size=(N, 16)).astype(np.float32)
    vgrid = rng.normal(size=(N * G, 2, 3, 3)).astype(np.float32)

    def torch_version(o, v):
        o = torch.from_numpy(o).view(N, -1)
        v = torch.from_numpy(v).view(8, N, -1)
        s = o.mm(o.t())
        s = s / torch.norm(s, 2, 1).view(-1, 1)
        sims = []
        for item in v:
            vs = item.mm(item.t())
            vs = vs / torch.norm(vs, 2, 1).view(-1, 1)
            sims.append(vs)
        mean_vs = torch.mean(torch.stack(sims), dim=0)
        return torch.sum((s - mean_vs) ** 2 / N).item()

    want = torch_version(omic, vgrid)
    got = float(L.batch_loss_vgrid(jnp.asarray(omic), jnp.asarray(vgrid)))
    assert abs(got - want) < 1e-4


def test_orthogonal_loss_matches_torch(rng):
    B, D = 4, 8
    P, Ph, G, Gh = [rng.normal(size=(B, D)).astype(np.float32) for _ in range(4)]
    tP, tPh, tG, tGh = map(torch.from_numpy, (P, Ph, G, Gh))
    pos = (1 - torch.abs(F.cosine_similarity(tP.detach(), tPh, dim=1))) + (
        1 - torch.abs(F.cosine_similarity(tG.detach(), tGh, dim=1)))
    neg = (torch.abs(F.cosine_similarity(tP, tG, dim=1))
           + torch.abs(F.cosine_similarity(tP.detach(), tGh, dim=1))
           + torch.abs(F.cosine_similarity(tG.detach(), tPh, dim=1)))
    want = (pos + 0.5 * neg).numpy()
    got = np.asarray(L.orthogonal_loss(*map(jnp.asarray, (P, Ph, G, Gh))))
    np.testing.assert_allclose(got, want, atol=1e-5)


# -------------------------------------------------------------------- metrics
def test_compute_avg_metrics_against_sklearn(rng):
    sk = pytest.importorskip("sklearn.metrics")
    y = rng.integers(0, 4, size=50)
    logits = rng.normal(size=(50, 4))
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    acc, f1, auc, bac, sens, spec, prec = M.compute_avg_metrics(y, probs)
    pred = probs.argmax(-1)
    assert abs(acc - sk.accuracy_score(y, pred)) < 1e-9
    assert abs(f1 - sk.f1_score(y, pred, average="macro")) < 1e-9
    assert abs(auc - sk.roc_auc_score(y, probs, multi_class="ovr")) < 1e-9
    assert abs(bac - sk.balanced_accuracy_score(y, pred)) < 1e-9
    assert abs(sens - sk.recall_score(y, pred, average="macro")) < 1e-9


def test_numpy_auc_matches_sklearn(rng):
    sk = pytest.importorskip("sklearn.metrics")
    y = rng.integers(0, 3, size=60)
    logits = rng.normal(size=(60, 3))
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    got = M.auc_ovr_macro(y, probs)
    want = sk.roc_auc_score(y, probs, multi_class="ovr")
    assert abs(got - want) < 1e-9


def test_specificity_binary_hand_case():
    # TN=2, FP=1 for class 1; confusion known by hand
    y_true = np.array([0, 0, 0, 1, 1])
    y_pred = np.array([0, 0, 1, 1, 0])
    # class0: TN = (true1 pred1)=1, FP = pred0 & true1 =1 -> spec0 = 1/2
    # class1: TN = true0 pred0 = 2, FP = pred1 & true0 = 1 -> spec1 = 2/3
    want = 0.5 * (1 / 2 + 2 / 3)
    assert abs(M.specificity_macro(y_true, y_pred, 2) - want) < 1e-9


def test_cindex_hand_case():
    # 3 samples: times 1 < 2 < 3, all events; perfect risk ordering
    t = np.array([1.0, 2.0, 3.0])
    censor = np.array([0, 0, 0])
    risk = np.array([3.0, 2.0, 1.0])
    assert M.cindex(risk, censor, t) == 1.0
    # anti-ordered
    assert M.cindex(-risk, censor, t) == 0.0
    # one censored sample: pairs from censored i are excluded
    censor2 = np.array([1, 0, 0])
    assert M.cindex(risk, censor2, t) == 1.0
    # tied risks -> 0.5 credit
    risk3 = np.array([1.0, 1.0, 1.0])
    assert M.cindex(risk3, censor, t) == 0.5


def test_cindex_matches_lifelines_formula(rng):
    """Cross-check against an independent O(n^2) implementation."""
    n = 25
    t = rng.integers(1, 50, size=n).astype(float)
    c = rng.integers(0, 2, size=n)
    r = rng.normal(size=n)
    ev = (1 - c).astype(bool)
    conc = ties = comp = 0
    for i in range(n):
        for j in range(n):
            if i == j or not ev[i]:
                continue
            if t[j] > t[i] or (t[j] == t[i] and not ev[j]):
                comp += 1
                if abs(r[i] - r[j]) <= 1e-8:
                    ties += 1
                elif r[i] > r[j]:
                    conc += 1
    want = (conc + 0.5 * ties) / comp
    assert abs(M.cindex(r, c, t) - want) < 1e-12


def test_micro_metrics_and_confusion(rng):
    sk = pytest.importorskip("sklearn.metrics")
    y = rng.integers(0, 3, size=40)
    logits = rng.normal(size=(40, 3))
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    acc, f1, auc, bac, sens, spec, prec = M.compute_avg_metrics_micro(y, probs)
    pred = probs.argmax(-1)
    assert abs(acc - sk.accuracy_score(y, pred)) < 1e-12
    assert abs(f1 - sk.f1_score(y, pred, average="micro")) < 1e-12
    assert abs(prec - sk.precision_score(y, pred, average="micro")) < 1e-12
    # micro auc via raveled one-hot
    oh = M.make_one_hot(y, 3).ravel()
    assert abs(auc - sk.roc_auc_score(oh, probs.ravel())) < 1e-9
    cm = M.compute_confusion_matrix(y, probs, labels=[0, 1, 2])
    np.testing.assert_array_equal(cm, sk.confusion_matrix(y, pred, labels=[0, 1, 2]))


def test_sigmoid_rampup_and_l1():
    assert L.sigmoid_rampup(0, 10) == pytest.approx(np.exp(-5.0))
    assert L.sigmoid_rampup(10, 10) == 1.0
    assert L.sigmoid_rampup(5, 0) == 1.0
    params = {"a": jnp.asarray([-1.0, 2.0]), "b": {"c": jnp.asarray([[3.0]])}}
    assert float(L.l1_regularizer(params)) == 6.0


def test_directional_consistency_loss(rng):
    m = jnp.asarray(np.array([[1.0, 2.0, 3.0], [0.0, 1.0, 2.0]], np.float32))
    # all diffs positive -> mean sign 1 -> loss 0
    assert float(L.directional_consistency_loss(m)) == pytest.approx(0.0)
    m2 = jnp.asarray(np.array([[1.0, 0.0], [0.0, 1.0]], np.float32))
    # signs +1, -1 -> mean 0 -> loss 1
    assert float(L.directional_consistency_loss(m2)) == pytest.approx(1.0)


def test_gene_guided_cluster(rng):
    from disentangled_multimodal_learning_tpu.ops.cluster import gene_guided_cluster

    x = jnp.asarray(rng.normal(size=(1, 6, 4)).astype(np.float32))
    near = x + 0.01
    far = x + 100.0
    idx = np.asarray(gene_guided_cluster(x, near, far))
    np.testing.assert_array_equal(idx, np.zeros((1, 6)))
    idx2 = np.asarray(gene_guided_cluster(x, far, near))
    np.testing.assert_array_equal(idx2, np.ones((1, 6)))


def test_kl_cosine_lowrank_ce_surv_match_torch(rng):
    y = rng.normal(size=(4, 6)).astype(np.float32)
    yh = rng.normal(size=(4, 6)).astype(np.float32)
    ty, tyh = torch.from_numpy(y), torch.from_numpy(yh)
    # KLLoss (reference cmta_utils.py:1199-1201)
    want = F.kl_div(tyh.softmax(dim=-1).log(), ty.softmax(dim=-1),
                    reduction="sum").item()
    got = float(L.kl_loss(jnp.asarray(y), jnp.asarray(yh)))
    assert abs(got - want) < 1e-4
    # CosineLoss
    want_c = (1 - F.cosine_similarity(ty, tyh, dim=1)).numpy()
    got_c = np.asarray(L.cosine_loss(jnp.asarray(y), jnp.asarray(yh)))
    np.testing.assert_allclose(got_c, want_c, atol=1e-5)
    # low-rank loss: sum of singular values except the largest
    m = rng.normal(size=(5, 3)).astype(np.float32)
    want_l = torch.svd(torch.from_numpy(m))[1][1:].sum().item()
    got_l = float(L.low_rank_loss(jnp.asarray(m)))
    assert abs(got_l - want_l) < 1e-4
    # ce_surv (reference cmta_utils.py:1140-1156)
    B, K = 5, 4
    h = 1 / (1 + np.exp(-rng.normal(size=(B, K)).astype(np.float32)))
    S = np.cumprod(1 - h, 1)
    Y = rng.integers(0, K, size=B)
    c = rng.integers(0, 2, size=B)
    th, tS = torch.from_numpy(h), torch.from_numpy(S)
    tY = torch.from_numpy(Y).view(-1, 1)
    tc = torch.from_numpy(c).view(-1, 1).float()
    Sp = torch.cat([torch.ones_like(tc), tS], 1)
    eps = 1e-7
    reg = -(1 - tc) * (torch.log(torch.gather(Sp, 1, tY) + eps)
                       + torch.log(torch.gather(th, 1, tY).clamp(min=eps)))
    sY = torch.gather(tS, 1, tY)
    ce_l = -tc * torch.log(sY.clamp(min=eps)) - (1 - tc) * torch.log(
        (1 - sY).clamp(min=eps))
    alpha = 0.4
    want_s = ((1 - alpha) * ce_l + alpha * reg).mean().item()
    got_s = float(L.ce_surv_loss(jnp.asarray(h), jnp.asarray(S), jnp.asarray(Y),
                                 jnp.asarray(c), alpha=alpha))
    assert abs(got_s - want_s) < 1e-5


def test_external_eval_unweights_only_diag2021():
    """Reference train_test.py:24-29: external_eval strips the class weights
    from the diag2021 CE only; grade/subtype stay weighted."""
    from disentangled_multimodal_learning_tpu.config import Config
    from disentangled_multimodal_learning_tpu.train.steps import task_class_weights

    ext = Config(task_type="diag2021", label_dim=4, external_eval=True).validate()
    assert task_class_weights(ext, "diag2021") is None
    grade_ext = Config(task_type="grade", label_dim=3, external_eval=True).validate()
    assert task_class_weights(grade_ext, "grade") == (1.47, 1.51, 1.0)
    sub_ext = Config(task_type="subtype", label_dim=3, external_eval=True).validate()
    assert task_class_weights(sub_ext, "subtype") == (1.0, 1.72, 2.43)
    internal = Config(task_type="diag2021", label_dim=4).validate()
    assert task_class_weights(internal, "diag2021") == (1.0, 4.15, 2.93, 2.43)
    assert task_class_weights(Config(task_type="survival", label_dim=4).validate(),
                              "survival") is None


def test_nll_surv_chain_gradient_matches_torch(rng):
    """Backward parity (VERDICT r1 #10): d(nll_surv)/d(logits) through the
    full survival chain logits -> sigmoid -> hazards -> S = cumprod(1-h)
    -> NLL (reference models/model.py:854-864 + utils/utils.py:245-261)
    matches torch autograd."""
    B, K = 6, 4
    logits = rng.normal(size=(B, K)).astype(np.float32)
    Y = rng.integers(0, K, size=B)
    c = rng.integers(0, 2, size=B)

    lg_t = torch.tensor(logits, requires_grad=True)
    h_t = torch.sigmoid(lg_t)
    S_t = torch.cumprod(1 - h_t, dim=1)
    Yt = torch.from_numpy(Y).view(-1, 1)
    ct = torch.from_numpy(c).view(-1, 1).float()
    S_pad = torch.cat([torch.ones_like(ct), S_t], 1)
    eps = 1e-7
    unc = -(1 - ct) * (torch.log(torch.gather(S_pad, 1, Yt).clamp(min=eps))
                       + torch.log(torch.gather(h_t, 1, Yt).clamp(min=eps)))
    cen = -ct * torch.log(torch.gather(S_pad, 1, Yt + 1).clamp(min=eps))
    loss_t = ((1 - 0.15) * (cen + unc) + 0.15 * unc).mean()
    loss_t.backward()

    def chain(lg):
        h = jax.nn.sigmoid(lg)
        S = jnp.cumprod(1.0 - h, axis=1)
        return L.nll_surv_loss(h, S, jnp.asarray(Y), jnp.asarray(c), alpha=0.15)

    g = jax.grad(chain)(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(g), lg_t.grad.numpy(),
                               atol=1e-6, rtol=1e-4)
