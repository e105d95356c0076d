"""Reference-named compatibility aliases (compat.py): each name exists and
routes to the real implementation."""

import jax
import jax.numpy as jnp
import numpy as np

from disentangled_multimodal_learning_tpu import compat
from disentangled_multimodal_learning_tpu.config import Config
from disentangled_multimodal_learning_tpu.train import losses as L


def test_survival_loss_wrappers_match_functions(rng):
    hz = jnp.asarray(jax.nn.sigmoid(jnp.asarray(
        rng.normal(size=(3, 4)).astype(np.float32))))
    S = jnp.cumprod(1.0 - hz, axis=1)
    Y = jnp.asarray([0, 2, 3])
    c = jnp.asarray([0, 1, 0])
    np.testing.assert_allclose(
        float(compat.NLLSurvLoss(alpha=0.15)(hz, S, Y, c)),
        float(L.nll_surv_loss(hz, S, Y, c, alpha=0.15)))
    np.testing.assert_allclose(
        float(compat.CrossEntropySurvLoss(alpha=0.4)(hz, S, Y, c)),
        float(L.ce_surv_loss(hz, S, Y, c, alpha=0.4)))
    t = jnp.asarray([100.0, 50.0, 400.0])
    pred = jnp.asarray(rng.normal(size=(3, 1)).astype(np.float32))
    np.testing.assert_allclose(
        float(compat.CoxSurvLoss()(t, 1 - c, pred)),
        float(L.cox_loss(t, 1 - c, pred)))


def test_define_loss_dispatch():
    assert isinstance(compat.define_loss("nll_surv"), compat.NLLSurvLoss)
    assert compat.define_loss("kl") is L.kl_loss
    import pytest

    with pytest.raises(NotImplementedError):
        compat.define_loss("nope")


def test_define_optimizer_and_scheduler():
    cfg = Config(mode="teacher", lr=1e-3, lr_policy="cosine", epochs=2,
                 checkpoints="#", debug=True).validate()
    tx = compat.define_optimizer(cfg, steps_per_epoch=10)
    assert hasattr(tx, "update")
    sched = compat.define_scheduler(cfg, steps_per_epoch=10)
    assert sched(0) > sched(19) >= 0.0


def test_trilinear_variants():
    assert compat.TrilinearFusion_A().variant == "A"
    assert compat.TrilinearFusion_B().variant == "B"


def test_regularizers_target_subtrees(rng):
    params = {
        "path_net": jnp.ones((2, 2)),
        "omic_net": 2 * jnp.ones((2, 2)),
        "fusion_layer": 3 * jnp.ones((2,)),
    }
    assert float(compat.regularize_path_weights(params)) == 4.0
    assert float(compat.regularize_MM_omic(params)) == 8.0
    assert float(compat.regularize_MM_weights(params)) == 6.0
    assert float(compat.regularize_weights(params)) == 18.0
