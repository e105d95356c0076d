"""init_type semantics: the reference's init_net/init_weights
(reference utils/utils.py:180-242) applied as a pure transform over the
flax variables tree (utils/weight_init.py), wired through
init_model_state and validated by Config.validate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disentangled_multimodal_learning_tpu.config import Config
from disentangled_multimodal_learning_tpu.data import SyntheticBagDataset
from disentangled_multimodal_learning_tpu.models.factory import define_net
from disentangled_multimodal_learning_tpu.train.optim import make_optimizer
from disentangled_multimodal_learning_tpu.train.trainers import init_model_state
from disentangled_multimodal_learning_tpu.utils.weight_init import (
    VALID_INIT_TYPES, apply_init_type)

N_TOKENS = 64
BATCH = 2


def _state(init_type):
    # pathomic + pofusion exercises Dense kernels AND BatchNorm (inside
    # BilinearFusion's encoders); LayerNorm is covered separately below
    cfg = Config(mode="pathomic", task_type="diag2021", label_dim=4,
                 fixdim=N_TOKENS, batch_size=BATCH, fusion_type="pofusion",
                 init_type=init_type).validate()
    ds = SyntheticBagDataset(size=BATCH, fixdim=N_TOKENS, label_dim=4,
                             seed=0, args=cfg)
    batch = ds.batch(list(range(BATCH)))
    model = define_net(cfg)
    return init_model_state(model, cfg, batch, make_optimizer(cfg, 10)), cfg


def _flat(params):
    return {tuple(getattr(k, "key", k) for k in path): leaf
            for path, leaf in
            jax.tree_util.tree_flatten_with_path(params)[0]}


def test_validate_rejects_unknown_init_type():
    with pytest.raises(NotImplementedError, match="not implemented"):
        Config(mode="omic", task_type="diag2021", label_dim=4,
               fixdim=N_TOKENS, batch_size=BATCH,
               init_type="bogus").validate()
    assert set(("max", "none", "normal", "xavier", "kaiming",
                "orthogonal")) == set(VALID_INIT_TYPES)


def test_max_and_none_are_noops():
    s_max, _ = _state("max")
    s_none, _ = _state("none")
    for a, b in zip(jax.tree_util.tree_leaves(s_max.params),
                    jax.tree_util.tree_leaves(s_none.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_normal_reinit_stats_and_bias_zero():
    state, _ = _state("normal")
    default, _ = _state("max")
    flat, flat0 = _flat(state.params), _flat(default.params)
    checked_kernel = checked_bias = False
    for path, leaf in flat.items():
        if path[-1] == "kernel" and leaf.ndim >= 2 and leaf.size >= 512:
            # w ~ N(0, 0.02): std close to init_gain, differs from default
            assert abs(float(jnp.std(leaf)) - 0.02) < 0.006, path
            assert not np.array_equal(np.asarray(leaf),
                                      np.asarray(flat0[path])), path
            checked_kernel = True
        if path[-1] == "bias" and path[:-1] + ("kernel",) in flat:
            np.testing.assert_array_equal(np.asarray(leaf), 0.0)
            checked_bias = True
    assert checked_kernel and checked_bias


def test_xavier_kaiming_orthogonal_semantics():
    for kind in ("xavier", "kaiming", "orthogonal"):
        state, _ = _state(kind)
        flat = _flat(state.params)
        big = {p: l for p, l in flat.items()
               if p[-1] == "kernel" and l.ndim == 2 and l.size >= 4096}
        assert big
        for path, w in big.items():
            fi, fo = w.shape
            if kind == "xavier":
                want = 0.02 * (2.0 / (fi + fo)) ** 0.5
            elif kind == "kaiming":
                want = (2.0 / fi) ** 0.5
            else:  # orthogonal(gain): semi-orthogonal, columns norm == gain
                wtw = np.asarray(w.T @ w) if fi >= fo else np.asarray(w @ w.T)
                np.testing.assert_allclose(
                    wtw, 0.02 ** 2 * np.eye(wtw.shape[0]), atol=1e-5)
                continue
            got = float(jnp.std(w))
            assert abs(got - want) / want < 0.25, (path, got, want)


def test_batchnorm_treatment():
    state, _ = _state("xavier")
    flat = _flat(state.params)
    bn = [p for p in flat if any("_bn" in str(n) for n in p)
          and p[-1] == "scale"]
    assert bn
    for p in bn:  # BN weight ~ normal(1.0, gain): perturbed around 1
        leaf = np.asarray(flat[p])
        assert not np.allclose(leaf, 1.0)
        assert np.all(np.abs(leaf - 1.0) < 0.15)
    for p in bn:  # BN bias -> 0
        np.testing.assert_array_equal(
            np.asarray(flat[p[:-1] + ("bias",)]), 0.0)


def test_layernorm_untouched():
    # deformpathomic has LayerNorms (named 'norm'); the torch classname
    # filter (reference utils/utils.py:192) misses LayerNorm, so ours must too
    cfg = Config(mode="deformpathomic", task_type="diag2021", label_dim=4,
                 fixdim=N_TOKENS, batch_size=BATCH,
                 init_type="xavier").validate()
    ds = SyntheticBagDataset(size=BATCH, fixdim=N_TOKENS, label_dim=4,
                             seed=0, args=cfg)
    batch = ds.batch(list(range(BATCH)))
    state = init_model_state(define_net(cfg), cfg, batch,
                             make_optimizer(cfg, 10))
    flat = _flat(state.params)
    ln = [p for p in flat if str(p[-2]).endswith("norm")
          and p[-1] == "scale"]
    assert ln
    for p in ln:
        np.testing.assert_array_equal(np.asarray(flat[p]), 1.0)


def test_apply_init_type_passthrough_collections():
    state, cfg = _state("max")
    variables = {"params": state.params,
                 "batch_stats": {"dummy_bn": {"mean": jnp.zeros(3),
                                              "var": jnp.ones(3)}}}
    out = apply_init_type(variables, "normal", 0.02, seed=0)
    np.testing.assert_array_equal(
        np.asarray(out["batch_stats"]["dummy_bn"]["var"]), 1.0)


def test_test_entry_points_require_state():
    from disentangled_multimodal_learning_tpu.train.trainers import (
        testTeachersModel)

    cfg = Config(mode="teacher", task_type="diag2021", label_dim=4,
                 fixdim=N_TOKENS, batch_size=BATCH).validate()
    with pytest.raises(ValueError, match="checkpoint"):
        testTeachersModel(None, None, None, cfg)
