"""Aux subsystem tests: multiscale joint training, ROC/attention exports,
gene importance tooling, profiling utils."""

import os

import numpy as np
import pytest

from disentangled_multimodal_learning_tpu.config import Config
from disentangled_multimodal_learning_tpu.data import BagLoader, SyntheticBagDataset
from disentangled_multimodal_learning_tpu.models.factory import define_net
from disentangled_multimodal_learning_tpu.train.trainers import run_training


def tiny_cfg(mode, **kw):
    base = dict(mode=mode, task_type="diag2021", label_dim=4, fixdim=64,
                batch_size=2, epochs=1, eval_during_training=False,
                checkpoints="#", debug=True, seed=0)
    base.update(kw)
    return Config(**base).validate()


def tiny_loaders(cfg, n=4):
    train = SyntheticBagDataset(size=n, fixdim=cfg.fixdim,
                                label_dim=cfg.label_dim, seed=1, args=cfg)
    test = SyntheticBagDataset(size=n, fixdim=cfg.fixdim,
                               label_dim=cfg.label_dim, seed=2, args=cfg)
    return (BagLoader(train, cfg.batch_size, seed=0),
            BagLoader(test, cfg.batch_size, shuffle=False, drop_last=False))


def test_multiscale_joint_training():
    cfg = tiny_cfg("multiscale", gradient_modulate=False)
    model = define_net(cfg)
    state, metrics, _ = run_training(cfg, model, tiny_loaders(cfg),
                                     model_type="student")
    assert np.isfinite(metrics["auc"])


def test_save4roc_csv(tmp_path):
    cfg = tiny_cfg("student", save4roc=True, checkpoints=str(tmp_path))
    model = define_net(cfg)
    run_training(cfg, model, tiny_loaders(cfg))
    csvs = [f for f in os.listdir(tmp_path) if f.startswith("roc_")]
    assert len(csvs) == 3  # stu10 / stu20 / stus
    with open(os.path.join(tmp_path, csvs[0])) as f:
        header = f.readline().strip().split(",")
    assert header[0] == "label" and header[1] == "score_0"


def test_attention_map_export(tmp_path):
    import jax

    from disentangled_multimodal_learning_tpu.train.evaluation import Evaluator
    from disentangled_multimodal_learning_tpu.train.optim import make_optimizer
    from disentangled_multimodal_learning_tpu.train.trainers import init_model_state

    cfg = tiny_cfg("student")
    model = define_net(cfg)
    loaders = tiny_loaders(cfg)
    tx = make_optimizer(cfg, 1)
    state = init_model_state(model, cfg, next(iter(loaders[0])), tx)
    ev = Evaluator(model, cfg)
    path = str(tmp_path / "att.npz")
    ev.export_attention_maps(state, loaders[1], path)
    data = np.load(path, allow_pickle=True)
    assert data["attention"].shape == (4, cfg.fixdim)
    assert len(data["wsi_ids"]) == 4


def test_gene_importance_tools():
    import jax

    from disentangled_multimodal_learning_tpu.train.optim import make_optimizer
    from disentangled_multimodal_learning_tpu.train.trainers import init_model_state
    from disentangled_multimodal_learning_tpu.utils.importance import (
        ablation_feature_importance,
        make_omic_score_fn,
        permutation_feature_importance,
    )

    cfg = tiny_cfg("omic")
    model = define_net(cfg)
    loaders = tiny_loaders(cfg)
    tx = make_optimizer(cfg, 1)
    state = init_model_state(model, cfg, next(iter(loaders[0])), tx)
    batches = list(loaders[1])
    score_fn = make_omic_score_fn(model, state, cfg, batches)
    x_omic = np.concatenate([b.x_omic for b in batches])
    # only probe a few genes to keep the test fast
    imp_abl = ablation_feature_importance(score_fn, x_omic[:, :431])
    assert imp_abl.shape == (431,)
    assert np.isfinite(imp_abl).all()
    imp_perm = permutation_feature_importance(
        lambda x: score_fn(x), x_omic, n_trials=1)
    assert imp_perm.shape == (431,)


def test_step_timer_fence():
    import jax.numpy as jnp

    from disentangled_multimodal_learning_tpu.utils.profiling import StepTimer

    t = StepTimer()
    tree = {"a": jnp.ones((4, 4))}
    t.calibrate(tree)
    t.start()
    t.count(3)
    per_step = t.stop(tree)
    # roundtrip subtraction can make a ~zero window slightly negative
    assert per_step > -0.01


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax

    from disentangled_multimodal_learning_tpu.train.optim import make_optimizer
    from disentangled_multimodal_learning_tpu.train.trainers import init_model_state
    from disentangled_multimodal_learning_tpu.utils.checkpoint import (
        restore_state, save_checkpoint_orbax)

    cfg = tiny_cfg("path")
    model = define_net(cfg)
    loaders = tiny_loaders(cfg)
    from disentangled_multimodal_learning_tpu.train.optim import make_optimizer

    tx = make_optimizer(cfg, 1)
    state = init_model_state(model, cfg, next(iter(loaders[0])), tx)
    path = save_checkpoint_orbax(str(tmp_path), "ck", state)
    fresh = init_model_state(model, cfg, next(iter(loaders[0])), tx, seed=9)
    restored = restore_state(fresh, path)
    a = jax.tree_util.tree_leaves(restored.params)
    b = jax.tree_util.tree_leaves(state.params)
    assert all(np.allclose(x, y) for x, y in zip(a, b))


def test_multiscale_scales_val_reports_all_tags():
    import jax

    from disentangled_multimodal_learning_tpu.train.evaluation import Evaluator
    from disentangled_multimodal_learning_tpu.train.optim import make_optimizer
    from disentangled_multimodal_learning_tpu.train.trainers import init_model_state

    cfg = tiny_cfg("multiscale")
    model = define_net(cfg)
    loaders = tiny_loaders(cfg)
    tx = make_optimizer(cfg, 1)
    state = init_model_state(model, cfg, next(iter(loaders[0])), tx)
    ev = Evaluator(model, cfg)
    res = ev.distill_val(state, loaders[1], "scales")
    acc = res[0]
    assert set(acc) == {"acc_tea10", "acc_tea20", "acc_stu10", "acc_stu20",
                        "acc_stus"}
