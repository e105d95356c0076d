"""Teacher-output cache for distillation (train/distill_cache.py):
replayed boundary tensors are bit-identical to recomputation, and cached
training matches uncached training end-to-end."""

import jax
import numpy as np
import pytest

from disentangled_multimodal_learning_tpu.config import Config
from disentangled_multimodal_learning_tpu.data import (BagLoader,
                                                       SyntheticBagDataset)
from disentangled_multimodal_learning_tpu.models.factory import define_net
from disentangled_multimodal_learning_tpu.train.distill_cache import (
    BOUNDARY_KEYS, TeacherBoundaryCache, loader_dataset_size)
from disentangled_multimodal_learning_tpu.train.optim import make_optimizer
from disentangled_multimodal_learning_tpu.train.steps import (
    batch_to_arrays, make_teacher_boundary_fn)
from disentangled_multimodal_learning_tpu.train.trainers import (
    init_model_state, run_training)


def _cfg(**over):
    kw = dict(mode="distillation", task_type="diag2021", label_dim=4,
              fixdim=64, batch_size=4, epochs=2, eval_during_training=False,
              checkpoints="#", debug=True)
    kw.update(over)
    return Config(**kw).validate()


def _setup(cfg, n=8):
    ds = SyntheticBagDataset(size=n, fixdim=cfg.fixdim,
                             label_dim=cfg.label_dim, seed=0, args=cfg)
    loader = BagLoader(ds, cfg.batch_size, shuffle=True, seed=3)
    student, teacher = define_net(cfg)
    tx = make_optimizer(cfg, 1)
    sample = next(iter(loader))
    tstate = init_model_state(teacher, cfg, sample, tx, mode="teacher", seed=9)
    tvars = {"params": tstate.params, "batch_stats": tstate.batch_stats}
    return loader, student, teacher, tvars


def test_cache_replay_is_bit_identical():
    cfg = _cfg()
    loader, _, teacher, tvars = _setup(cfg)
    cache = TeacherBoundaryCache(make_teacher_boundary_fn(teacher), tvars,
                                 loader_dataset_size(loader))

    batches = list(loader)
    first = [dict(cache.boundary(batch_to_arrays(b), b.indices))
             for b in batches]
    assert cache.misses == len(batches) and cache.hits == 0

    again = [dict(cache.boundary(batch_to_arrays(b), b.indices))
             for b in batches]
    assert cache.hits == len(batches)
    for a, b in zip(first, again):
        for k in BOUNDARY_KEYS:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    # replay equals a fresh recompute bit-for-bit (teacher deterministic)
    fresh = jax.jit(make_teacher_boundary_fn(teacher))(
        tvars, batch_to_arrays(batches[0]))
    for k, v in zip(BOUNDARY_KEYS, fresh):
        np.testing.assert_array_equal(np.asarray(again[0][k]), np.asarray(v))


def test_cache_without_indices_recomputes():
    cfg = _cfg()
    loader, _, teacher, tvars = _setup(cfg)
    cache = TeacherBoundaryCache(make_teacher_boundary_fn(teacher), tvars,
                                 loader_dataset_size(loader))
    b = next(iter(loader))
    out1 = cache.boundary(batch_to_arrays(b), None)
    out2 = cache.boundary(batch_to_arrays(b), None)
    assert cache.misses == 2 and cache.hits == 0
    for k in BOUNDARY_KEYS:
        np.testing.assert_array_equal(np.asarray(out1[k]), np.asarray(out2[k]))


@pytest.mark.parametrize("scan_steps", [1, 2])
def test_cached_training_matches_uncached(scan_steps):
    """run_training with distill_teacher_cache on == off: identical rng
    schedule, same loader order -> same final params (the only difference
    is where the teacher forward's bits come from)."""
    finals = {}
    for cached in (False, True):
        cfg = _cfg(distill_teacher_cache=cached, scan_steps=scan_steps)
        loader, student, teacher, tvars = _setup(cfg)
        state, _, _ = run_training(cfg, student, (loader, None),
                                   teacher_model=teacher, teacher_vars=tvars)
        finals[cached] = state.params
    la = jax.tree_util.tree_leaves(finals[False])
    lb = jax.tree_util.tree_leaves(finals[True])
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
