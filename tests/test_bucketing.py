"""Bucketed variable-length bag support (data/bucketing.py).

The reference pads every bag offline to one fixdim; here variable-length
bags group into perfect-square buckets with one compiled executable each.
"""

import numpy as np
import pytest

from disentangled_multimodal_learning_tpu.config import Config
from disentangled_multimodal_learning_tpu.data import (BucketedBagLoader,
                                                       SyntheticBagDataset,
                                                       validate_buckets)


def make_ds(size=13, fixdim=64, min_len=5, seed=0):
    return SyntheticBagDataset(size=size, fixdim=fixdim, label_dim=4,
                               seed=seed, min_len=min_len)


def test_validate_buckets_rejects_non_square():
    with pytest.raises(ValueError):
        validate_buckets([300])
    assert validate_buckets(["900", 400]) == (400, 900)


def test_batches_have_bucket_shapes_and_cover_everything():
    ds = make_ds()
    loader = BucketedBagLoader(ds, batch_size=4, buckets=(16, 36, 64),
                               shuffle=True, drop_last=False, seed=1)
    seen = []
    n_batches = 0
    for batch in loader:
        n_batches += 1
        N = batch.x_path10.shape[1]
        assert N in (16, 36, 64)
        keep = batch.x_path10.shape[0] - batch.pad
        for wsi, x in zip(batch.wsi_id[:keep], batch.x_path10[:keep]):
            idx = int(str(wsi).split("-")[1])
            # bucket is the smallest one holding the true length
            assert N == loader.bucket_of(ds.bag_len(idx))
            # zero-padding beyond the true bag length, data before it
            L = min(ds.bag_len(idx), N)
            if L < N:
                assert np.all(x[L:] == 0.0)
            assert np.any(x[:L] != 0.0)
            seen.append(idx)
    assert n_batches == len(loader)
    assert sorted(seen) == list(range(len(ds)))  # drop_last=False: no drops


def test_long_bags_truncate_to_largest_bucket():
    ds = make_ds(fixdim=100, min_len=80)  # every bag longer than max bucket
    loader = BucketedBagLoader(ds, batch_size=2, buckets=(16, 64),
                               shuffle=False, drop_last=False)
    for batch in loader:
        assert batch.x_path10.shape[1] == 64


def test_small_bucket_promoted_not_dropped_with_drop_last():
    """ADVICE r2 (medium): a bucket holding fewer than batch_size samples
    must not be permanently excluded under drop_last=True — its samples are
    promoted to the next-larger bucket (padding further is always valid)."""
    ds = make_ds(size=9, fixdim=64, min_len=5, seed=3)
    bs = 4
    loader = BucketedBagLoader(ds, batch_size=bs, buckets=(16, 36, 64),
                               shuffle=True, drop_last=True, seed=1)
    # engineer a sparse bucket: find a bucket with 0 < population < bs
    pops = {b: int((loader._assign == b).sum()) for b in loader.buckets}
    if not any(0 < p < bs for p in pops.values()):
        pytest.skip("seed produced no sparse bucket")
    # over many epochs, every sample in a sparse (non-largest) bucket must
    # appear at least once
    seen = set()
    for epoch in range(6):
        loader.set_epoch(epoch)
        for batch in loader:
            keep = batch.x_path10.shape[0] - batch.pad
            for wsi in batch.wsi_id[:keep]:
                seen.add(int(str(wsi).split("-")[1]))
    sparse = [b for b, p in pops.items() if 0 < p < bs]
    for b in sparse:
        for i in np.nonzero(loader._assign == b)[0]:
            assert int(i) in seen, f"sample {i} of sparse bucket {b} dropped"
    assert len(loader) == sum(1 for _ in loader)


def test_all_samples_below_batch_size_pad_at_largest_bucket():
    """Fewer total samples than batch_size: one padded batch, nothing lost."""
    ds = make_ds(size=3, fixdim=64, min_len=5, seed=0)
    loader = BucketedBagLoader(ds, batch_size=4, buckets=(16, 64),
                               shuffle=False, drop_last=True)
    batches = list(loader)
    assert len(batches) == len(loader) == 1
    assert batches[0].pad == 1
    assert batches[0].x_path10.shape == (4, 64, 1024)


def test_epoch_reshuffle_changes_batch_order():
    ds = make_ds(size=24)
    loader = BucketedBagLoader(ds, batch_size=4, buckets=(16, 36, 64),
                               shuffle=True, drop_last=False, seed=3)
    loader.set_epoch(0)
    order0 = [tuple(map(str, b.wsi_id)) for b in loader]
    loader.set_epoch(1)
    order1 = [tuple(map(str, b.wsi_id)) for b in loader]
    # same sample set both epochs (pad duplicates aside), different order
    flat = lambda o: {w for batch in o for w in batch}
    assert flat(order0) == flat(order1)
    assert order0 != order1


def test_train_step_compiles_per_bucket_and_learns_shapes():
    import jax

    from disentangled_multimodal_learning_tpu.models.factory import define_net
    from disentangled_multimodal_learning_tpu.train.optim import make_optimizer
    from disentangled_multimodal_learning_tpu.train.steps import (
        batch_to_arrays, make_train_step)
    from disentangled_multimodal_learning_tpu.train.trainers import (
        init_model_state)

    cfg = Config(mode="teacher", task_type="diag2021", label_dim=4, fixdim=64,
                 batch_size=2, buckets="16,64", checkpoints="#",
                 debug=True).validate()
    ds = make_ds(size=8, fixdim=64, min_len=5)
    cfg.input_size_omic = ds.input_size_omic
    cfg.input_size_omic_tumor = ds.input_size_omic_tumor
    cfg.input_size_omic_immune = ds.input_size_omic_immune
    loader = BucketedBagLoader(ds, batch_size=2, buckets=(16, 64),
                               shuffle=False, drop_last=False)
    batches = list(loader)
    shapes = {b.x_path10.shape[1] for b in batches}
    assert len(shapes) >= 2  # really exercises two executables

    model = define_net(cfg)
    tx = make_optimizer(cfg, 1)
    state = init_model_state(model, cfg, batches[0], tx)
    step = jax.jit(make_train_step(model, cfg, tx))
    for batch in batches:
        state, metrics = step(state, batch_to_arrays(batch),
                              jax.random.PRNGKey(0), None)
        assert np.isfinite(float(metrics["loss"]))


def test_main_make_loaders_uses_buckets():
    import main as main_mod

    cfg = Config(mode="teacher", fixdim=64, batch_size=2, buckets="16,64",
                 checkpoints="#", debug=True).validate()
    ds = make_ds(size=6, fixdim=64, min_len=5)
    train_loader, test_loader = main_mod._make_loaders(cfg, ds, ds)
    assert isinstance(test_loader, BucketedBagLoader)
    first = next(iter(train_loader))
    assert first.x_path10.shape[1] in (16, 64)


def test_bucketed_eval_and_attention_export(tmp_path):
    """Evaluator works over a bucketed test loader: metrics computed on the
    unpadded sample set and attention-map export NaN-pads to the widest
    bucket."""
    import jax

    from disentangled_multimodal_learning_tpu.models.factory import define_net
    from disentangled_multimodal_learning_tpu.train.evaluation import Evaluator
    from disentangled_multimodal_learning_tpu.train.optim import make_optimizer
    from disentangled_multimodal_learning_tpu.train.trainers import (
        init_model_state)

    cfg = Config(mode="teacher", task_type="diag2021", label_dim=4, fixdim=64,
                 batch_size=2, buckets="16,64", checkpoints="#",
                 debug=True).validate()
    ds = make_ds(size=12, fixdim=64, min_len=5)
    cfg.input_size_omic = ds.input_size_omic
    cfg.input_size_omic_tumor = ds.input_size_omic_tumor
    cfg.input_size_omic_immune = ds.input_size_omic_immune
    loader = BucketedBagLoader(ds, batch_size=2, buckets=(16, 64),
                               shuffle=False, drop_last=False)
    assert {b.x_path10.shape[1] for b in loader} == {16, 64}
    model = define_net(cfg)
    state = init_model_state(model, cfg, next(iter(loader)),
                             make_optimizer(cfg, 1))
    ev = Evaluator(model, cfg)
    result = ev(state, loader, "teacher")
    acc = result[0]
    assert 0.0 <= acc["acc_teas"] <= 1.0

    path = str(tmp_path / "att.npz")
    ev.export_attention_maps(state, loader, path)
    data = np.load(path)
    assert data["attention"].shape[0] == len(ds)  # pad rows stripped
    assert data["attention"].shape[1] == 64       # widest bucket
    # NaN markers only past the shorter buckets' ends
    assert np.isnan(data["attention"]).any()
    assert not np.isnan(data["attention"][:, :16]).any()
    # r3 parity schema holds under bucketed loaders too: both compartment
    # maps + scores + labels with consistent row counts
    att_keys = [k for k in data.files if k.startswith("att_")]
    assert {"att_att1_tea10", "att_att2_tea10"} <= set(att_keys)
    for k in att_keys:
        assert data[k].shape == (len(ds), 64)
    assert data["scores"].shape == (len(ds), cfg.label_dim)
    assert data["labels"].shape == (len(ds),)


def test_scan_steps_with_buckets():
    """scan_steps buffers are keyed by bag shape: a bucketed loader's
    interleaved bucket batches scan within their own shape and every batch
    still steps."""
    from disentangled_multimodal_learning_tpu.models.factory import define_net
    from disentangled_multimodal_learning_tpu.train.trainers import run_training

    cfg = Config(mode="teacher", task_type="diag2021", label_dim=4, fixdim=64,
                 batch_size=2, epochs=1, eval_during_training=False,
                 checkpoints="#", debug=True, scan_steps=2,
                 buckets="16,64").validate()
    ds = make_ds(size=12, fixdim=64, min_len=5)
    cfg.input_size_omic = ds.input_size_omic
    cfg.input_size_omic_tumor = ds.input_size_omic_tumor
    cfg.input_size_omic_immune = ds.input_size_omic_immune
    loader = BucketedBagLoader(ds, batch_size=2, buckets=(16, 64),
                               shuffle=True, drop_last=False, seed=0)
    assert len({b.x_path10.shape[1] for b in loader}) == 2
    model = define_net(cfg)
    state, metrics, _ = run_training(cfg, model, (loader, None))
    assert int(state.step) == len(loader)  # every batch became an update
