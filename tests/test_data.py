import numpy as np
import pytest

from disentangled_multimodal_learning_tpu.config import Config, yaml_config_hook
from disentangled_multimodal_learning_tpu.data import (
    BagLoader,
    ConcatDataset,
    LabelCol,
    SyntheticBagDataset,
    derive_diag2021,
    kfold_patient_split,
)


def test_config_defaults_validate():
    cfg = Config().validate()
    assert cfg.fixdim == 2500
    assert cfg.label_column == 5
    assert cfg.class_weights == (1.0, 4.15, 2.93, 2.43)


def test_config_task_label_dims():
    assert Config(task_type="grade", label_dim=3).validate().label_dim == 3
    # mismatched label_dim is corrected
    assert Config(task_type="grade", label_dim=4).validate().label_dim == 3
    with pytest.raises(ValueError):
        Config(task_type="nope").validate()
    with pytest.raises(ValueError):
        Config(fixdim=2501).validate()


def test_yaml_config_roundtrip(tmp_path):
    inc = tmp_path / "sub"
    inc.mkdir()
    (inc / "extra.yaml").write_text("lr: 0.001\n")
    main = tmp_path / "main.yaml"
    main.write_text("defaults:\n  - sub: extra\nbatch_size: 2\nlr: 0.1\n")
    cfg = yaml_config_hook(str(main))
    assert cfg["batch_size"] == 2
    assert cfg["lr"] == 0.001  # include wins (dict.update semantics)
    assert "defaults" not in cfg


def test_synthetic_contract_shapes():
    ds = SyntheticBagDataset(size=6, fixdim=64, label_dim=4, seed=1)
    x10, x20, omic, t, im, lab = ds[0]
    assert x10.shape == (64, 1024) and x20.shape == (64, 1024)
    assert omic.shape == (431,) and t.shape == (59,) and im.shape == (361,)
    assert lab.shape == (12,) and lab.dtype == np.int32
    assert 0 <= lab[LabelCol.DIAG] < 4
    # deterministic
    again = ds[0]
    np.testing.assert_array_equal(x10, again[0])


def test_loader_batching_and_epoch_shuffle():
    ds = SyntheticBagDataset(size=10, fixdim=16, seed=0)
    loader = BagLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=3)
    batches = list(loader)
    assert len(batches) == 2 == len(loader)
    assert batches[0].x_path10.shape == (4, 16, 1024)
    loader.set_epoch(1)
    b2 = list(loader)
    # different epoch -> different order (almost surely)
    assert not np.allclose(batches[0].label, b2[0].label)


def test_loader_pad_final():
    ds = SyntheticBagDataset(size=5, fixdim=16, seed=0)
    loader = BagLoader(ds, batch_size=4, shuffle=False, drop_last=False, pad_final=True)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[1].pad == 3


def test_loader_drop_last_false_covers_all_samples():
    """ADVICE r1 (high): drop_last=False must not silently drop the final
    partial batch — it pads it and records batch.pad, and __len__ matches
    the number of yielded batches."""
    ds = SyntheticBagDataset(size=10, fixdim=16, seed=0)
    loader = BagLoader(ds, batch_size=4, shuffle=False, drop_last=False,
                       pad_final=False)
    batches = list(loader)
    assert len(batches) == 3 == len(loader)
    assert [b.pad for b in batches] == [0, 0, 2]
    # every dataset sample appears among the non-padded rows exactly once
    labels = np.concatenate(
        [np.asarray(b.label)[: b.label.shape[0] - b.pad] for b in batches])
    expect = np.stack([ds[i][5] for i in range(10)])
    np.testing.assert_array_equal(labels, expect)


def test_evaluator_strip_pad():
    from disentangled_multimodal_learning_tpu.train.evaluation import _strip_pad

    out = ({"a": np.arange(8).reshape(4, 2)}, [np.arange(4), np.float32(1.0)],
           np.arange(3))  # last leaf: batch-dim mismatch -> untouched
    stripped = _strip_pad(out, 4, 1)
    assert stripped[0]["a"].shape == (3, 2)
    assert stripped[1][0].shape == (3,)
    assert stripped[2].shape == (3,)


def test_prefetch_loader_abandoned_consumer_joins_thread():
    """ADVICE r1 (low): abandoning the prefetch generator (next(iter(...)))
    must not leak a producer thread blocked on a full queue."""
    import threading

    from disentangled_multimodal_learning_tpu.data import PrefetchLoader

    ds = SyntheticBagDataset(size=12, fixdim=16, seed=0)
    pre = PrefetchLoader(BagLoader(ds, batch_size=2, shuffle=False), depth=1)
    before = threading.active_count()
    it = iter(pre)
    next(it)
    it.close()  # what GC does when the generator is abandoned
    # producer must exit promptly
    import time

    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.01)
    assert threading.active_count() <= before


def test_kfold_patient_split_deterministic_and_disjoint():
    patients = np.array([f"P{i % 7}" for i in range(21)])
    folds1 = list(kfold_patient_split(patients, k=3, seed=42))
    folds2 = list(kfold_patient_split(patients, k=3, seed=42))
    assert len(folds1) == 3
    for (f1, tr1, te1), (f2, tr2, te2) in zip(folds1, folds2):
        np.testing.assert_array_equal(tr1, tr2)
        np.testing.assert_array_equal(te1, te2)
    for _, tr, te in folds1:
        assert not np.any(tr & te)
        # patient-level: a patient never straddles train/test
        assert set(patients[tr]) & set(patients[te]) == set()
    # all rows covered across test folds exactly once
    cover = sum(te.astype(int) for _, _, te in folds1)
    np.testing.assert_array_equal(cover, np.ones(21, dtype=int))


def test_kfold_matches_sklearn_if_available():
    sklearn = pytest.importorskip("sklearn.model_selection")
    from disentangled_multimodal_learning_tpu.data.splits import _kfold_indices

    kf = sklearn.KFold(n_splits=3, shuffle=True, random_state=42)
    ours = list(_kfold_indices(10, 3, 42))
    theirs = list(kf.split(np.arange(10)))
    for (tr_o, te_o), (tr_s, te_s) in zip(ours, theirs):
        np.testing.assert_array_equal(np.sort(te_o), np.sort(te_s))
        np.testing.assert_array_equal(np.sort(tr_o), np.sort(tr_s))


def test_diag2021_rule():
    assert derive_diag2021(True, False, 0, False) == 0
    assert derive_diag2021(False, True, 0, False) == 3
    assert derive_diag2021(False, False, -1, False) == 1
    assert derive_diag2021(False, False, -2, False) == 1
    assert derive_diag2021(False, False, 0, True) == 1
    assert derive_diag2021(False, False, 0, False) == 2


def test_concat_dataset():
    a = SyntheticBagDataset(size=3, fixdim=16, seed=0)
    b = SyntheticBagDataset(size=4, fixdim=16, seed=1)
    cat = ConcatDataset([a, b])
    assert len(cat) == 7
    np.testing.assert_array_equal(cat[0][0], a[0][0])
    np.testing.assert_array_equal(cat[3][0], b[0][0])
    batch = cat.batch([0, 3, 6])
    assert batch.x_path10.shape == (3, 16, 1024)


def test_prefetch_loader_equivalent():
    from disentangled_multimodal_learning_tpu.data import PrefetchLoader

    ds = SyntheticBagDataset(size=10, fixdim=16, seed=0)
    base = BagLoader(ds, batch_size=2, shuffle=True, seed=5)
    pre = PrefetchLoader(BagLoader(ds, batch_size=2, shuffle=True, seed=5))
    base.set_epoch(3)
    pre.set_epoch(3)
    a = [b.label for b in base]
    b = [b.label for b in pre]
    assert len(a) == len(b) == len(pre)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
