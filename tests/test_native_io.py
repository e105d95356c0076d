"""Native C++ bag loader vs numpy fallback (golden equality)."""

import os

import numpy as np
import pytest

from disentangled_multimodal_learning_tpu.data import native_io


@pytest.fixture
def bag_files(tmp_path, rng):
    paths, arrays = [], []
    for i, rows in enumerate([10, 32, 50]):  # short, exact-ish, long
        a = rng.normal(size=(rows, 16)).astype(np.float32)
        p = str(tmp_path / f"bag{i}.npy")
        np.save(p, a)
        paths.append(p)
        arrays.append(a)
    # float64 variant
    a64 = rng.normal(size=(8, 16)).astype(np.float64)
    p64 = str(tmp_path / "bag64.npy")
    np.save(p64, a64)
    return paths, arrays, p64, a64


def _expected(a, fixdim, feat):
    out = np.zeros((fixdim, feat), dtype=np.float32)
    n = min(len(a), fixdim)
    out[:n] = a[:n].astype(np.float32)
    return out


def test_native_compiles_and_loads(bag_files):
    if not native_io.native_available():
        pytest.skip("g++ unavailable")
    paths, arrays, p64, a64 = bag_files
    for p, a in zip(paths, arrays):
        got = native_io.load_bag(p, 32, 16)
        np.testing.assert_array_equal(got, _expected(a, 32, 16))
    got64 = native_io.load_bag(p64, 32, 16)
    np.testing.assert_allclose(got64, _expected(a64, 32, 16), atol=1e-6)


def test_native_batch_matches_fallback(bag_files):
    paths, arrays, _, _ = bag_files
    got = native_io.load_bag_batch(paths, 32, 16, n_threads=3)
    want = np.stack([_expected(a, 32, 16) for a in arrays])
    np.testing.assert_array_equal(got, want)


def test_fallback_forced(bag_files, monkeypatch):
    paths, arrays, _, _ = bag_files
    got = np.stack([native_io._numpy_load_bag(p, 32, 16) for p in paths])
    want = np.stack([_expected(a, 32, 16) for a in arrays])
    np.testing.assert_array_equal(got, want)


def test_native_bad_file_falls_back(tmp_path):
    p = str(tmp_path / "garbage.npy")
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    np.save(p, a)
    # feat_dim mismatch: native returns an error code, wrapper falls back to
    # numpy which raises a shape error on assignment — so use matching dims
    got = native_io.load_bag(p, 5, 4)
    want = np.zeros((5, 4), np.float32)
    want[:3] = a
    np.testing.assert_array_equal(got, want)


def test_pack_roundtrip_numpy_reader(tmp_path, rng):
    """pack_bags -> NumpyPackReader equality with per-file loads, true row
    counts preserved (bucketing contract)."""
    from disentangled_multimodal_learning_tpu.data.packing import (
        NumpyPackReader, pack_bags)

    arrays = {}
    src = tmp_path / "feats"
    src.mkdir()
    for i, rows in enumerate([5, 32, 50]):
        a = rng.normal(size=(rows, 16)).astype(np.float32)
        np.save(src / f"W{i}.npy", a)
        arrays[f"W{i}"] = a
    out = str(tmp_path / "feats.dmltpack")
    assert pack_bags(str(src), out) == 3

    rd = NumpyPackReader(out)
    assert rd.feat_dim == 16
    for name, a in arrays.items():
        assert rd.rows(name) == a.shape[0]
        np.testing.assert_array_equal(rd.get(name, 32, 16),
                                      _expected(a, 32, 16))
    got = rd.get_batch(sorted(arrays), 32, 16)
    want = np.stack([_expected(arrays[n], 32, 16) for n in sorted(arrays)])
    np.testing.assert_array_equal(got, want)
    assert rd.rows("missing") == -1


def test_pack_native_reader_matches_numpy(tmp_path, rng):
    """The C++ mmap reader returns bit-identical bags to NumpyPackReader."""
    from disentangled_multimodal_learning_tpu.data.packing import (
        NumpyPackReader, PackFile, pack_bags)

    if not native_io.native_available():
        pytest.skip("g++ unavailable")
    src = tmp_path / "feats"
    src.mkdir()
    names = []
    for i, rows in enumerate([3, 20, 40, 64]):
        np.save(src / f"W{i}.npy",
                rng.normal(size=(rows, 8)).astype(np.float32))
        names.append(f"W{i}")
    out = str(tmp_path / "feats.dmltpack")
    pack_bags(str(src), out)

    pf = PackFile(out)
    assert pf.native
    rd = NumpyPackReader(out)
    for n in names:
        assert pf.rows(n) == rd.rows(n)
        np.testing.assert_array_equal(pf.get(n, 32, 8), rd.get(n, 32, 8))
    np.testing.assert_array_equal(pf.get_batch(names, 32, 8, n_threads=3),
                                  rd.get_batch(names, 32, 8))
    assert pf.rows("missing") == -1
    pf.close()


def test_cohort_dataset_uses_pack_when_present(tmp_path, rng):
    """With feats{10,20}.dmltpack on disk the dataset serves identical bags
    and bag_lens from the shard (auto-detected, no config)."""
    import pandas as pd

    from disentangled_multimodal_learning_tpu.config import Config
    from disentangled_multimodal_learning_tpu.data import TCGA_Dataset
    from disentangled_multimodal_learning_tpu.data.packing import pack_bags

    root = tmp_path / "TCGA"
    (root / "feats10").mkdir(parents=True)
    (root / "feats20").mkdir()
    rows = []
    for i in range(3):
        wsi = f"W{i:03d}"
        np.save(root / "feats10" / f"{wsi}.npy",
                rng.normal(size=(4 + i, 1024)).astype(np.float32))
        np.save(root / "feats20" / f"{wsi}.npy",
                rng.normal(size=(7 + i, 1024)).astype(np.float32))
        row = {"patient_id": f"P{i}", "WSI_ID": wsi, "IDH": 1, "1p19q": 0,
               "CDKN": 0, "His": 1, "Grade": 1, "Diag": 1, "His_2class": 0,
               "Subtype": 1, "survival_bin": 1, "censor": 0, "event": 1,
               "survival_time": 100}
        row.update({f"g{j}": 0.0 for j in range(6)})
        rows.append(row)
    df = pd.DataFrame(rows)
    df.to_csv(root / "multimodal_diag_survival_TCGA.csv", index=False)

    cfg = Config(dataDir=str(tmp_path) + "/", fixdim=16).validate()
    ds_npy = TCGA_Dataset(excel_wsi=df, args=cfg)
    want = [ds_npy[i][:2] for i in range(3)]
    want_lens = [ds_npy.bag_len(i) for i in range(3)]
    want_batch = ds_npy.batch([0, 1, 2])

    pack_bags(str(root / "feats10"), str(root / "feats10.dmltpack"))
    pack_bags(str(root / "feats20"), str(root / "feats20.dmltpack"))
    ds_pack = TCGA_Dataset(excel_wsi=df, args=cfg)
    assert ds_pack._pack_for("feats10") is not None
    for i in range(3):
        np.testing.assert_array_equal(ds_pack[i][0], want[i][0])
        np.testing.assert_array_equal(ds_pack[i][1], want[i][1])
        assert ds_pack.bag_len(i) == want_lens[i] == 4 + i
    got_batch = ds_pack.batch([0, 1, 2])
    np.testing.assert_array_equal(got_batch.x_path10, want_batch.x_path10)
    np.testing.assert_array_equal(got_batch.x_path20, want_batch.x_path20)


def test_cohort_dataset_roundtrip_with_native(tmp_path, rng):
    """End-to-end: write a tiny TCGA-layout cohort to disk, read through
    TCGA_Dataset with the native loader."""
    import pandas as pd

    from disentangled_multimodal_learning_tpu.config import Config
    from disentangled_multimodal_learning_tpu.data import TCGA_Dataset

    root = tmp_path / "TCGA"
    (root / "feats10").mkdir(parents=True)
    (root / "feats20").mkdir()
    n_genes = 20
    rows = []
    for i in range(4):
        wsi = f"W{i:03d}"
        np.save(root / "feats10" / f"{wsi}.npy",
                rng.normal(size=(6, 1024)).astype(np.float32))
        np.save(root / "feats20" / f"{wsi}.npy",
                rng.normal(size=(9, 1024)).astype(np.float32))
        row = {"patient_id": f"P{i//2}", "WSI_ID": wsi, "IDH": i % 2,
               "1p19q": 0, "CDKN": 0, "His": 1, "Grade": i % 3, "Diag": i % 4,
               "His_2class": 0, "Subtype": i % 3, "survival_bin": i % 4,
               "censor": 0, "event": 1, "survival_time": 100 + i}
        row.update({f"g{j}": float(rng.normal()) for j in range(n_genes)})
        rows.append(row)
    df = pd.DataFrame(rows)
    df.to_csv(root / "multimodal_diag_survival_TCGA.csv", index=False)
    (root / "genes_tumor.txt").write_text("\n".join(f"g{j}" for j in range(5)))
    (root / "genes_immune.txt").write_text("\n".join(f"g{j}" for j in range(5, 20)))

    cfg = Config(dataDir=str(tmp_path) + "/", fixdim=16).validate()
    ds = TCGA_Dataset(excel_wsi=df, args=cfg)
    assert cfg.input_size_omic == n_genes
    assert cfg.input_size_omic_tumor == 5
    assert cfg.input_size_omic_immune == 15
    x10, x20, omic, tum, imm, lab = ds[0]
    assert x10.shape == (16, 1024)
    assert (x10[6:] == 0).all()  # zero-padded beyond 6 rows
    batch = ds.batch([0, 1, 2])
    assert batch.x_path10.shape == (3, 16, 1024)
    np.testing.assert_array_equal(batch.x_path10[0], x10)
    assert batch.label.shape == (3, 12)
