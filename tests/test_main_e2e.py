"""Real-data end-to-end: a tiny on-disk TCGA+IvYGAP tree driven through
``main.main()`` co-training k-fold -> checkpoint -> ``inference.main()``
round trip (VERDICT r2 #6).  Covers manifest parsing, diag2021 derivation,
ConcatDataset, the seeded patient split (+ printDataSplit CSV export,
reference main.py:70-99), training, metric-stamped save, reload and eval.
"""

import glob
import os

import numpy as np
import pandas as pd
import pytest

from disentangled_multimodal_learning_tpu.config import Config
from disentangled_multimodal_learning_tpu.data import kfold_patient_split

N_GENES = 20
FIXDIM = 16


def _write_cohort(root, cohort, manifest_name, n_patients, n_wsi, rng,
                  empty_diag=False):
    droot = root / cohort
    (droot / "feats10").mkdir(parents=True)
    (droot / "feats20").mkdir()
    rows = []
    for i in range(n_wsi):
        wsi = f"{cohort}-W{i:03d}"
        for sub in ("feats10", "feats20"):
            np.save(droot / sub / f"{wsi}.npy",
                    rng.normal(size=(rng.integers(4, FIXDIM + 4), 1024))
                    .astype(np.float32))
        row = {"patient_id": f"{cohort}-P{i % n_patients}", "WSI_ID": wsi,
               "IDH": "WT" if i % 2 == 0 else 1,
               "1p19q": "codel" if i % 4 == 3 else 0,
               "CDKN": -2 if i % 3 == 0 else 0,
               "His": "G4" if i % 5 == 0 else 2,
               "Grade": i % 3,
               # empty Diag exercises the WHO-2021 derivation rule
               # (reference main.py:74-83)
               "Diag": "" if empty_diag else i % 4,
               "His_2class": i % 2, "Subtype": i % 3, "survival_bin": i % 4,
               "censor": i % 2, "event": 1 - (i % 2),
               "survival_time": 100 + 13 * i}
        row.update({f"g{j}": float(rng.normal()) for j in range(N_GENES)})
        rows.append(row)
    df = pd.DataFrame(rows)
    df.to_csv(droot / manifest_name, index=False)
    (droot / "genes_tumor.txt").write_text(
        "\n".join(f"g{j}" for j in range(5)))
    (droot / "genes_immune.txt").write_text(
        "\n".join(f"g{j}" for j in range(5, N_GENES)))
    return df


@pytest.fixture(scope="module")
def data_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("cohorts")
    rng = np.random.default_rng(0)
    df_tcga = _write_cohort(root, "TCGA", "multimodal_diag_survival_TCGA.csv",
                            n_patients=4, n_wsi=8, rng=rng)
    df_ivy = _write_cohort(root, "IvYGAP", "multimodal_diag_survival_IvY.csv",
                           n_patients=3, n_wsi=6, rng=rng, empty_diag=True)
    return root, df_tcga, df_ivy


def _cfg(data_root, ckpt_dir, **kw):
    base = dict(mode="teacher", task_type="diag2021", label_dim=4,
                fixdim=FIXDIM, batch_size=2, epochs=1, kfold=2,
                coTraining=True, synthetic_data=False,
                dataDir=str(data_root) + "/", checkpoints=str(ckpt_dir),
                eval_during_training=False, debug=True, seed=0,
                printDataSplit=True)
    base.update(kw)
    return Config(**base).validate()


def test_main_cotraining_roundtrip(data_tree, tmp_path):
    import main as main_mod

    root, df_tcga, df_ivy = data_tree
    cfg = _cfg(root, tmp_path)
    results = main_mod.main(0, cfg)

    # one metrics dict per fold, finite headline metric
    assert sorted(results) == [0, 1]
    for fold in results:
        assert np.isfinite(results[fold]["auc"])

    # metric-stamped checkpoints per fold
    ckpts = sorted(glob.glob(os.path.join(str(tmp_path), "teacher_fold_*.ckpt")))
    assert len(ckpts) == 2

    # split CSVs per cohort per fold, and they reproduce kfold_patient_split
    for cohort, df in (("tcga", df_tcga), ("ivygap", df_ivy)):
        src = {"tcga": df_tcga, "ivygap": df_ivy}[cohort]
        folds = list(kfold_patient_split(src.iloc[:, 0].to_numpy(), cfg.kfold,
                                         cfg.seed))
        for fold, tr, te in folds:
            for tag, mask in (("train", tr), ("test", te)):
                path = os.path.join(str(tmp_path),
                                    f"split_{cohort}_fold{fold}_{tag}.csv")
                assert os.path.exists(path), path
                got = pd.read_csv(path)
                want = src[mask].reset_index(drop=True)
                assert list(got["WSI_ID"]) == list(want["WSI_ID"])

    # inference round trip: rebuild fold-0 split from the seed, load the
    # fold-1-stamped checkpoint (1-based naming), evaluate
    import inference as inf_mod

    icfg = _cfg(root, tmp_path, printDataSplit=False)
    metrics = inf_mod.main(0, icfg, checkpoint=ckpts[0])
    assert np.isfinite(metrics["auc"])
    assert 0.0 <= metrics["acc"] <= 1.0


def test_main_external_eval_cptac(tmp_path_factory, tmp_path):
    """CPTAC external-eval branch (reference main.py:35-220): own manifest,
    k-fold patient split, per-fold training + eval, then the inference
    entry's external path rebuilds the fold-0 split from the seed."""
    import main as main_mod

    root = tmp_path_factory.mktemp("cptac")
    rng = np.random.default_rng(7)
    _write_cohort(root, "CPTAC", "multimodal_diag_survival_CPTAC.csv",
                  n_patients=4, n_wsi=8, rng=rng)
    cfg = _cfg(root, tmp_path, external_eval=True, coTraining=False,
               printDataSplit=False)
    results = main_mod.main(0, cfg)
    assert sorted(results) == [0, 1]
    for fold in results:
        assert np.isfinite(results[fold]["auc"])

    import glob as _glob

    import inference as inf_mod

    ckpts = sorted(_glob.glob(os.path.join(str(tmp_path), "teacher_*.ckpt")))
    assert len(ckpts) == 2
    metrics = inf_mod.main(0, _cfg(root, tmp_path, external_eval=True,
                                   coTraining=False, printDataSplit=False),
                           checkpoint=ckpts[0])
    assert np.isfinite(metrics["auc"])


def test_empty_diag_rows_derive_who2021(data_tree):
    """IvYGAP rows were written with empty Diag: the dataset must derive the
    4-class WHO-2021 label (reference main.py:74-83)."""
    from disentangled_multimodal_learning_tpu.data import IvYGAP_Dataset
    from disentangled_multimodal_learning_tpu.data.contract import (
        LabelCol, derive_diag2021)

    root, _, df_ivy = data_tree
    cfg = _cfg(root, "#")
    ds = IvYGAP_Dataset(excel_wsi=df_ivy, args=cfg)
    for i in range(len(ds)):
        lab = ds[i][5]
        row = df_ivy.iloc[i]
        idh_wt = str(row["IDH"]).strip().upper() == "WT"
        codel = str(row["1p19q"]).strip().lower() == "codel"
        his_g4 = str(row["His"]).strip().upper() == "G4"
        want = derive_diag2021(idh_wt, codel, int(row["CDKN"]), his_g4)
        assert int(lab[LabelCol.DIAG]) == want
