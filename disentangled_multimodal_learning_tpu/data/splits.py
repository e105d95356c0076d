"""K-fold patient-level splits.

Reproduces the reference split protocol (reference main.py:226-270):
``np.random.seed(seed)`` → unique patient ids → ``np.random.shuffle`` →
``KFold(n_splits=k, shuffle=True, random_state=seed)`` over patients →
select manifest rows whose patient id falls in the train/test fold.
"""

from __future__ import annotations

import numpy as np


def _kfold_indices(n: int, k: int, seed: int):
    """sklearn.model_selection.KFold(shuffle=True, random_state=seed) exact
    reimplementation (so sklearn stays an optional dependency):
    a seeded permutation split into k contiguous chunks with the first
    ``n % k`` folds one element larger."""
    rng = np.random.RandomState(seed)
    idx = np.arange(n)
    rng.shuffle(idx)
    fold_sizes = np.full(k, n // k, dtype=int)
    fold_sizes[: n % k] += 1
    current = 0
    for fs in fold_sizes:
        test = idx[current: current + fs]
        train = np.concatenate([idx[:current], idx[current + fs:]])
        current += fs
        yield np.sort(train), np.sort(test)


def dump_split_csvs(out_dir: str, cohort: str, fold: int, df,
                    train_mask, test_mask) -> dict:
    """Write the per-fold train/test split manifests to disk for
    reproducibility/audit (reference ``printDataSplit`` dumps,
    main.py:70-99 and :282-299).  Unlike the reference — which writes a
    single ``output_<cohort>_{train,test}.csv`` only if absent, so only the
    first fold ever lands — every fold gets its own file.  Returns
    ``{"train": path, "test": path}``."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for tag, mask in (("train", train_mask), ("test", test_mask)):
        path = os.path.join(
            out_dir, f"split_{cohort.lower()}_fold{fold}_{tag}.csv")
        df[np.asarray(mask)].to_csv(path, index=False)
        paths[tag] = path
    return paths


def kfold_patient_split(patient_col: np.ndarray, k: int, seed: int):
    """Yield (fold, train_mask, test_mask) over manifest rows.

    ``patient_col`` is column 0 of the manifest (reference main.py:230-236).
    The same seed gives the same folds across runs — required because the
    reference's inference entry rebuilds the fold-0 split from the seed
    (reference inference.py:113-121).
    """
    patients = np.unique(np.asarray(patient_col))
    rng = np.random.RandomState(seed)
    # reference shuffles the unique patient list first (main.py:233-234)
    rng.shuffle(patients)
    for fold, (train_idx, test_idx) in enumerate(_kfold_indices(len(patients), k, seed)):
        train_p = set(patients[train_idx].tolist())
        test_p = set(patients[test_idx].tolist())
        col = np.asarray(patient_col)
        train_mask = np.array([p in train_p for p in col])
        test_mask = np.array([p in test_p for p in col])
        yield fold, train_mask, test_mask
