"""Deterministic synthetic bag dataset honoring the 6-tuple contract.

The reference has no test data and its dataset classes are missing from the
snapshot; this synthetic generator exists so every trainer/eval/benchmark path
can run end-to-end on any machine.  Labels are made *learnable* (class-
conditional feature means) so smoke training shows a decreasing loss.
"""

from __future__ import annotations

import numpy as np

from .contract import Batch, NUM_LABEL_COLUMNS, LabelCol


class SyntheticBagDataset:
    def __init__(
        self,
        size: int = 64,
        fixdim: int = 2500,
        path_dim: int = 1024,
        omic_dim: int = 431,
        omic_tumor_dim: int = 59,
        omic_immune_dim: int = 361,
        label_dim: int = 4,
        n_survival_bins: int = 4,
        seed: int = 42,
        signal_seed: int | None = None,
        min_len: int | None = None,
        args=None,
    ):
        if args is not None:  # mirror reference dataset ctor contract (main.py:104-106)
            fixdim = getattr(args, "fixdim", fixdim)
            label_dim = getattr(args, "label_dim", label_dim)
            args.input_size_omic = omic_dim
            args.input_size_omic_tumor = omic_tumor_dim
            args.input_size_omic_immune = omic_immune_dim
        self.size = size
        self.fixdim = fixdim
        self.path_dim = path_dim
        self.dims = (omic_dim, omic_tumor_dim, omic_immune_dim)
        self.label_dim = label_dim
        self.n_survival_bins = n_survival_bins
        self.seed = seed
        rng = np.random.default_rng(seed)
        # class-conditional signal directions so tasks are learnable; pass the
        # SAME signal_seed to a train and a test dataset (with different
        # seeds) to make held-out generalization measurable
        sig_rng = (np.random.default_rng(signal_seed)
                   if signal_seed is not None else rng)
        self._path_means = sig_rng.normal(0, 0.5, (label_dim, path_dim)).astype(np.float32)
        self._omic_means = sig_rng.normal(0, 0.5, (label_dim, omic_dim)).astype(np.float32)
        self._labels = rng.integers(0, label_dim, size=size)
        self._grade = rng.integers(0, 3, size=size)
        self._subtype = rng.integers(0, 3, size=size)
        self._surv_bin = rng.integers(0, n_survival_bins, size=size)
        self._censor = rng.integers(0, 2, size=size)
        self._surv_time = rng.integers(30, 3000, size=size)
        # variable-length bags (for bucketed padding): each bag has a true
        # length in [min_len, fixdim]; rows beyond it are zero (exactly the
        # reference's offline fixdim zero-padding semantics)
        self._lens = (rng.integers(min_len, fixdim + 1, size=size)
                      if min_len is not None
                      else np.full(size, fixdim, dtype=np.int64))

    # expose the ctor side effects the reference datasets set (main.py:104-106)
    @property
    def input_size_omic(self):
        return self.dims[0]

    @property
    def input_size_omic_tumor(self):
        return self.dims[1]

    @property
    def input_size_omic_immune(self):
        return self.dims[2]

    def __len__(self):
        return self.size

    def __getitem__(self, idx: int):
        rng = np.random.default_rng(self.seed * 1_000_003 + idx)
        y = int(self._labels[idx])
        x10 = rng.normal(0, 1, (self.fixdim, self.path_dim)).astype(np.float32)
        x10 += self._path_means[y][None, :]
        x20 = rng.normal(0, 1, (self.fixdim, self.path_dim)).astype(np.float32)
        x20 += self._path_means[y][None, :]
        L = int(self._lens[idx])
        if L < self.fixdim:
            x10[L:] = 0.0
            x20[L:] = 0.0
        omic = rng.normal(0, 1, (self.dims[0],)).astype(np.float32) + self._omic_means[y]
        omic_tumor = omic[: self.dims[1]].copy()
        omic_immune = omic[self.dims[0] - self.dims[2]:].copy()
        label = np.zeros(NUM_LABEL_COLUMNS, dtype=np.int32)
        label[LabelCol.IDH] = y % 2
        label[LabelCol.CODEL_1P19Q] = (y // 2) % 2
        label[LabelCol.CDKN] = 0
        label[LabelCol.HIS] = y % 3
        label[LabelCol.GRADE] = self._grade[idx]
        label[LabelCol.DIAG] = y
        label[LabelCol.HIS_2CLASS] = y % 2
        label[LabelCol.SUBTYPE] = self._subtype[idx]
        label[LabelCol.SURVIVAL_BIN] = self._surv_bin[idx]
        label[LabelCol.CENSOR] = self._censor[idx]
        label[LabelCol.EVENT] = 1 - self._censor[idx]
        label[LabelCol.SURVIVAL_TIME] = self._surv_time[idx]
        return x10, x20, omic, omic_tumor, omic_immune, label

    def wsi_id(self, idx: int) -> str:
        return f"SYN-{idx:05d}"

    def bag_len(self, idx: int) -> int:
        return int(self._lens[idx])

    def batch(self, indices, pad_to: int | None = None) -> Batch:
        items = [self[i] for i in indices]
        cols = [np.stack([it[j] for it in items]) for j in range(6)]
        if pad_to is not None:
            for j in (0, 1):
                bags = cols[j]
                if pad_to <= bags.shape[1]:
                    cols[j] = bags[:, :pad_to]
                else:
                    cols[j] = np.pad(bags, ((0, 0), (0, pad_to - bags.shape[1]),
                                            (0, 0)))
        return Batch(*cols, wsi_id=np.array([self.wsi_id(i) for i in indices]))
