"""Cohort datasets: TCGA / IvYGAP / CPTAC.

The reference imports ``TCGA_Dataset, IvYGAP_Dataset, CPTAC_Dataset`` from a
``data/dataset.py`` that is missing from its snapshot (reference main.py:10);
only the call sites define the contract:

- ctor ``Dataset(excel_wsi=<rows of the manifest CSV>, args=args)``
  (reference main.py:312,343) which must set
  ``args.input_size_omic{,_tumor,_immune}`` (reference main.py:104-106,313-319);
- ``__getitem__`` returns the 6-tuple (see data/contract.py), 7-tuple with a
  trailing wsi id when ``args.save4visualization``
  (reference utils/metrics.py:120);
- manifests live at ``<dataDir>/{TCGA,IvYGAP,CPTAC}/multimodal_diag_survival_*.csv``
  (reference main.py:37,226,239) and column 0 is the patient id used for the
  k-fold patient split (reference main.py:230).

This module re-specifies the missing pieces with an explicit on-disk layout:

    <dataDir>/<COHORT>/
        multimodal_diag_survival_<tag>.csv   # manifest (see below)
        feats10/<WSI_ID>.npy                 # [fixdim, 1024] float, 10x scale
        feats20/<WSI_ID>.npy                 # [fixdim, 1024] float, 20x scale
        feats10.dmltpack                     # OPTIONAL packed shard (one
        feats20.dmltpack                     #   mmap'd file per scale; auto-
                                             #   detected — tools/pack_dataset.py)
        genes_tumor.txt                      # one gene name per line (subset)
        genes_immune.txt                     # one gene name per line (subset)

Manifest columns: ``patient_id, WSI_ID, IDH, 1p19q, CDKN, His, Grade, Diag,
His_2class, Subtype, survival_bin, censor, event, survival_time`` followed by
one column per gene (the full omic vector).  ``Diag`` may be empty, in which
case the WHO-2021 rule is applied (reference main.py:74-83).
Bags shorter than ``fixdim`` are zero-padded, longer ones truncated — the
reference pre-pads offline ("fixdim0" feature dirs, reference
config/config_mine_surv.yaml:7-12); doing it here keeps shapes static for XLA.
"""

from __future__ import annotations

import os

import numpy as np

from .contract import Batch, LabelCol, NUM_LABEL_COLUMNS, derive_diag2021

_CLINICAL_COLS = [
    "patient_id", "WSI_ID", "IDH", "1p19q", "CDKN", "His", "Grade", "Diag",
    "His_2class", "Subtype", "survival_bin", "censor", "event", "survival_time",
]


def _read_gene_list(path):
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


class _CohortDataset:
    """Shared implementation; cohorts differ only in directory name."""

    COHORT = "TCGA"

    def __init__(self, excel_wsi, args, columns=None):
        import pandas as pd

        self.args = args
        self.fixdim = int(getattr(args, "fixdim", 2500))
        self.path_dim = int(getattr(args, "input_path_dim", 1024))
        self.save4visualization = bool(getattr(args, "save4visualization", False))
        self.root = os.path.join(getattr(args, "dataDir", "./data/"), self.COHORT)

        if isinstance(excel_wsi, pd.DataFrame):
            df = excel_wsi
        else:
            # reference passes raw .values rows (main.py:267-270); recover the
            # column names from the manifest header on disk
            arr = np.asarray(excel_wsi)
            if columns is None:
                manifest = self._find_manifest()
                columns = list(pd.read_csv(manifest, nrows=0).columns)
            df = pd.DataFrame(arr, columns=columns[: arr.shape[1]])
        self.df = df.reset_index(drop=True)

        self.gene_cols = [c for c in self.df.columns if c not in _CLINICAL_COLS]
        tumor_genes = _read_gene_list(os.path.join(self.root, "genes_tumor.txt"))
        immune_genes = _read_gene_list(os.path.join(self.root, "genes_immune.txt"))
        if tumor_genes is None:
            tumor_genes = self.gene_cols[: min(59, len(self.gene_cols))]
        if immune_genes is None:
            immune_genes = self.gene_cols[max(0, len(self.gene_cols) - 361):]
        self.tumor_cols = [g for g in tumor_genes if g in self.gene_cols]
        self.immune_cols = [g for g in immune_genes if g in self.gene_cols]

        # ctor contract: publish omic sizes on args (reference main.py:104-106)
        args.input_size_omic = len(self.gene_cols)
        args.input_size_omic_tumor = len(self.tumor_cols)
        args.input_size_omic_immune = len(self.immune_cols)
        self.input_size_omic = len(self.gene_cols)
        self.input_size_omic_tumor = len(self.tumor_cols)
        self.input_size_omic_immune = len(self.immune_cols)

    def _find_manifest(self):
        for fn in sorted(os.listdir(self.root)):
            if fn.startswith("multimodal_diag_survival") and fn.endswith(".csv"):
                return os.path.join(self.root, fn)
        raise FileNotFoundError(f"no manifest csv under {self.root}")

    def __len__(self):
        return len(self.df)

    def _pack_for(self, subdir):
        """Packed shard for a feature dir (``<root>/<subdir>.dmltpack``,
        data/packing.py) — opened lazily, cached; None when absent so the
        per-file .npy path below stays the default."""
        if not hasattr(self, "_packs"):
            self._packs = {}
        if subdir not in self._packs:
            pack_path = os.path.join(self.root, f"{subdir}.dmltpack")
            if os.path.exists(pack_path):
                from .packing import PackFile

                self._packs[subdir] = PackFile(pack_path)
            else:
                self._packs[subdir] = None
        return self._packs[subdir]

    def _load_bag(self, subdir, wsi_id) -> np.ndarray:
        pack = self._pack_for(subdir)
        if pack is not None and pack.rows(str(wsi_id)) >= 0:
            return pack.get(str(wsi_id), self.fixdim, self.path_dim)
        from .native_io import load_bag

        fp = os.path.join(self.root, subdir, f"{wsi_id}.npy")
        return load_bag(fp, self.fixdim, self.path_dim)

    def _label_row(self, row) -> np.ndarray:
        lab = np.zeros(NUM_LABEL_COLUMNS, dtype=np.int32)

        def geti(name, default=0):
            v = row.get(name, default)
            try:
                return int(float(v))
            except (TypeError, ValueError):
                return default

        idh_raw = row.get("IDH", 0)
        idh_wt = (str(idh_raw).strip().upper() == "WT") or geti("IDH") == 0
        codel = (str(row.get("1p19q", "")).strip().lower() == "codel") or geti("1p19q") == 1
        his_g4 = str(row.get("His", "")).strip().upper() == "G4"
        lab[LabelCol.IDH] = 0 if idh_wt else 1
        lab[LabelCol.CODEL_1P19Q] = 1 if codel else 0
        lab[LabelCol.CDKN] = geti("CDKN")
        lab[LabelCol.HIS] = geti("His") if not his_g4 else 4
        lab[LabelCol.GRADE] = geti("Grade")
        diag = row.get("Diag", "")
        if diag is None or (isinstance(diag, float) and np.isnan(diag)) or str(diag) == "":
            lab[LabelCol.DIAG] = derive_diag2021(idh_wt, codel, lab[LabelCol.CDKN], his_g4)
        else:
            lab[LabelCol.DIAG] = geti("Diag")
        lab[LabelCol.HIS_2CLASS] = geti("His_2class")
        lab[LabelCol.SUBTYPE] = geti("Subtype")
        lab[LabelCol.SURVIVAL_BIN] = geti("survival_bin")
        lab[LabelCol.CENSOR] = geti("censor")
        lab[LabelCol.EVENT] = geti("event", 1 - lab[LabelCol.CENSOR])
        lab[LabelCol.SURVIVAL_TIME] = geti("survival_time")
        return lab

    def __getitem__(self, idx: int):
        row = self.df.iloc[idx]
        wsi_id = row["WSI_ID"]
        x10 = self._load_bag("feats10", wsi_id)
        x20 = self._load_bag("feats20", wsi_id)
        genes = row[self.gene_cols].to_numpy(dtype=np.float32)
        omic_tumor = row[self.tumor_cols].to_numpy(dtype=np.float32)
        omic_immune = row[self.immune_cols].to_numpy(dtype=np.float32)
        label = self._label_row(row)
        out = (x10, x20, genes, omic_tumor, omic_immune, label)
        if self.save4visualization:
            out = out + (wsi_id,)
        return out

    def wsi_id(self, idx: int) -> str:
        return str(self.df.iloc[idx]["WSI_ID"])

    def patient_ids(self) -> np.ndarray:
        return self.df["patient_id"].to_numpy()

    def bag_len(self, idx: int) -> int:
        """True (unpadded) bag length from the .npy header, for bucketed
        padding (data/bucketing.py); cached per sample."""
        if not hasattr(self, "_bag_lens"):
            self._bag_lens = {}
        if idx not in self._bag_lens:
            wsi = str(self.df.iloc[idx]["WSI_ID"])
            pack = self._pack_for("feats10")
            if pack is not None and pack.rows(wsi) >= 0:
                self._bag_lens[idx] = int(pack.rows(wsi))
                return self._bag_lens[idx]
            path = os.path.join(self.root, "feats10", f"{wsi}.npy")
            try:
                self._bag_lens[idx] = int(
                    np.load(path, mmap_mode="r").shape[0])
            except (OSError, ValueError):
                self._bag_lens[idx] = self.fixdim
        return self._bag_lens[idx]

    def batch(self, indices, pad_to: int | None = None) -> Batch:
        """Assemble a batch; bag IO goes through the native threaded loader
        (native/dmlt_io.cpp) when available.  ``pad_to`` overrides the
        fixdim pad/truncate target (bucketed padding)."""
        from .native_io import load_bag_batch

        dim = int(pad_to) if pad_to is not None else self.fixdim
        rows = [self.df.iloc[i] for i in indices]
        ids = [str(r["WSI_ID"]) for r in rows]

        def gather(subdir):
            pack = self._pack_for(subdir)
            if pack is not None and all(pack.rows(w) >= 0 for w in ids):
                return pack.get_batch(ids, dim, self.path_dim)
            return load_bag_batch(
                [os.path.join(self.root, subdir, f"{w}.npy") for w in ids],
                dim, self.path_dim)

        x10 = gather("feats10")
        x20 = gather("feats20")
        omic = np.stack([r[self.gene_cols].to_numpy(dtype=np.float32) for r in rows])
        tum = np.stack([r[self.tumor_cols].to_numpy(dtype=np.float32) for r in rows])
        imm = np.stack([r[self.immune_cols].to_numpy(dtype=np.float32) for r in rows])
        labels = np.stack([self._label_row(r) for r in rows])
        return Batch(x10, x20, omic, tum, imm, labels, wsi_id=np.array(ids))


class TCGA_Dataset(_CohortDataset):
    COHORT = "TCGA"


class IvYGAP_Dataset(_CohortDataset):
    COHORT = "IvYGAP"


class CPTAC_Dataset(_CohortDataset):
    COHORT = "CPTAC"


class ConcatDataset:
    """Minimal torch.utils.data.ConcatDataset equivalent (reference main.py:322)."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def _locate(self, idx):
        d = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return self.datasets[d], idx - int(self._offsets[d])

    def __getitem__(self, idx):
        ds, j = self._locate(idx)
        return ds[j]

    def wsi_id(self, idx):
        ds, j = self._locate(idx)
        return ds.wsi_id(j)

    def bag_len(self, idx):
        ds, j = self._locate(idx)
        return ds.bag_len(j)

    def batch(self, indices, pad_to: int | None = None) -> Batch:
        items = [self.__getitem__(i)[:6] for i in indices]
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
