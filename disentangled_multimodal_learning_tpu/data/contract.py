"""The 6-tuple bag data contract.

The reference's dataset classes are absent from its snapshot (imported at
reference main.py:10 but data/dataset.py is missing); the contract below is
reconstructed from every call site:

- batches unpack as
  ``(x_path10, x_path20, x_omic, x_omic_tumor, x_omic_immune, label)``
  (reference train_test.py:52-53), with a trailing ``wsiID`` when
  ``save4visualization`` (reference train_test.py:1080, utils/metrics.py:120);
- shapes: x_path10/x_path20 ``[B, fixdim, 1024]`` (fixdim=2500,
  reference config/config_mine_diag2021.yaml:2,34), x_omic ``[B, 431]``,
  x_omic_tumor ``[B, 59]``, x_omic_immune ``[B, 361]``
  (reference config/config_mine_diag2021.yaml:29-31);
- label ``[B, 12]`` integer columns
  0:IDH 1:1p19q 2:CDKN 3:His 4:Grade 5:Diag 6:His_2class 7:Subtype
  8:survival_bin 9:censor 10:event 11:survival_time
  (reference train_test.py:54).
"""

from __future__ import annotations

import dataclasses
import enum

import numpy as np


class LabelCol(enum.IntEnum):
    IDH = 0
    CODEL_1P19Q = 1
    CDKN = 2
    HIS = 3
    GRADE = 4
    DIAG = 5
    HIS_2CLASS = 6
    SUBTYPE = 7
    SURVIVAL_BIN = 8
    CENSOR = 9
    EVENT = 10
    SURVIVAL_TIME = 11


LABEL_COLUMNS = [c.name for c in LabelCol]
NUM_LABEL_COLUMNS = len(LABEL_COLUMNS)


@dataclasses.dataclass
class Batch:
    """A host-side batch honoring the 6-tuple contract (numpy arrays)."""

    x_path10: np.ndarray  # [B, N, 1024] float32
    x_path20: np.ndarray  # [B, N, 1024] float32
    x_omic: np.ndarray  # [B, 431] float32
    x_omic_tumor: np.ndarray  # [B, 59] float32
    x_omic_immune: np.ndarray  # [B, 361] float32
    label: np.ndarray  # [B, 12] int32
    wsi_id: np.ndarray | None = None  # [B] object, only for visualization dumps

    def astuple(self, with_id: bool = False):
        t = (self.x_path10, self.x_path20, self.x_omic,
             self.x_omic_tumor, self.x_omic_immune, self.label)
        return t + (self.wsi_id,) if with_id else t

    def __iter__(self):
        return iter(self.astuple())

    @property
    def batch_size(self) -> int:
        return self.x_path10.shape[0]


def derive_diag2021(idh_wt: bool, codel: bool, cdkn: int, his_g4: bool) -> int:
    """WHO-2021 diagnosis label derivation (reference main.py:74-83):

    - IDH wild-type                        -> 0 (Grade 4 GBM)
    - IDH-mut + 1p/19q codel               -> 3 (Grade 2/3 Oligo)
    - IDH-mut, non-codel, CDKN2A/B loss
      (cdkn in {-1,-2}) or histological G4 -> 1 (Grade 4 Astro)
    - otherwise                            -> 2 (Grade 2/3 Astro)
    """
    if idh_wt:
        return 0
    if codel:
        return 3
    if cdkn in (-1, -2) or his_g4:
        return 1
    return 2
