from .contract import Batch, LABEL_COLUMNS, LabelCol, derive_diag2021
from .synthetic import SyntheticBagDataset
from .datasets import TCGA_Dataset, IvYGAP_Dataset, CPTAC_Dataset, ConcatDataset
from .splits import kfold_patient_split
from .loader import BagLoader, PrefetchLoader
from .bucketing import BucketedBagLoader, DEFAULT_BUCKETS, validate_buckets

__all__ = [
    "Batch", "LABEL_COLUMNS", "LabelCol", "derive_diag2021",
    "SyntheticBagDataset", "TCGA_Dataset", "IvYGAP_Dataset", "CPTAC_Dataset",
    "ConcatDataset", "kfold_patient_split", "BagLoader", "PrefetchLoader",
    "BucketedBagLoader", "DEFAULT_BUCKETS", "validate_buckets",
]
