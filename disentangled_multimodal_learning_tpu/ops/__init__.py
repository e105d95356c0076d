from .grid_sample import grid_sample_2d, grid_sample_1d, grid_sample_2d_nchw
from .pinv import moore_penrose_pinv
from .nystrom import nystrom_attention
from .cluster import dpc_knn_cluster, merge_tokens, cluster_merge

__all__ = [
    "grid_sample_2d", "grid_sample_1d", "grid_sample_2d_nchw",
    "moore_penrose_pinv", "nystrom_attention",
    "dpc_knn_cluster", "merge_tokens", "cluster_merge",
]
