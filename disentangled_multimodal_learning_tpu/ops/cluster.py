"""DPC-KNN token clustering + weighted merge (student token reduction).

Functional equivalent of the reference ClusterMergeNet internals
(models/ClusterMergeNet.py:68-180): density-peak clustering with k-NN local
density, top-k scoring of cluster centers, nearest-center assignment, and a
weighted scatter-mean merge 2500 -> cluster_num tokens.

TPU-native choices:
- ``cluster_num`` is STATIC (ceil(fixdim * sample_ratio), fixed shapes for XLA);
- the data-dependent assignment is expressed as top_k / argmin / one-hot
  matmuls (MXU) instead of torch's index_add_ scatter;
- the 1e-6 random density tie-break (models/ClusterMergeNet.py:100-102) is
  threaded through an explicit PRNG key (the reference uses global RNG state);
- pairwise distances use the (a-b)^2 = |a|^2 + |b|^2 - 2ab expansion — one
  [N, C] x [C, N] matmul instead of an O(N^2 C) broadcast subtract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_dist(x: jnp.ndarray, y: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Euclidean cdist for batched [B, N, C] x [B, M, C] -> [B, N, M]."""
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)           # [B,N,1]
    y2 = jnp.sum(y * y, axis=-1, keepdims=True)           # [B,M,1]
    xy = jnp.einsum("bnc,bmc->bnm", x, y)
    d2 = x2 + jnp.swapaxes(y2, -1, -2) - 2.0 * xy
    return jnp.sqrt(jnp.maximum(d2, eps))


def _k_smallest(dist: jnp.ndarray, k: int) -> jnp.ndarray:
    """k smallest values per row of [B, N, M] via k min+mask passes
    (TPU-friendly; masks exactly one occurrence per pass via argmin one-hot).

    Pass economy (r4, measured in tools/exp_student_anatomy.py): the min
    VALUE comes from ``jnp.min`` — bit-identical to gathering ``dd[argmin]``
    but a fusable reduce instead of a [B,N,1]-from-[B,N,M] gather — and the
    final pass skips the mask rewrite (nothing consumes it), saving a full
    [B,N,M] read+write."""
    big = jnp.asarray(jnp.finfo(dist.dtype).max, dist.dtype)
    vals = []
    dd = dist
    for i in range(k):
        vals.append(jnp.min(dd, axis=-1))                   # [B,N]
        if i + 1 < k:
            idx = jnp.argmin(dd, axis=-1)                   # [B,N]
            M = dd.shape[-1]
            dd = jnp.where(jax.nn.one_hot(idx, M, dtype=jnp.bool_), big, dd)
    return jnp.stack(vals, axis=-1)


def dpc_knn_cluster(
    x: jnp.ndarray,
    cluster_num: int,
    k: int = 5,
    key: jax.Array | None = None,
    density_noise: jnp.ndarray | None = None,
    use_kernel: bool | None = None,
):
    """DPC-KNN cluster assignment (reference models/ClusterMergeNet.py:68-128).

    Args:
      x: ``[B, N, C]`` tokens (already LayerNormed by the caller).
      cluster_num: static number of clusters.
      k: nearest-neighbor count for local density.
      key: PRNG key for the density tie-break noise; ``density_noise`` may be
        passed explicitly (tests use zeros for torch parity).
      use_kernel: route the [B,N,N] passes through the streaming Pallas
        kernels (ops/pallas/dpc_knn.py — dist tiles never touch HBM);
        defaults to True on TPU.  Same outputs (golden-tested exact on CPU).

    Returns:
      idx_cluster ``[B, N]`` int32 in [0, cluster_num), and
      index_down ``[B, cluster_num]`` the selected center token indices.
    """
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    if use_kernel:
        from .pallas.dpc_knn import dpc_knn_cluster_streamed
        return dpc_knn_cluster_streamed(
            x, cluster_num, k=k, key=key, density_noise=density_noise)
    B, N, C = x.shape
    dist = pairwise_dist(x, x) / (C ** 0.5)                # [B,N,N]

    # local density: k smallest distances (self included), exp(-mean(d^2)).
    # lax.top_k over 2500-wide rows costs ~37 ms on v5e (full sort); k passes
    # of min+mask cost ~1.3 ms for k=5 — 28x faster, exact same k values
    # (ties: argmin breaks them by first index, like torch.topk).
    dist_nearest = _k_smallest(dist, k)                    # [B,N,k]
    density = jnp.exp(-jnp.mean(dist_nearest ** 2, axis=-1))
    if density_noise is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        density_noise = jax.random.uniform(key, density.shape, dtype=density.dtype)
    density = density + density_noise * 1e-6

    # distance-to-higher-density-parent indicator
    higher = (density[:, None, :] > density[:, :, None]).astype(x.dtype)  # [B,i,j]
    dist_max = jnp.max(dist.reshape(B, -1), axis=-1)[:, None, None]
    parent_dist = jnp.min(dist * higher + dist_max * (1.0 - higher), axis=-1)  # [B,N]

    # centers: top-k of score = parent_dist * density
    score = parent_dist * density
    _, index_down = jax.lax.top_k(score, cluster_num)      # [B,K]

    # assign every token to the nearest selected center
    center_rows = jnp.take_along_axis(dist, index_down[:, :, None], axis=1)  # [B,K,N]
    idx_cluster = jnp.argmin(center_rows, axis=1).astype(jnp.int32)          # [B,N]

    # force each center into its own cluster id (reference :124-126)
    onecol = jax.nn.one_hot(index_down, N, dtype=jnp.int32)                  # [B,K,N]
    is_center = jnp.max(onecol, axis=1) > 0                                  # [B,N]
    center_id = jnp.argmax(jnp.swapaxes(onecol, 1, 2), axis=-1).astype(jnp.int32)  # [B,N]
    idx_cluster = jnp.where(is_center, center_id, idx_cluster)
    return idx_cluster, index_down


def merge_tokens(
    x: jnp.ndarray,
    idx_cluster: jnp.ndarray,
    cluster_num: int,
    token_weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Weighted scatter-mean of tokens into their clusters
    (reference models/ClusterMergeNet.py:131-180, index_add_ based).

    Implemented as one-hot matmuls: ``[B,N,K]^T x [B,N,C]`` rides the MXU and
    is differentiable w.r.t. both x and token_weight (the reference's
    index_add_ path is too; the cluster assignment itself is non-diff in both).

    x: [B,N,C]; idx_cluster: [B,N]; token_weight: [B,N,1] (default ones).
    Returns merged ``[B, cluster_num, C]``.
    """
    B, N, C = x.shape
    if token_weight is None:
        token_weight = jnp.ones((B, N, 1), dtype=x.dtype)
    w = token_weight[..., 0]                               # [B,N]
    onehot = jax.nn.one_hot(idx_cluster, cluster_num, dtype=x.dtype)  # [B,N,K]
    all_weight = jnp.einsum("bnk,bn->bk", onehot, w) + 1e-6           # [B,K]
    denom = jnp.einsum("bnk,bk->bn", onehot, all_weight)              # all_weight[idx]
    norm_w = w / denom
    x_merged = jnp.einsum("bnk,bnc->bkc", onehot * norm_w[..., None], x)
    return x_merged


def cluster_merge(
    x: jnp.ndarray,
    cluster_num: int,
    token_weight: jnp.ndarray | None = None,
    k: int = 5,
    key: jax.Array | None = None,
    density_noise: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """DPC-KNN + merge in one call; assignment runs under stop_gradient
    (the reference computes it in torch.no_grad, models/ClusterMergeNet.py:83)."""
    idx_cluster, _ = dpc_knn_cluster(
        jax.lax.stop_gradient(x), cluster_num, k=k, key=key, density_noise=density_noise
    )
    return merge_tokens(x, idx_cluster, cluster_num, token_weight)


def gene_guided_cluster(x: jnp.ndarray, omic1: jnp.ndarray,
                        omic2: jnp.ndarray) -> jnp.ndarray:
    """Gene-guided 2-way token assignment: each token joins the omic stream
    (tumor/immune) with the smaller mean distance
    (reference models/ClusterMergeNet.py:9-46)."""
    d1 = jnp.mean(pairwise_dist(x, omic1), axis=-1)
    d2 = jnp.mean(pairwise_dist(x, omic2), axis=-1)
    return (d1 > d2).astype(jnp.int32)
