"""Streaming DPC-KNN Pallas kernels: distance tiles never touch HBM.

The XLA path (ops/cluster.py, reference math models/ClusterMergeNet.py:68-128)
materializes the [B, N, N] pairwise-distance matrix (100 MB at production
B=4, N=2500) and then makes ~12 full passes over it: k min+mask passes for
the k-NN density, a masked min for the higher-density-parent distance, and a
global max.  Here the distance tiles are recomputed on the fly from ``x``
(flash-attention style) and live only in VMEM:

- kernel 1 (``_knn_kernel``): per (batch, token-tile), stream tiles of
  d2 = |xi|^2 + |xj|^2 - 2 xi.xj, maintain the k smallest d2 per token
  (exact multiset semantics — duplicates preserved via first-occurrence
  masking, matching the XLA path's argmin one-hot) and the per-token max.
- kernel 2 (``_parent_kernel``): given the densities from kernel 1, stream
  the same tiles and take the masked min of d2 over strictly-higher-density
  neighbors.

Layout: tiles are computed TRANSPOSED — d2t [Tc neighbors, T tokens] with
the reduction (neighbor) axis on SUBLANES — because TPU sublane reductions
are elementwise vreg folds (~4x cheaper than cross-lane shuffle trees).
The per-token accumulators are [KP, T] / [1, T] rows.

Everything runs in d2 space: sqrt, the 1e-12 clamp, and the 1/sqrt(C)
scaling are monotonic, so k-smallest/min/max commute with them and the
cheap [B, N]-sized transforms happen once in XLA afterwards.  The cluster
assignment is computed under stop_gradient by the caller (reference computes
it in torch.no_grad), so no custom VJP is needed.

``interpret=True`` runs on CPU for golden tests against the XLA path
(tests/test_ops.py::test_dpc_knn_streamed_matches_xla — exact, including
duplicate-token tie multiplicity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_TILE = 512      # token and neighbor tile (Npad = round_up(N, _TILE));
                 # 512 beats 256 on chip (tools/exp_dpc_iso.py: 1.56 vs
                 # 1.69 ms/call incl. ~1 ms dispatch — fewer grid steps)
_KPAD = 8        # k-smallest accumulator sublanes (k <= 8 supported)
_BIG = 3.0e38    # +inf stand-in that survives f32 arithmetic
_BIGI = 2 ** 30


def _round_up(x, m):
    return (x + m - 1) // m * m


def _d2t_tile(xr, xc, x2r, x2c):
    """[Tc, T] squared euclidean distances, neighbors on sublanes.

    xr [T, C] row-tile tokens, xc [Tc, C] neighbor tile, x2r [1, T],
    x2c [Tc, 1]."""
    xy = jnp.dot(xc, xr.T, preferred_element_type=jnp.float32)  # [Tc, T]
    return x2c + x2r - 2.0 * xy


def _k_extract(comb, k, kp):
    """k smallest along SUBLANES of ``comb`` [S, T] -> [KP, T]
    (KP-k pad rows = BIG).

    Exact multiset semantics: each pass removes ONE occurrence of the
    current min (first sublane occurrence), like the XLA path's argmin
    one-hot mask, so duplicated values keep their multiplicity."""
    sub = jax.lax.broadcasted_iota(jnp.int32, comb.shape, 0)
    outs = []
    for t in range(k):
        m = jnp.min(comb, axis=0, keepdims=True)          # [1, T]
        outs.append(m)
        if t + 1 < k:
            first = jnp.min(jnp.where(comb == m, sub, _BIGI),
                            axis=0, keepdims=True)
            comb = jnp.where(sub == first, _BIG, comb)
    outs += [jnp.full_like(outs[0], _BIG)] * (kp - k)
    return jnp.concatenate(outs, axis=0)                  # [KP, T]


def _k_merge(cur, d2m, k):
    """Merge a [KP, T] running k-smallest multiset with a [Tc, T] tile:
    tile-local extraction first, then a tiny [2*KP, T] merge.  The k
    smallest of a multiset union are contained in the union of each side's
    k smallest, so this equals extraction from the full union."""
    kp = cur.shape[0]
    tilek = _k_extract(d2m, k, kp)                        # [KP, T]
    return _k_extract(jnp.concatenate([cur, tilek], axis=0), k, kp)


def _knn_kernel(xr_ref, x2r_ref, xc_ref, x2c_ref, knn_ref, rmax_ref,
                *, k, n, tile):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        knn_ref[0] = jnp.full_like(knn_ref[0], _BIG)
        rmax_ref[0] = jnp.full_like(rmax_ref[0], -_BIG)

    d2t = _d2t_tile(xr_ref[0], xc_ref[0], x2r_ref[0], x2c_ref[0])
    sub = jax.lax.broadcasted_iota(jnp.int32, d2t.shape, 0) + j * tile
    valid = sub < n
    knn_ref[0] = _k_merge(knn_ref[0], jnp.where(valid, d2t, _BIG), k)
    rmax_ref[0] = jnp.maximum(
        rmax_ref[0],
        jnp.max(jnp.where(valid, d2t, -_BIG), axis=0, keepdims=True))


def _parent_kernel(xr_ref, x2r_ref, xc_ref, x2c_ref, dr_ref, dc_ref,
                   parent_ref):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        parent_ref[0] = jnp.full_like(parent_ref[0], _BIG)

    d2t = _d2t_tile(xr_ref[0], xc_ref[0], x2r_ref[0], x2c_ref[0])
    # strictly-higher-density neighbors only; padded tokens carry -inf
    # density so they never qualify (no iota mask needed here)
    higher = dc_ref[0] > dr_ref[0]                        # [Tc, T]
    parent_ref[0] = jnp.minimum(
        parent_ref[0],
        jnp.min(jnp.where(higher, d2t, _BIG), axis=0, keepdims=True))


def _stream_calls(x, k, interpret):
    """Shared padding + pallas_call plumbing. Returns (knn2 [B,N,k] d2
    values, rowmax2 [B,N], parent_fn(density [B,N]) -> parent_min_d2
    [B,N])."""
    B, N, C = x.shape
    tile = _TILE
    npad = _round_up(N, tile)
    xp = jnp.pad(x, ((0, 0), (0, npad - N), (0, 0)))
    x2 = jnp.sum(xp * xp, axis=-1)                        # [B, npad]
    x2_sub = x2[:, :, None]                               # [B, npad, 1]
    x2_lane = x2[:, None, :]                              # [B, 1, npad]
    grid = (B, npad // tile, npad // tile)

    row3 = lambda b, i, j: (b, i, 0)     # token tile rows of x
    col3 = lambda b, i, j: (b, j, 0)     # neighbor tile rows of x
    roww = lambda b, i, j: (b, 0, i)     # token tile, lane layout
    in_specs = [
        pl.BlockSpec((1, tile, C), row3),    # x tokens [T, C]
        pl.BlockSpec((1, 1, tile), roww),    # |x|^2 tokens [1, T]
        pl.BlockSpec((1, tile, C), col3),    # x neighbors [Tc, C]
        pl.BlockSpec((1, tile, 1), col3),    # |x|^2 neighbors [Tc, 1]
    ]
    acc = lambda b, i, j: (b, 0, i)
    knn2, rmax2 = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, n=N, tile=tile),
        grid=grid,
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, _KPAD, tile), acc),
                   pl.BlockSpec((1, 1, tile), acc)],
        out_shape=[jax.ShapeDtypeStruct((B, _KPAD, npad), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, npad), jnp.float32)],
        interpret=interpret,
    )(xp, x2_lane, xp, x2_sub)

    def parent_fn(density):
        dpad = jnp.pad(density, ((0, 0), (0, npad - N)),
                       constant_values=-jnp.inf)
        (parent2,) = pl.pallas_call(
            _parent_kernel,
            grid=grid,
            in_specs=in_specs + [pl.BlockSpec((1, 1, tile), roww),
                                 pl.BlockSpec((1, tile, 1), col3)],
            out_specs=[pl.BlockSpec((1, 1, tile), acc)],
            out_shape=[jax.ShapeDtypeStruct((B, 1, npad), jnp.float32)],
            interpret=interpret,
        )(xp, x2_lane, xp, x2_sub, dpad[:, None, :], dpad[:, :, None])
        return parent2[:, 0, :N]

    return jnp.swapaxes(knn2[:, :k, :N], 1, 2), rmax2[:, 0, :N], parent_fn


def dpc_knn_cluster_streamed(
    x: jnp.ndarray,
    cluster_num: int,
    k: int = 5,
    key: jax.Array | None = None,
    density_noise: jnp.ndarray | None = None,
    interpret: bool = False,
):
    """Drop-in for ops.cluster.dpc_knn_cluster (same returns/semantics,
    reference models/ClusterMergeNet.py:68-128) with the [B,N,N] passes
    streamed through VMEM.  See module docstring."""
    assert k <= _KPAD, f"k={k} > {_KPAD} accumulator sublanes"
    B, N, C = x.shape
    eps = 1e-12
    knn2, rmax2, parent_fn = _stream_calls(x.astype(jnp.float32), k, interpret)

    # density = exp(-mean(dist_k^2)); dist^2 = max(d2, eps) / C
    density = jnp.exp(-jnp.mean(jnp.maximum(knn2, eps), axis=-1) / C)
    if density_noise is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        density_noise = jax.random.uniform(key, density.shape,
                                           dtype=density.dtype)
    density = density + density_noise * 1e-6

    parent_min_d2 = parent_fn(density)
    scale = 1.0 / (C ** 0.5)
    dist_max = jnp.sqrt(jnp.maximum(jnp.max(rmax2, axis=1), eps)) * scale
    parent_dist = jnp.minimum(
        jnp.sqrt(jnp.maximum(parent_min_d2, eps)) * scale,
        dist_max[:, None])

    score = parent_dist * density
    _, index_down = jax.lax.top_k(score, cluster_num)     # [B, K]

    # nearest selected center; the [B, K, N] rows are recomputed from the
    # gathered centers (K is tiny) instead of gathered from a dist matrix
    # that no longer exists
    from ..cluster import pairwise_dist
    xc = jnp.take_along_axis(x, index_down[:, :, None], axis=1)  # [B,K,C]
    center_rows = pairwise_dist(xc, x) * scale                   # [B,K,N]
    idx_cluster = jnp.argmin(center_rows, axis=1).astype(jnp.int32)

    # force each center into its own cluster id (reference :124-126)
    onecol = jax.nn.one_hot(index_down, N, dtype=jnp.int32)
    is_center = jnp.max(onecol, axis=1) > 0
    center_id = jnp.argmax(jnp.swapaxes(onecol, 1, 2), axis=-1).astype(jnp.int32)
    idx_cluster = jnp.where(is_center, center_id, idx_cluster)
    return idx_cluster, index_down
