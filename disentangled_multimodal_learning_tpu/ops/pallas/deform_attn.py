"""Fused deformable-attention Pallas TPU kernel (the flagship hot op).

Future-direction notes (round 2+), from the retrieved acceleration literature
(PAPERS.md; patterns only): DEFA-style pruning-assisted grid sampling (skip
near-zero bilinear weights), QUILL-style cache-local tiling of the sampled kv
positions, and multi-scale parallel processing of the two magnification
branches could combine with the wide-layout CPB kernel below.


Computes, per (batch*head, query-tile):

    pos  = sign(gq - gkv) * log1p(|gq - gkv|)          # SwinV2 CPB input
    bias = MLP(pos)          # 2 -> 32 -> 32 -> 1, relu  (CPB, in VMEM)
    s    = q @ k^T + bias
    p    = softmax(s)                                   # returned as attn
    out  = dropout(p) @ v

replacing the unfused XLA path in models/deform_attention.py (reference math:
models/DeformableAttention2D.py:294-322 + CPB at :121-158).  The unfused path
materializes the CPB hiddens — [B*G, N, K, 32] = ~3 GB/layer at production
shapes — in HBM; here each query tile's hiddens live only in VMEM, and the
hand-written backward recomputes them tile-wise (flash-attention-style).

Dropout uses the TPU PRNG seeded per (bh, tile) so the backward regenerates
the identical mask without storing it.

Public entry: :func:`fused_deform_attention` (custom_vjp; differentiable wrt
q, k, v, grid_kv and the MLP params).  ``interpret=True`` runs on CPU for
golden tests against :func:`deform_attention_reference`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HID = 32  # CPB hidden width (reference dim // 4 = 128 // 4)


def _round_up(x, m):
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# shared tile math
# ---------------------------------------------------------------------------

def _flat3(x3):
    """[T, K, H] -> [T*K, H]: leading-dims collapse (the ONLY reshape flavor
    Mosaic supports; [T,K] -> [T*K,1] style lane relayouts do not lower)."""
    T, K, H = x3.shape
    return x3.reshape(T * K, H)


def _cpb_tile(gq, gkv, w1, b1, w2, b2, w3, b3):
    """Bias [T, K] + relu'd hiddens for a query tile.

    Layout strategy: (T, K)-shaped quantities are built rank-3 with HID on
    lanes, then collapsed to ``[T*K, HID]`` so the MLP runs as proper 2-D
    MXU matmuls (rank-3 dot_general degrades to T tiny batched matmuls).

    gq: [T, 2]; gkv: [K, 2]; returns (bias [T,K], h1 [T*K,HID], h2 [T*K,HID],
    h0x [T,K], h0y [T,K])."""
    T = gq.shape[0]
    K = gkv.shape[0]
    px = gq[:, 0:1] - gkv[:, 0][None, :]  # [T, K]
    py = gq[:, 1:2] - gkv[:, 1][None, :]
    h0x = jnp.sign(px) * jnp.log1p(jnp.abs(px))
    h0y = jnp.sign(py) * jnp.log1p(jnp.abs(py))
    h1_3 = (h0x[:, :, None] * w1[0][None, None, :]
            + h0y[:, :, None] * w1[1][None, None, :] + b1[None, None, :])
    h1 = jnp.maximum(_flat3(h1_3), 0.0)               # [T*K, HID]
    h2 = jnp.dot(h1, w2, preferred_element_type=jnp.float32) + b2[None, :]
    h2 = jnp.maximum(h2, 0.0)                         # [T*K, HID]
    bias3 = (h2 * w3[:, 0][None, :]).reshape(T, K, HID)
    bias = jnp.sum(bias3, axis=-1) + b3[0]            # [T,K] lane reduce
    return bias, h1, h2, h0x, h0y


def _dropout_mask(seed, bh, j, shape, rate):
    """Deterministic per-(bh, tile) dropout keep-mask (uniform >= rate)."""
    pltpu.prng_seed(seed + bh * 65537 + j * 257)
    bits = pltpu.prng_random_bits(shape)
    u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
    return (u >= rate).astype(jnp.float32)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(seed_ref, gq_ref, q_ref, k_ref, v_ref, gkv_ref,
                w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                out_ref, attn_ref, *, dropout_rate):
    bh = pl.program_id(0)
    j = pl.program_id(1)
    q = q_ref[0]       # [T, D]
    k = k_ref[0]       # [K, D]
    v = v_ref[0]
    gq = gq_ref[...]   # [T, 2]
    gkv = gkv_ref[0]   # [K, 2]

    bias, _, _, _, _ = _cpb_tile(gq, gkv, w1_ref[...], b1_ref[...],
                                 w2_ref[...], b2_ref[...], w3_ref[...],
                                 b3_ref[...])
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) + bias
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    attn_ref[0] = p
    if dropout_rate > 0.0:
        mask = _dropout_mask(seed_ref[0], bh, j, p.shape, dropout_rate)
        p = p * mask * (1.0 / (1.0 - dropout_rate))
    out_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(seed_ref, gq_ref, q_ref, k_ref, v_ref, gkv_ref,
                w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                attn_ref, gout_ref, gattn_ref,
                dq_ref, dk_ref, dv_ref, dgkv_ref,
                dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref, db3_ref,
                *, dropout_rate):
    bh = pl.program_id(0)
    j = pl.program_id(1)

    # zero accumulators at the right grid points (TPU grid is sequential)
    @pl.when(j == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)
        dgkv_ref[...] = jnp.zeros_like(dgkv_ref)

    @pl.when((bh == 0) & (j == 0))
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dw3_ref[...] = jnp.zeros_like(dw3_ref)
        db3_ref[...] = jnp.zeros_like(db3_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    gq = gq_ref[...]
    gkv = gkv_ref[0]
    p = attn_ref[0]          # [T, K] pre-dropout softmax
    g_out = gout_ref[0]      # [T, D]
    g_attn = gattn_ref[0]    # [T, K]
    T, K = p.shape

    if dropout_rate > 0.0:
        mask = _dropout_mask(seed_ref[0], bh, j, p.shape, dropout_rate)
        scale = 1.0 / (1.0 - dropout_rate)
        p_used = p * mask * scale
    else:
        mask = None
        p_used = p

    # out = p_used @ v ; attn output = p
    dv_ref[0] += jnp.dot(p_used.T, g_out, preferred_element_type=jnp.float32)
    dp = jnp.dot(g_out, v.T, preferred_element_type=jnp.float32)
    if mask is not None:
        dp = dp * mask * scale
    dp = dp + g_attn
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # [T, K]

    dq_ref[0] = jnp.dot(ds, k, preferred_element_type=jnp.float32)
    dk_ref[0] += jnp.dot(ds.T, q, preferred_element_type=jnp.float32)

    # --- CPB backward (recompute hiddens in VMEM) ---------------------------
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    w3 = w3_ref[...]
    bias, h1, h2, h0x, h0y = _cpb_tile(gq, gkv, w1, b1_ref[...], w2,
                                       b2_ref[...], w3, b3_ref[...])
    # MLP backward in flat [T*K, HID] layout (2-D MXU matmuls; row sums as
    # ones-matmuls — Mosaic cannot lower sublane reductions to rank-1).
    ones_rows = jnp.ones((1, T * K), jnp.float32)

    def _rowsum(x2d):  # [T*K, HID] -> [1, HID]
        return jnp.dot(ones_rows, x2d, preferred_element_type=jnp.float32)

    ds_flat_3 = ds[:, :, None] * jnp.ones((1, 1, HID), jnp.float32)
    ds_flat = _flat3(ds_flat_3)                               # [T*K, HID] bcast
    dw3_ref[...] += _rowsum(h2 * (ds_flat[:, :1] * jnp.ones((1, HID), jnp.float32)))
    ones_k1 = jnp.ones((HID, 1), jnp.float32)
    db3_ref[...] += jnp.dot(_rowsum(ds_flat), ones_k1,
                            preferred_element_type=jnp.float32) / HID
    dh2 = ds_flat[:, :1] * w3[:, 0][None, :]                  # [T*K, HID]
    dh2 = dh2 * (h2 > 0).astype(jnp.float32)
    dw2_ref[...] += jax.lax.dot_general(
        h1, dh2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # [HID, HID]
    db2_ref[...] += _rowsum(dh2)
    dh1 = jax.lax.dot_general(dh2, w2, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dh1 = dh1 * (h1 > 0).astype(jnp.float32)
    db1_ref[...] += _rowsum(dh1)
    h0x_flat = _flat3(h0x[:, :, None] * jnp.ones((1, 1, HID), jnp.float32))
    h0y_flat = _flat3(h0y[:, :, None] * jnp.ones((1, 1, HID), jnp.float32))
    dw1_ref[...] += jnp.concatenate([
        _rowsum(dh1 * h0x_flat), _rowsum(dh1 * h0y_flat)], axis=0)  # [2,HID]
    dh0x = jnp.sum((dh1 * w1[0][None, :]).reshape(T, K, HID), axis=-1)
    dh0y = jnp.sum((dh1 * w1[1][None, :]).reshape(T, K, HID), axis=-1)
    # d/dpos sign(pos)*log1p|pos| = 1/(1+|pos|)
    px = gq[:, 0:1] - gkv[:, 0][None, :]
    py = gq[:, 1:2] - gkv[:, 1][None, :]
    dpx = dh0x / (1.0 + jnp.abs(px))
    dpy = dh0y / (1.0 + jnp.abs(py))
    # pos = gq - gkv  =>  dgkv = -sum over queries; stored [2, K] (lane-major,
    # transposed to [K, 2] on the host side).  Sublane reductions lower badly
    # on Mosaic ("unsupported output implicit dimension"), so column sums are
    # expressed as ones-vector matmuls (MXU handles them natively).
    ones_row = jnp.ones((1, dpx.shape[0]), jnp.float32)
    dgkv_ref[0] += jnp.concatenate([
        -jnp.dot(ones_row, dpx, preferred_element_type=jnp.float32),
        -jnp.dot(ones_row, dpy, preferred_element_type=jnp.float32)], axis=0)


# ---------------------------------------------------------------------------
# public API with custom VJP
# ---------------------------------------------------------------------------

def _pad_n(x, n_pad, axis=1):
    pad = n_pad - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _call_fwd(q, k, v, grid_q, grid_kv, w1, b1, w2, b2, w3, b3, seed,
              dropout_rate, tile, interpret):
    # dropout masks are seeded per (bh, tile-index): with dropout active the
    # forward and backward must use the SAME tile, and the backward is VMEM-
    # capped at 32 — so clamp both to 32 when dropout is on.
    if dropout_rate > 0.0:
        tile = min(tile, 32)
    BH, N, D = q.shape
    K = k.shape[1]
    n_pad = _round_up(N, tile)
    qp = _pad_n(q, n_pad)
    gqp = _pad_n(grid_q, n_pad, axis=0)
    grid = (BH, n_pad // tile)

    out, attn = pl.pallas_call(
        functools.partial(_fwd_kernel, dropout_rate=dropout_rate),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # seed
            pl.BlockSpec((tile, 2), lambda bh, j: (j, 0)),            # grid_q
            pl.BlockSpec((1, tile, D), lambda bh, j: (bh, j, 0)),     # q
            pl.BlockSpec((1, K, D), lambda bh, j: (bh, 0, 0)),        # k
            pl.BlockSpec((1, K, D), lambda bh, j: (bh, 0, 0)),        # v
            pl.BlockSpec((1, K, 2), lambda bh, j: (bh, 0, 0)),        # grid_kv
            pl.BlockSpec(memory_space=pltpu.VMEM),                     # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),                     # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),                     # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),                     # b2
            pl.BlockSpec(memory_space=pltpu.VMEM),                     # w3
            pl.BlockSpec(memory_space=pltpu.VMEM),                     # b3
        ],
        out_specs=[
            pl.BlockSpec((1, tile, D), lambda bh, j: (bh, j, 0)),     # out
            pl.BlockSpec((1, tile, K), lambda bh, j: (bh, j, 0)),     # attn
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, n_pad, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, n_pad, K), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(seed, jnp.float32).reshape(1).astype(jnp.int32), gqp, qp,
      k, v, grid_kv, w1, b1, w2, b2, w3, b3)
    return out[:, :N], attn[:, :N]


def _call_bwd(res, gouts, dropout_rate, tile, interpret):
    (q, k, v, grid_q, grid_kv, w1, b1, w2, b2, w3, b3, seed, attn) = res
    g_out, g_attn = gouts
    # the backward keeps ~15 [tile, K, HID] rank-3 temporaries live in VMEM;
    # tile=32 keeps the scoped allocation under the 16 MB limit.  With
    # dropout the forward is clamped to the same tile (mask regeneration is
    # seeded per (bh, tile-index)).
    tile = min(tile, 32)
    BH, N, D = q.shape
    K = k.shape[1]
    n_pad = _round_up(N, tile)
    qp = _pad_n(q, n_pad)
    gqp = _pad_n(grid_q, n_pad, axis=0)
    attn_p = _pad_n(attn, n_pad)
    gout_p = _pad_n(g_out, n_pad)
    gattn_p = _pad_n(g_attn, n_pad)
    grid = (BH, n_pad // tile)

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, dropout_rate=dropout_rate),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # seed
            pl.BlockSpec((tile, 2), lambda bh, j: (j, 0)),            # grid_q
            pl.BlockSpec((1, tile, D), lambda bh, j: (bh, j, 0)),     # q
            pl.BlockSpec((1, K, D), lambda bh, j: (bh, 0, 0)),        # k
            pl.BlockSpec((1, K, D), lambda bh, j: (bh, 0, 0)),        # v
            pl.BlockSpec((1, K, 2), lambda bh, j: (bh, 0, 0)),        # grid_kv
            pl.BlockSpec(memory_space=pltpu.VMEM),                     # w1..b3
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, K), lambda bh, j: (bh, j, 0)),     # attn
            pl.BlockSpec((1, tile, D), lambda bh, j: (bh, j, 0)),     # g_out
            pl.BlockSpec((1, tile, K), lambda bh, j: (bh, j, 0)),     # g_attn
        ],
        out_specs=[
            pl.BlockSpec((1, tile, D), lambda bh, j: (bh, j, 0)),     # dq
            pl.BlockSpec((1, K, D), lambda bh, j: (bh, 0, 0)),        # dk
            pl.BlockSpec((1, K, D), lambda bh, j: (bh, 0, 0)),        # dv
            pl.BlockSpec((1, 2, K), lambda bh, j: (bh, 0, 0)),        # dgkv
            pl.BlockSpec(memory_space=pltpu.VMEM),                     # dw1..db3
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, n_pad, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, K, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, K, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, 2, K), jnp.float32),
            jax.ShapeDtypeStruct((2, HID), jnp.float32),
            jax.ShapeDtypeStruct((1, HID), jnp.float32),
            jax.ShapeDtypeStruct((HID, HID), jnp.float32),
            jax.ShapeDtypeStruct((1, HID), jnp.float32),
            jax.ShapeDtypeStruct((1, HID), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(seed, jnp.float32).reshape(1).astype(jnp.int32), gqp, qp,
      k, v, grid_kv, w1, b1, w2, b2, w3, b3, attn_p, gout_p, gattn_p)
    dq, dk, dv, dgkv2, dw1, db1, dw2, db2, dw3r, db3 = outs
    # seed is a float32 scalar by convention (so custom_vjp can emit a zero
    # cotangent for it); grid_q is static -> zero cotangent
    return (dq[:, :N], dk, dv, jnp.zeros_like(grid_q),
            jnp.swapaxes(dgkv2, 1, 2), dw1, db1[0], dw2, db2[0],
            dw3r[0][:, None], db3[0], jnp.zeros(()))


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14))
def fused_deform_attention(q, k, v, grid_q, grid_kv, w1, b1, w2, b2, w3, b3,
                           seed, dropout_rate=0.0, tile=128, interpret=False):
    """q [BH,N,D] (pre-scaled), k/v [BH,K,D], grid_q [N,2], grid_kv [BH,K,2],
    CPB params (w1 [2,32], b1 [32], w2 [32,32], b2 [32], w3 [32,1], b3 [1]),
    seed int32 scalar.  Returns (out [BH,N,D], attn [BH,N,K] pre-dropout)."""
    out, attn = _call_fwd(q, k, v, grid_q, grid_kv, w1, b1, w2, b2, w3, b3,
                          seed, dropout_rate, tile, interpret)
    return out, attn


def _vjp_fwd(q, k, v, grid_q, grid_kv, w1, b1, w2, b2, w3, b3, seed,
             dropout_rate, tile, interpret):
    out, attn = _call_fwd(q, k, v, grid_q, grid_kv, w1, b1, w2, b2, w3, b3,
                          seed, dropout_rate, tile, interpret)
    res = (q, k, v, grid_q, grid_kv, w1, b1, w2, b2, w3, b3, seed, attn)
    return (out, attn), res


def _vjp_bwd(dropout_rate, tile, interpret, res, gouts):
    return _call_bwd(res, gouts, dropout_rate, tile, interpret)


fused_deform_attention.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# jnp reference (golden for the kernel; mirrors the unfused module math)
# ---------------------------------------------------------------------------

def deform_attention_reference(q, k, v, grid_q, grid_kv, w1, b1, w2, b2, w3,
                               b3, dropout_mask=None, dropout_rate=0.0):
    pos = grid_q[None, :, None, :] - grid_kv[:, None, :, :]  # [BH,N,K,2]
    pos = jnp.sign(pos) * jnp.log1p(jnp.abs(pos))
    h1 = jax.nn.relu(pos @ w1 + b1)
    h2 = jax.nn.relu(h1 @ w2 + b2)
    bias = (h2 @ w3 + b3)[..., 0]                            # [BH,N,K]
    s = jnp.einsum("bnd,bkd->bnk", q, k) + bias
    s = s - jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
    p = jax.nn.softmax(s, axis=-1)
    p_used = p
    if dropout_mask is not None:
        p_used = p * dropout_mask / (1.0 - dropout_rate)
    out = jnp.einsum("bnk,bkd->bnd", p_used, v)
    return out, p


# ===========================================================================
# Flat CPB bias kernel (production path)
# ===========================================================================
# The fully-fused kernel above is correct but bottlenecked by Mosaic
# relayouts: any crossing between the (T, K)-2D attention layout and the
# (K, HID)-tiled rank-3 MLP layout costs ~18 ms at production scale.  The
# production path therefore fuses ONLY the CPB MLP — the actual HBM hog —
# in a relayout-free flat layout:
#
#   XLA:    gq_exp [N*K, 2] (repeat), gkv_rep [BH, T*K, 2] (tile)  ~12 MB
#   kernel: pos -> log-transform -> [rows,1]x[1,HID] lane-splat ->
#           2D MXU matmuls -> bias [rows, 1]
#   XLA:    reshape bias to [BH, N, K] (free) + attention as usual
#
# HBM traffic per attention: ~0.1 GB vs ~4.5 GB for the unfused MLP.

_CHUNK_T = 32  # queries per grid step; narrow [rows, 2] blocks are lane-padded
# to 128 lanes in VMEM, so the scoped-vmem budget is raised explicitly
_CPB_VMEM_LIMIT = 64 * 1024 * 1024


def _cpb_flat_fwd_kernel(gq_ref, gkv_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                         w3_ref, b3_ref, bias_ref):
    gq = gq_ref[...]     # [rows, 2]
    gkv = gkv_ref[0]     # [rows, 2]
    px = gq[:, 0:1] - gkv[:, 0:1]          # [rows, 1]
    py = gq[:, 1:2] - gkv[:, 1:2]
    fx = jnp.sign(px) * jnp.log1p(jnp.abs(px))
    fy = jnp.sign(py) * jnp.log1p(jnp.abs(py))
    w1 = w1_ref[...]
    h1 = jnp.maximum(fx * w1[0][None, :] + fy * w1[1][None, :]
                     + b1_ref[...][None, :], 0.0)          # [rows, HID]
    h2 = jnp.maximum(jnp.dot(h1, w2_ref[...],
                             preferred_element_type=jnp.float32)
                     + b2_ref[...][None, :], 0.0)
    bias_ref[0] = (jnp.dot(h2, w3_ref[...],
                           preferred_element_type=jnp.float32)
                   + b3_ref[...][None, :])


def _cpb_flat_bwd_kernel(gq_ref, gkv_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                         w3_ref, b3_ref, dbias_ref,
                         dgkv_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                         dw3_ref, db3_ref):
    bh = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((bh == 0) & (j == 0))
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dw3_ref[...] = jnp.zeros_like(dw3_ref)
        db3_ref[...] = jnp.zeros_like(db3_ref)

    @pl.when(j == 0)
    def _():
        dgkv_ref[...] = jnp.zeros_like(dgkv_ref)

    gq = gq_ref[...]
    gkv = gkv_ref[0]
    px = gq[:, 0:1] - gkv[:, 0:1]
    py = gq[:, 1:2] - gkv[:, 1:2]
    fx = jnp.sign(px) * jnp.log1p(jnp.abs(px))
    fy = jnp.sign(py) * jnp.log1p(jnp.abs(py))
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    w3 = w3_ref[...]
    h1 = jnp.maximum(fx * w1[0][None, :] + fy * w1[1][None, :]
                     + b1_ref[...][None, :], 0.0)
    h2 = jnp.maximum(jnp.dot(h1, w2, preferred_element_type=jnp.float32)
                     + b2_ref[...][None, :], 0.0)

    db = dbias_ref[0]                                     # [rows, 1]
    rows = db.shape[0]
    ones_rows = jnp.ones((1, rows), jnp.float32)

    dw3_ref[...] += jax.lax.dot_general(
        h2, db, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [HID, 1]
    db3_ref[...] += jnp.dot(ones_rows, db,
                            preferred_element_type=jnp.float32)[0]
    dh2 = db * w3[:, 0][None, :]                          # [rows, HID]
    dh2 = dh2 * (h2 > 0).astype(jnp.float32)
    dw2_ref[...] += jax.lax.dot_general(
        h1, dh2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.dot(ones_rows, dh2,
                            preferred_element_type=jnp.float32)[0]
    dh1 = jax.lax.dot_general(dh2, w2, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dh1 = dh1 * (h1 > 0).astype(jnp.float32)
    db1_ref[...] += jnp.dot(ones_rows, dh1,
                            preferred_element_type=jnp.float32)[0]
    dw1_ref[...] += jnp.concatenate([
        jnp.dot(ones_rows, dh1 * fx, preferred_element_type=jnp.float32),
        jnp.dot(ones_rows, dh1 * fy, preferred_element_type=jnp.float32)],
        axis=0)                                           # [2, HID]
    dfx = jnp.dot(dh1, w1[0][:, None], preferred_element_type=jnp.float32)
    dfy = jnp.dot(dh1, w1[1][:, None], preferred_element_type=jnp.float32)
    dpx = dfx / (1.0 + jnp.abs(px))
    dpy = dfy / (1.0 + jnp.abs(py))
    dgkv_ref[0] += -jnp.concatenate([dpx, dpy], axis=1)   # [rows, 2]


def _cpb_param_specs():
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(6)]


def _cpb_flat_call_fwd(gq_exp, gkv_rep, w1, b1, w2, b2, w3, b3, interpret):
    NK = gq_exp.shape[0]
    BH = gkv_rep.shape[0]
    rows = gkv_rep.shape[1]
    assert NK % rows == 0
    grid = (BH, NK // rows)
    bias = pl.pallas_call(
        _cpb_flat_fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, 2), lambda bh, j: (j, 0)),       # gq_exp
            pl.BlockSpec((1, rows, 2), lambda bh, j: (bh, 0, 0)),  # gkv_rep
        ] + _cpb_param_specs(),
        out_specs=pl.BlockSpec((1, rows, 1), lambda bh, j: (bh, j, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, NK, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_CPB_VMEM_LIMIT),
        interpret=interpret,
    )(gq_exp, gkv_rep, w1, b1, w2, b2, w3, b3)
    return bias[..., 0]  # [BH, NK]


def _cpb_flat_call_bwd(res, dbias, interpret):
    gq_exp, gkv_rep, w1, b1, w2, b2, w3, b3 = res
    NK = gq_exp.shape[0]
    BH = gkv_rep.shape[0]
    rows = gkv_rep.shape[1]
    grid = (BH, NK // rows)
    outs = pl.pallas_call(
        _cpb_flat_bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, 2), lambda bh, j: (j, 0)),
            pl.BlockSpec((1, rows, 2), lambda bh, j: (bh, 0, 0)),
        ] + _cpb_param_specs() + [
            pl.BlockSpec((1, rows, 1), lambda bh, j: (bh, j, 0)),  # dbias
        ],
        out_specs=[
            # dgkv accumulated over j in-kernel (sequential TPU grid)
            pl.BlockSpec((1, rows, 2), lambda bh, j: (bh, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, rows, 2), jnp.float32),
            jax.ShapeDtypeStruct((2, HID), jnp.float32),
            jax.ShapeDtypeStruct((HID,), jnp.float32),
            jax.ShapeDtypeStruct((HID, HID), jnp.float32),
            jax.ShapeDtypeStruct((HID,), jnp.float32),
            jax.ShapeDtypeStruct((HID, 1), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_CPB_VMEM_LIMIT),
        interpret=interpret,
    )(gq_exp, gkv_rep, w1, b1, w2, b2, w3, b3, dbias[..., None])
    dgkv_rep, dw1, db1, dw2, db2, dw3, db3 = outs
    return (jnp.zeros_like(gq_exp), dgkv_rep, dw1, db1, dw2, db2, dw3, db3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def cpb_bias_flat(gq_exp, gkv_rep, w1, b1, w2, b2, w3, b3, interpret=False):
    """Flat CPB bias: gq_exp [N*K, 2] (query coords repeated K times),
    gkv_rep [BH, T*K, 2] (kv coords tiled T times, T = chunk).
    Returns bias [BH, N*K]."""
    return _cpb_flat_call_fwd(gq_exp, gkv_rep, w1, b1, w2, b2, w3, b3,
                              interpret)


def _cpb_vjp_fwd(gq_exp, gkv_rep, w1, b1, w2, b2, w3, b3, interpret):
    bias = _cpb_flat_call_fwd(gq_exp, gkv_rep, w1, b1, w2, b2, w3, b3,
                              interpret)
    return bias, (gq_exp, gkv_rep, w1, b1, w2, b2, w3, b3)


def _cpb_vjp_bwd(interpret, res, dbias):
    return _cpb_flat_call_bwd(res, dbias, interpret)


cpb_bias_flat.defvjp(_cpb_vjp_fwd, _cpb_vjp_bwd)


def cpb_bias(grid_q, grid_kv, w1, b1, w2, b2, w3, b3, chunk_t: int = _CHUNK_T,
             interpret: bool = False):
    """User-facing CPB bias: grid_q [N, 2], grid_kv [BH, K, 2] ->
    bias [BH, N, K].  Differentiable wrt grid_kv and the MLP params."""
    N = grid_q.shape[0]
    BH, K, _ = grid_kv.shape
    n_pad = _round_up(N, chunk_t)
    gq_p = _pad_n(grid_q, n_pad, axis=0)
    gq_exp = jnp.repeat(gq_p, K, axis=0)                     # [n_pad*K, 2]
    gkv_rep = jnp.tile(grid_kv, (1, chunk_t, 1))             # [BH, chunk*K, 2]
    bias = cpb_bias_flat(gq_exp, gkv_rep, w1, b1, w2, b2, w3, b3, interpret)
    bias = bias.reshape(BH, n_pad, K)
    return bias[:, :N]


# ===========================================================================
# Wide CPB bias kernel (layout-correct: hidden on sublanes, positions on lanes)
# ===========================================================================
# Third iteration of the CPB fusion.  The flat kernel above still loses to
# XLA because its narrow [rows, 2]/[rows, 1] blocks lane-pad 64-128x in VMEM
# and every elementwise op runs at 1/128 lane utilization.  This version puts
# the HID=32 hidden dimension on SUBLANES and a wide chunk of positions on
# LANES:
#
#   h1   = outer(w1x, fx_chunk) + outer(w1y, fy_chunk) + b1    [HID, CH]
#   h2   = relu(W2^T @ h1 + b2)                                 [HID, CH]  MXU
#   bias = w3^T @ h2 + b3                                       [1,  CH]  MXU
#
# Every op is full-lane-width; the only reductions are lane reductions and
# ones-matmuls.  The sign*log1p transform runs in XLA (wide + autodiffed), so
# the kernel is differentiable w.r.t. (fx, fy, params) and JAX chains the
# gkv gradient through the XLA-side transform.

_WIDE_CHUNK = 7200  # 8*7200 divides BH*N*K at production shapes
# (32*2500*144): the jnp.pad fallback below copies the whole 46 MB
# stream (~0.7 ms/attention measured), so an exact-dividing chunk
# matters; shapes that do not divide still pad correctly.


def _cpb_wide_fwd_kernel(fx_ref, fy_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                         w3_ref, b3_ref, bias_ref):
    # 8 chunk-rows per grid step: (8, CH) HBM blocks avoid the 8x sublane
    # padding that [1, M]-shaped boundary arrays suffer (a 46 MB logical
    # tensor is 368 MB physical; measured ~3 ms/attention of pure padding
    # traffic on v5e).  Each row runs the wide MLP independently.
    fx = fx_ref[...]                                    # [8, CH]
    fy = fy_ref[...]
    w1 = w1_ref[...]                                    # [2, HID]
    b1c = b1_ref[...][:, None]
    b2c = b2_ref[...][:, None]
    w2 = w2_ref[...]
    w3 = w3_ref[...]
    b3 = b3_ref[...]
    rows = []
    for g in range(8):
        h1 = (w1[0][:, None] * fx[g:g + 1, :]
              + w1[1][:, None] * fy[g:g + 1, :] + b1c)  # [HID, CH]
        h1 = jnp.maximum(h1, 0.0)
        h2 = jax.lax.dot_general(w2, h1, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        h2 = jnp.maximum(h2 + b2c, 0.0)                 # [HID, CH]
        rows.append(jax.lax.dot_general(
            w3, h2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b3[0])
    bias_ref[...] = jnp.concatenate(rows, axis=0)       # [8, CH]


def _cpb_wide_bwd_kernel(fx_ref, fy_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                         w3_ref, b3_ref, dbias_ref,
                         dfx_ref, dfy_ref, dw1_ref, db1_ref, dw2_ref,
                         db2_ref, dw3_ref, db3_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dw3_ref[...] = jnp.zeros_like(dw3_ref)
        db3_ref[...] = jnp.zeros_like(db3_ref)

    fx = fx_ref[...]                                    # [8, CH]
    fy = fy_ref[...]
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    w3 = w3_ref[...]
    b1c = b1_ref[...][:, None]
    b2c = b2_ref[...][:, None]
    db8 = dbias_ref[...]                                # [8, CH]
    ones_h = jnp.ones((1, HID), jnp.float32)
    dfx_rows = []
    dfy_rows = []
    for g in range(8):
        fxg = fx[g:g + 1, :]
        fyg = fy[g:g + 1, :]
        h1 = jnp.maximum(w1[0][:, None] * fxg + w1[1][:, None] * fyg + b1c,
                         0.0)
        h2 = jax.lax.dot_general(w2, h1, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        h2 = jnp.maximum(h2 + b2c, 0.0)

        db = db8[g:g + 1, :]                            # [1, CH]
        # bias = w3^T h2 + b3
        dw3_ref[...] += jax.lax.dot_general(
            h2, db, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [HID, 1]
        db3_ref[...] += jnp.sum(db, axis=1, keepdims=True)
        dh2 = w3 * db                                   # [HID,1]*[1,CH]
        dh2 = dh2 * (h2 > 0).astype(jnp.float32)
        # h2 = W2^T h1 -> dW2 = h1 dh2^T, dh1 = W2 dh2
        dw2_ref[...] += jax.lax.dot_general(
            h1, dh2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [HID, HID]
        db2_ref[...] += jnp.sum(dh2, axis=1, keepdims=True)
        dh1 = jax.lax.dot_general(w2, dh2, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dh1 = dh1 * (h1 > 0).astype(jnp.float32)        # [HID, CH]
        db1_ref[...] += jnp.sum(dh1, axis=1, keepdims=True)
        # h1 = w1x fx + w1y fy + b1 (outer products)
        dw1_ref[...] += jnp.concatenate([
            jax.lax.dot_general(dh1, fxg, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32).T,
            jax.lax.dot_general(dh1, fyg, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32).T,
        ], axis=0)                                      # [2, HID]
        dfx_rows.append(jnp.dot(ones_h, dh1 * w1[0][:, None],
                                preferred_element_type=jnp.float32))
        dfy_rows.append(jnp.dot(ones_h, dh1 * w1[1][:, None],
                                preferred_element_type=jnp.float32))
    dfx_ref[...] = jnp.concatenate(dfx_rows, axis=0)    # [8, CH]
    dfy_ref[...] = jnp.concatenate(dfy_rows, axis=0)


def _cpb_wide_specs(extra=0):
    return ([pl.BlockSpec((8, _WIDE_CHUNK), lambda i: (i, 0))] * 2
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (6 + extra))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def cpb_bias_wide(fx, fy, w1, b1, w2, b2, w3, b3, interpret=False):
    """fx, fy: [M] flat log-transformed position diffs (padded to a multiple
    of the chunk); returns bias [M]."""
    return _cpb_wide_fwd(fx, fy, w1, b1, w2, b2, w3, b3, interpret)


def _cpb_wide_fwd(fx, fy, w1, b1, w2, b2, w3, b3, interpret):
    M = fx.shape[0]
    assert M % (8 * _WIDE_CHUNK) == 0
    R = M // _WIDE_CHUNK
    grid = (R // 8,)
    bias = pl.pallas_call(
        _cpb_wide_fwd_kernel,
        grid=grid,
        in_specs=_cpb_wide_specs(),
        out_specs=pl.BlockSpec((8, _WIDE_CHUNK), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((R, _WIDE_CHUNK), jnp.float32),
        interpret=interpret,
    )(fx.reshape(R, _WIDE_CHUNK), fy.reshape(R, _WIDE_CHUNK),
      w1, b1, w2, b2, w3, b3)
    return bias.reshape(M)


def _cpb_wide_vjp_fwd(fx, fy, w1, b1, w2, b2, w3, b3, interpret):
    bias = _cpb_wide_fwd(fx, fy, w1, b1, w2, b2, w3, b3, interpret)
    return bias, (fx, fy, w1, b1, w2, b2, w3, b3)


def _cpb_wide_vjp_bwd(interpret, res, dbias):
    fx, fy, w1, b1, w2, b2, w3, b3 = res
    M = fx.shape[0]
    R = M // _WIDE_CHUNK
    grid = (R // 8,)
    outs = pl.pallas_call(
        _cpb_wide_bwd_kernel,
        grid=grid,
        in_specs=_cpb_wide_specs() + [
            pl.BlockSpec((8, _WIDE_CHUNK), lambda i: (i, 0))],  # dbias
        out_specs=[
            pl.BlockSpec((8, _WIDE_CHUNK), lambda i: (i, 0)),   # dfx
            pl.BlockSpec((8, _WIDE_CHUNK), lambda i: (i, 0)),   # dfy
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, _WIDE_CHUNK), jnp.float32),
            jax.ShapeDtypeStruct((R, _WIDE_CHUNK), jnp.float32),
            jax.ShapeDtypeStruct((2, HID), jnp.float32),
            jax.ShapeDtypeStruct((HID, 1), jnp.float32),
            jax.ShapeDtypeStruct((HID, HID), jnp.float32),
            jax.ShapeDtypeStruct((HID, 1), jnp.float32),
            jax.ShapeDtypeStruct((HID, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(fx.reshape(R, _WIDE_CHUNK), fy.reshape(R, _WIDE_CHUNK),
      w1, b1, w2, b2, w3, b3, dbias.reshape(R, _WIDE_CHUNK))
    dfx, dfy, dw1, db1, dw2, db2, dw3, db3 = outs
    return (dfx.reshape(M), dfy.reshape(M), dw1, db1[:, 0], dw2, db2[:, 0],
            dw3, db3[0])


cpb_bias_wide.defvjp(_cpb_wide_vjp_fwd, _cpb_wide_vjp_bwd)


def cpb_bias_from_grids(grid_q, grid_kv, w1, b1, w2, b2, w3, b3,
                        interpret: bool = False):
    """Production CPB bias: grid_q [N,2], grid_kv [BH,K,2] -> bias [BH,N,K].
    XLA computes the wide sign*log1p position transform (autodiffed),
    cpb_bias_wide fuses the MLP so hiddens never touch HBM.

    Measured v5e negative result (round 2): the block-diagonal wide4 variant
    below (full-MXU [128,128] matmuls, log transform in-kernel) is SLOWER in
    production (isolated 7.6 vs 6.5 ms, in-module 11.8 vs 9.7 ms fwd+bwd at
    B=4) because its [R,4,2048] rank-3 input layout forces an XLA relayout of
    the flat position stream, which costs more than the MXU utilization win;
    [1, M] lanes-only blocks map to contiguous memory for free."""
    N = grid_q.shape[0]
    BH, K, _ = grid_kv.shape
    fx, fy = _log_pos_diff_flat(grid_q, grid_kv)
    M = fx.shape[0]
    M_pad = _round_up(M, 8 * _WIDE_CHUNK)
    if M_pad != M:
        fx = jnp.pad(fx, (0, M_pad - M))
        fy = jnp.pad(fy, (0, M_pad - M))
    bias = cpb_bias_wide(fx, fy, w1, b1, w2, b2, w3, b3, interpret)
    return bias[:M].reshape(BH, N, K)


@jax.custom_vjp
def _log_pos_diff_flat(grid_q, grid_kv):
    """(fx, fy) flat [BH*N*K]: sign(d)*log1p|d| of the query-kv position
    diffs, with a hand-written backward.

    JAX's automatic transpose of the broadcast-subtract reduces [BH, N, K]
    over the MIDDLE axis, which XLA lowers to a ~36 GB/s transpose fusion +
    slice-reduce (~4 ms of the 6.2 ms CPB fwd+bwd at production shapes,
    profiled on v5e); here the gkv reduction is an MXU contraction over q and
    the gq reduction is a lane+leading reduce, both fast paths."""
    def _f(c):
        d = grid_q[None, :, None, c] - grid_kv[:, None, :, c]
        return (jnp.sign(d) * jnp.log1p(jnp.abs(d))).reshape(-1)

    return _f(0), _f(1)


def _lpd_fwd(grid_q, grid_kv):
    return _log_pos_diff_flat(grid_q, grid_kv), (grid_q, grid_kv)


def _lpd_bwd(res, g):
    grid_q, grid_kv = res
    dfx, dfy = g
    N = grid_q.shape[0]
    BH, K, _ = grid_kv.shape
    ones_q = jnp.ones((N,), dfx.dtype)

    def one(c, df):
        d = grid_q[None, :, None, c] - grid_kv[:, None, :, c]
        dp = df.reshape(BH, N, K) / (1.0 + jnp.abs(d))
        dgq_c = dp.sum(axis=(0, 2))
        dgkv_c = -jnp.einsum("q,bqk->bk", ones_q, dp)
        return dgq_c, dgkv_c

    gqx, gkx = one(0, dfx)
    gqy, gky = one(1, dfy)
    return jnp.stack([gqx, gqy], -1), jnp.stack([gkx, gky], -1)


_log_pos_diff_flat.defvjp(_lpd_fwd, _lpd_bwd)


# ===========================================================================
# Wide4 CPB kernel (block-diagonal stacked: full 128-wide MXU utilization)
# ===========================================================================
# Fourth iteration.  The wide kernel's [32,32] x [32,CH] matmuls use 32/128
# sublanes and 32/128 contraction depth: 1/16 of the MXU.  Here FOUR position
# chunks are processed per matmul by stacking their hiddens on sublanes
# (4 x HID = 128 rows) against block-diagonal weights kron(I4, W):
#
#   h1s  = relu(w1xblk^T px + w1yblk^T py + b1s)        [128, CH]
#   h2s  = relu(W2blk^T h1s + b2s)                      [128, CH]   full MXU
#   bias = w3blk^T h2s + b3                             [4,  CH]
#
# The sign*log1p transform and its backward run IN-KERNEL (the XLA-side
# transform of the v1 path cost ~2.7 ms/attention in glue), so the inputs are
# raw position diffs px, py laid out [rows, CH] with rows consumed 4 per grid
# step.  4x redundant MACs, 16x better utilization => ~4x net.  All grads
# (params + positions) are computed by the hand-written backward kernel;
# block-structured param grads are folded back to [32]-sized params on host.

_W4_CHUNK = 2048  # lanes per grid step; 4 sublane rows => 8192 positions/step


def _w4_blocks(w1, b1, w2, b2, w3, b3):
    """Host-side block-diagonal stacking of the CPB params (param-sized, XLA
    fuses these into the surrounding graph)."""
    eye4 = jnp.eye(4, dtype=w1.dtype)
    w1xb = jnp.kron(eye4, w1[0:1, :])        # [4, 128]
    w1yb = jnp.kron(eye4, w1[1:2, :])        # [4, 128]
    w2b = jnp.kron(eye4, w2)                 # [128, 128]
    w3b = jnp.kron(eye4, w3)                 # [128, 4]
    b1s = jnp.tile(b1, 4)[:, None]           # [128, 1]
    b2s = jnp.tile(b2, 4)[:, None]           # [128, 1]
    return w1xb, w1yb, w2b, w3b, b1s, b2s


def _w4_fwd_kernel(px_ref, py_ref, w1xb_ref, w1yb_ref, b1s_ref, w2b_ref,
                   b2s_ref, w3b_ref, b3_ref, bias_ref):
    px = px_ref[0]                                      # [4, CH]
    py = py_ref[0]
    fx = jnp.sign(px) * jnp.log1p(jnp.abs(px))
    fy = jnp.sign(py) * jnp.log1p(jnp.abs(py))
    h1 = jax.lax.dot_general(w1xb_ref[...], fx, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    h1 = h1 + jax.lax.dot_general(w1yb_ref[...], fy, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1 + b1s_ref[...], 0.0)            # [128, CH]
    h2 = jax.lax.dot_general(w2b_ref[...], h1, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    h2 = jnp.maximum(h2 + b2s_ref[...], 0.0)            # [128, CH]
    bias_ref[0] = (jax.lax.dot_general(
        w3b_ref[...], h2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b3_ref[0, 0])  # [4, CH]


def _w4_bwd_kernel(px_ref, py_ref, w1xb_ref, w1yb_ref, b1s_ref, w2b_ref,
                   b2s_ref, w3b_ref, dbias_ref,
                   dpx_ref, dpy_ref, dw1xf_ref, dw1yf_ref, db1f_ref,
                   dw2f_ref, db2f_ref, dw3f_ref, db3f_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw1xf_ref[...] = jnp.zeros_like(dw1xf_ref)
        dw1yf_ref[...] = jnp.zeros_like(dw1yf_ref)
        db1f_ref[...] = jnp.zeros_like(db1f_ref)
        dw2f_ref[...] = jnp.zeros_like(dw2f_ref)
        db2f_ref[...] = jnp.zeros_like(db2f_ref)
        dw3f_ref[...] = jnp.zeros_like(dw3f_ref)
        db3f_ref[...] = jnp.zeros_like(db3f_ref)

    px = px_ref[0]
    py = py_ref[0]
    fx = jnp.sign(px) * jnp.log1p(jnp.abs(px))
    fy = jnp.sign(py) * jnp.log1p(jnp.abs(py))
    w1xb = w1xb_ref[...]
    w1yb = w1yb_ref[...]
    w2b = w2b_ref[...]
    w3b = w3b_ref[...]
    h1 = jax.lax.dot_general(w1xb, fx, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    h1 = h1 + jax.lax.dot_general(w1yb, fy, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1 + b1s_ref[...], 0.0)
    h2 = jax.lax.dot_general(w2b, h1, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    h2 = jnp.maximum(h2 + b2s_ref[...], 0.0)

    db = dbias_ref[0]                                    # [4, CH]
    # bias = w3b^T h2 + b3
    dw3f_ref[...] += jax.lax.dot_general(
        h2, db, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [128, 4]
    db3f_ref[...] += jnp.sum(db, axis=1, keepdims=True)  # [4, 1]
    dh2 = jax.lax.dot_general(w3b, db, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dh2 = dh2 * (h2 > 0).astype(jnp.float32)             # [128, CH]
    # h2 = w2b^T h1
    dw2f_ref[...] += jax.lax.dot_general(
        h1, dh2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [128, 128]
    db2f_ref[...] += jnp.sum(dh2, axis=1, keepdims=True)
    dh1 = jax.lax.dot_general(w2b, dh2, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dh1 = dh1 * (h1 > 0).astype(jnp.float32)             # [128, CH]
    db1f_ref[...] += jnp.sum(dh1, axis=1, keepdims=True)
    # h1 = w1xb^T fx + w1yb^T fy + b1s: param grads need fx broadcast to the
    # stacked rows; dot against dh1 contracts lanes directly instead:
    dw1xf_ref[...] += jax.lax.dot_general(
        fx, dh1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [4, 128]
    dw1yf_ref[...] += jax.lax.dot_general(
        fy, dh1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dfx = jax.lax.dot_general(w1xb, dh1, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [4, CH]
    dfy = jax.lax.dot_general(w1yb, dh1, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    # d sign(p)*log1p|p| / dp = 1/(1+|p|)
    dpx_ref[0] = dfx / (1.0 + jnp.abs(px))
    dpy_ref[0] = dfy / (1.0 + jnp.abs(py))


def _w4_param_specs():
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(7)]


def _w4_fwd(px2, py2, w1, b1, w2, b2, w3, b3, interpret):
    R4, four, CH = px2.shape
    assert CH == _W4_CHUNK and four == 4
    w1xb, w1yb, w2b, w3b, b1s, b2s = _w4_blocks(w1, b1, w2, b2, w3, b3)
    grid = (R4,)
    bias = pl.pallas_call(
        _w4_fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4, CH), lambda i: (i, 0, 0)),     # px
            pl.BlockSpec((1, 4, CH), lambda i: (i, 0, 0)),     # py
        ] + _w4_param_specs(),
        out_specs=pl.BlockSpec((1, 4, CH), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((R4, 4, CH), jnp.float32),
        interpret=interpret,
    )(px2, py2, w1xb, w1yb, b1s, w2b, b2s, w3b,
      b3.reshape(1, 1))
    return bias


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def cpb_bias_wide4(px2, py2, w1, b1, w2, b2, w3, b3, interpret=False):
    """Block-diagonal wide CPB: px2/py2 [R4, 4, 2048] raw position diffs;
    returns bias [R4, 4, 2048].  Differentiable wrt positions and all params;
    the log transform runs in-kernel."""
    return _w4_fwd(px2, py2, w1, b1, w2, b2, w3, b3, interpret)


def _w4_vjp_fwd(px2, py2, w1, b1, w2, b2, w3, b3, interpret):
    bias = _w4_fwd(px2, py2, w1, b1, w2, b2, w3, b3, interpret)
    return bias, (px2, py2, w1, b1, w2, b2, w3, b3)


def _w4_vjp_bwd(interpret, res, dbias):
    px2, py2, w1, b1, w2, b2, w3, b3 = res
    R4, _, CH = px2.shape
    w1xb, w1yb, w2b, w3b, b1s, b2s = _w4_blocks(w1, b1, w2, b2, w3, b3)
    grid = (R4,)
    outs = pl.pallas_call(
        _w4_bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4, CH), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 4, CH), lambda i: (i, 0, 0)),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(6)] + [
            pl.BlockSpec((1, 4, CH), lambda i: (i, 0, 0)),     # dbias
        ],
        out_specs=[
            pl.BlockSpec((1, 4, CH), lambda i: (i, 0, 0)),     # dpx
            pl.BlockSpec((1, 4, CH), lambda i: (i, 0, 0)),     # dpy
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(7)],
        out_shape=[
            jax.ShapeDtypeStruct((R4, 4, CH), jnp.float32),
            jax.ShapeDtypeStruct((R4, 4, CH), jnp.float32),
            jax.ShapeDtypeStruct((4, 128), jnp.float32),   # dw1x folded
            jax.ShapeDtypeStruct((4, 128), jnp.float32),   # dw1y folded
            jax.ShapeDtypeStruct((128, 1), jnp.float32),   # db1 folded
            jax.ShapeDtypeStruct((128, 128), jnp.float32),  # dw2 folded
            jax.ShapeDtypeStruct((128, 1), jnp.float32),   # db2 folded
            jax.ShapeDtypeStruct((128, 4), jnp.float32),   # dw3 folded
            jax.ShapeDtypeStruct((4, 1), jnp.float32),     # db3 folded
        ],
        interpret=interpret,
    )(px2, py2, w1xb, w1yb, b1s, w2b, b2s, w3b, dbias)
    dpx, dpy, dw1xf, dw1yf, db1f, dw2f, db2f, dw3f, db3f = outs

    # fold block-structured grads back onto the [32]-sized params:
    # stacked row index j = s*32 + h
    dw1x = dw1xf.reshape(4, 4, HID)  # [s_row, s_col, h]
    dw1x = jnp.einsum("ssh->h", dw1x)  # diagonal blocks only
    dw1y = jnp.einsum("ssh->h", dw1yf.reshape(4, 4, HID))
    dw1 = jnp.stack([dw1x, dw1y], axis=0)                # [2, HID]
    db1 = db1f[:, 0].reshape(4, HID).sum(axis=0)
    dw2 = dw2f.reshape(4, HID, 4, HID)
    dw2 = jnp.einsum("shsi->hi", dw2)
    db2 = db2f[:, 0].reshape(4, HID).sum(axis=0)
    dw3 = dw3f.reshape(4, HID, 4)
    dw3 = jnp.einsum("shs->h", dw3)[:, None]             # [HID, 1]
    db3 = db3f.sum().reshape(1)
    return dpx, dpy, dw1, db1, dw2, db2, dw3, db3


cpb_bias_wide4.defvjp(_w4_vjp_fwd, _w4_vjp_bwd)


@jax.custom_vjp
def _pos_diff(grid_q, grid_kv):
    """px, py [BH, N, K] = grid_q - grid_kv, with a hand-written backward.

    JAX's automatic transpose of the broadcast-subtract reduces [BH, N, K]
    over the MIDDLE axis, which XLA lowers to a ~36 GB/s transpose fusion
    (~5 ms per CPB call at production shapes — profiled on v5e); here the
    gkv reduction is expressed as an MXU dot over the contraction axis and
    the gq reduction as lane+leading reduces, both fast paths."""
    px = grid_q[None, :, None, 0] - grid_kv[:, None, :, 0]
    py = grid_q[None, :, None, 1] - grid_kv[:, None, :, 1]
    return px, py


def _pos_diff_fwd(grid_q, grid_kv):
    return _pos_diff(grid_q, grid_kv), (grid_q.shape[0], grid_kv.shape[0])


def _pos_diff_bwd(res, g):
    dpx, dpy = g
    N = dpx.shape[1]
    ones_q = jnp.ones((N,), dpx.dtype)
    # dgkv = -sum_q dp: contraction over q on the MXU (not a transpose)
    dgkv = -jnp.stack([jnp.einsum("q,bqk->bk", ones_q, dpx),
                       jnp.einsum("q,bqk->bk", ones_q, dpy)], axis=-1)
    # dgq = +sum_{bh,k} dp: lane reduce + leading reduce (both cheap)
    dgq = jnp.stack([dpx.sum(axis=(0, 2)), dpy.sum(axis=(0, 2))], axis=-1)
    return dgq, dgkv


_pos_diff.defvjp(_pos_diff_fwd, _pos_diff_bwd)


def cpb_bias_from_grids_w4(grid_q, grid_kv, w1, b1, w2, b2, w3, b3,
                           interpret: bool = False):
    """wide4 entry (kept as a tested negative result, see production
    docstring): only the raw position diffs are materialized by XLA; the log
    transform and the MLP run in the block-diagonal kernel."""
    N = grid_q.shape[0]
    BH, K, _ = grid_kv.shape
    M = BH * N * K
    M_pad = _round_up(M, 4 * _W4_CHUNK)

    px, py = _pos_diff(grid_q, grid_kv)

    def _flat(d):
        d = d.reshape(-1)
        if M_pad != M:
            d = jnp.pad(d, (0, M_pad - M))
        return d.reshape(M_pad // (4 * _W4_CHUNK), 4, _W4_CHUNK)

    bias = cpb_bias_wide4(_flat(px), _flat(py), w1, b1, w2, b2, w3, b3,
                          interpret)
    return bias.reshape(-1)[:M].reshape(BH, N, K)


# ===========================================================================
# Self-contained CPB kernel (v5: in-kernel position diffs + in-kernel dgkv)
# ===========================================================================
# Profiling the v1 path on v5e (B=4 production shapes) shows the MLP kernels
# cost ~1.1 ms while ~5 ms/attention is XLA glue: materializing fx/fy
# [BH,N,K] -> flat (relayout), and the backward's dgkv reduction over the
# MIDDLE axis of [BH,N,K] (a ~36 GB/s transpose fusion + slice-reduce).
#
# This kernel removes both crossings.  Chunks are ALIGNED: one grid step
# covers QC consecutive query rows x all K kv positions of ONE bh
# (CH = QC*K lanes), so
#   - the query part of the position diff is a precomputed CONSTANT
#     qp[x,y] [N/QC, 1, CH] (grid_q is static);
#   - the kv part is built in-kernel as gkv_row [1,K] @ S_k [K, CH] where
#     S_k[k, c] = (c mod K == k) -- an MXU matmul, no relayout;
#   - the backward's dgkv reduction is dpx [1, CH] contracted with S_k over
#     lanes -> [1, K], accumulated across the QC-chunks of each bh in VMEM.
# The only remaining layout crossings are the unavoidable flat <-> [BH,N,K]
# reshapes of bias/dbias at the attention boundary.
# grid_q is a static model constant, so its cotangent path is dead in
# production; this kernel returns a zero cotangent for it (documented).


def _cpb5_mlp_fwd(fx, fy, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref):
    """Wide-layout MLP on [1, CH] lanes: returns (bias [1, CH], h1, h2)."""
    w1 = w1_ref[...]
    h1 = jnp.maximum(w1[0][:, None] * fx + w1[1][:, None] * fy
                     + b1_ref[...][:, None], 0.0)          # [HID, CH]
    h2 = jax.lax.dot_general(w2_ref[...], h1, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    h2 = jnp.maximum(h2 + b2_ref[...][:, None], 0.0)       # [HID, CH]
    bias = (jax.lax.dot_general(w3_ref[...], h2, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            + b3_ref[0, 0])                                # [1, CH]
    return bias, h1, h2


def _cpb5_pos(qpx_ref, qpy_ref, gkvt_ref, sk_ref):
    """px, py [1, CH] for this chunk: constant query part minus the
    S_k-scattered kv part (all matmuls/VPU, no relayouts)."""
    sk = sk_ref[...]                                       # [K, CH]
    kx = jax.lax.dot_general(gkvt_ref[0, 0:1, :], sk, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ky = jax.lax.dot_general(gkvt_ref[0, 1:2, :], sk, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    px = qpx_ref[0] - kx                                   # [1, CH]
    py = qpy_ref[0] - ky
    fx = jnp.sign(px) * jnp.log1p(jnp.abs(px))
    fy = jnp.sign(py) * jnp.log1p(jnp.abs(py))
    return px, py, fx, fy


def _cpb5_fwd_kernel(qpx_ref, qpy_ref, gkvt_ref, sk_ref,
                     w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                     bias_ref):
    _, _, fx, fy = _cpb5_pos(qpx_ref, qpy_ref, gkvt_ref, sk_ref)
    bias, _, _ = _cpb5_mlp_fwd(fx, fy, w1_ref, b1_ref, w2_ref, b2_ref,
                               w3_ref, b3_ref)
    bias_ref[0] = bias


def _cpb5_bwd_kernel(qpx_ref, qpy_ref, gkvt_ref, sk_ref,
                     w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                     dbias_ref,
                     dgkvt_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                     dw3_ref, db3_ref, *, chunks_per_bh):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dw3_ref[...] = jnp.zeros_like(dw3_ref)
        db3_ref[...] = jnp.zeros_like(db3_ref)

    @pl.when(i % chunks_per_bh == 0)
    def _():
        dgkvt_ref[...] = jnp.zeros_like(dgkvt_ref)

    px, py, fx, fy = _cpb5_pos(qpx_ref, qpy_ref, gkvt_ref, sk_ref)
    _, h1, h2 = _cpb5_mlp_fwd(fx, fy, w1_ref, b1_ref, w2_ref, b2_ref,
                              w3_ref, b3_ref)
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    w3 = w3_ref[...]

    db = dbias_ref[0]                                      # [1, CH]
    dw3_ref[...] += jax.lax.dot_general(
        h2, db, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # [HID, 1]
    db3_ref[...] += jnp.sum(db, axis=1, keepdims=True)     # [1, 1]
    dh2 = w3 * db                                          # [HID, CH]
    dh2 = dh2 * (h2 > 0).astype(jnp.float32)
    dw2_ref[...] += jax.lax.dot_general(
        h1, dh2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # [HID, HID]
    db2_ref[...] += jnp.sum(dh2, axis=1, keepdims=True)
    dh1 = jax.lax.dot_general(w2, dh2, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dh1 = dh1 * (h1 > 0).astype(jnp.float32)               # [HID, CH]
    db1_ref[...] += jnp.sum(dh1, axis=1, keepdims=True)
    dw1_ref[...] += jnp.concatenate([
        jnp.sum(dh1 * fx, axis=1, keepdims=True),
        jnp.sum(dh1 * fy, axis=1, keepdims=True)], axis=1).T  # [2, HID]
    ones_h = jnp.ones((1, HID), jnp.float32)
    dfx = jnp.dot(ones_h, dh1 * w1[0][:, None],
                  preferred_element_type=jnp.float32)      # [1, CH]
    dfy = jnp.dot(ones_h, dh1 * w1[1][:, None],
                  preferred_element_type=jnp.float32)
    dpx = dfx / (1.0 + jnp.abs(px))
    dpy = dfy / (1.0 + jnp.abs(py))
    # d kv = -sum over queries: contract lanes against S_k -> [1, K]
    sk = sk_ref[...]
    dgkvt_ref[0, 0:1, :] += -jax.lax.dot_general(
        dpx, sk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dgkvt_ref[0, 1:2, :] += -jax.lax.dot_general(
        dpy, sk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _cpb5_qchunk(N: int, K: int, target: int = 7200) -> int:
    """Largest divisor of N with qchunk*K <= target (falls back to 1)."""
    best = 1
    for d in range(1, N + 1):
        if N % d == 0 and d * K <= target:
            best = d
    return best


def _cpb5_consts(grid_q, K: int, qc: int):
    """Constant chunk-layout tensors (XLA folds these: grid_q is static)."""
    N = grid_q.shape[0]
    CH = qc * K
    # qp[x,y]: [N/qc, 1, CH]; position c of chunk j is query j*qc + c//K
    qp = jnp.repeat(grid_q, K, axis=0).reshape(N // qc, 1, CH, 2)
    sk = (jax.lax.broadcasted_iota(jnp.int32, (K, CH), 1) % K
          == jax.lax.broadcasted_iota(jnp.int32, (K, CH), 0)
          ).astype(jnp.float32)                            # [K, CH]
    return qp[..., 0], qp[..., 1], sk


def _cpb5_fwd_call(grid_q, grid_kv, w1, b1, w2, b2, w3, b3, interpret):
    N = grid_q.shape[0]
    BH, K, _ = grid_kv.shape
    qc = _cpb5_qchunk(N, K)
    CH = qc * K
    nq = N // qc
    qpx, qpy, sk = _cpb5_consts(grid_q, K, qc)
    gkvt = jnp.swapaxes(grid_kv, 1, 2)                     # [BH, 2, K]
    grid = (BH * nq,)
    bias = pl.pallas_call(
        _cpb5_fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, CH), lambda i, nq=nq: (i % nq, 0, 0)),  # qpx
            pl.BlockSpec((1, 1, CH), lambda i, nq=nq: (i % nq, 0, 0)),  # qpy
            pl.BlockSpec((1, 2, K), lambda i, nq=nq: (i // nq, 0, 0)),  # gkvt
            pl.BlockSpec(memory_space=pltpu.VMEM),                      # sk
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(6)],
        out_specs=pl.BlockSpec((1, 1, CH), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BH * nq, 1, CH), jnp.float32),
        interpret=interpret,
    )(qpx, qpy, gkvt, sk, w1, b1, w2, b2, w3, b3.reshape(1, 1))
    return bias.reshape(BH, N, K)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def cpb_bias_grids_fused(grid_q, grid_kv, w1, b1, w2, b2, w3, b3,
                         interpret=False):
    """Self-contained CPB: grid_q [N,2] (STATIC; zero cotangent),
    grid_kv [BH,K,2], MLP params -> bias [BH,N,K].  Position diffs, the log
    transform, the MLP, and the dgkv reduction all run in-kernel."""
    return _cpb5_fwd_call(grid_q, grid_kv, w1, b1, w2, b2, w3, b3, interpret)


def _cpb5_vjp_fwd(grid_q, grid_kv, w1, b1, w2, b2, w3, b3, interpret):
    bias = _cpb5_fwd_call(grid_q, grid_kv, w1, b1, w2, b2, w3, b3, interpret)
    return bias, (grid_q, grid_kv, w1, b1, w2, b2, w3, b3)


def _cpb5_vjp_bwd(interpret, res, dbias):
    grid_q, grid_kv, w1, b1, w2, b2, w3, b3 = res
    N = grid_q.shape[0]
    BH, K, _ = grid_kv.shape
    qc = _cpb5_qchunk(N, K)
    CH = qc * K
    nq = N // qc
    qpx, qpy, sk = _cpb5_consts(grid_q, K, qc)
    gkvt = jnp.swapaxes(grid_kv, 1, 2)
    grid = (BH * nq,)
    outs = pl.pallas_call(
        functools.partial(_cpb5_bwd_kernel, chunks_per_bh=nq),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, CH), lambda i, nq=nq: (i % nq, 0, 0)),
            pl.BlockSpec((1, 1, CH), lambda i, nq=nq: (i % nq, 0, 0)),
            pl.BlockSpec((1, 2, K), lambda i, nq=nq: (i // nq, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(6)] + [
            pl.BlockSpec((1, 1, CH), lambda i: (i, 0, 0)),              # dbias
        ],
        out_specs=[
            pl.BlockSpec((1, 2, K), lambda i, nq=nq: (i // nq, 0, 0)),  # dgkvt
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, 2, K), jnp.float32),
            jax.ShapeDtypeStruct((2, HID), jnp.float32),
            jax.ShapeDtypeStruct((HID, 1), jnp.float32),
            jax.ShapeDtypeStruct((HID, HID), jnp.float32),
            jax.ShapeDtypeStruct((HID, 1), jnp.float32),
            jax.ShapeDtypeStruct((HID, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qpx, qpy, gkvt, sk, w1, b1, w2, b2, w3, b3.reshape(1, 1),
      dbias.reshape(BH * nq, 1, CH))
    dgkvt, dw1, db1, dw2, db2, dw3, db3 = outs
    return (jnp.zeros_like(grid_q), jnp.swapaxes(dgkvt, 1, 2),
            dw1, db1[:, 0], dw2, db2[:, 0], dw3, db3[0])


cpb_bias_grids_fused.defvjp(_cpb5_vjp_fwd, _cpb5_vjp_bwd)


# ===========================================================================
# Transposed CPB kernel (v7: (bh, k, n) stream order — the production winner)
# ===========================================================================
# In the v1 path the expensive part is not the MLP kernel (~1.0 ms) but the
# XLA glue around it: materializing the fx/fy position streams ([BH,N,K] ->
# flat relayouts, 92 MB per attention per direction) and the backward's
# dfx/dfy streams + middle-axis dgkv reduction.  Transposing the stream
# order to (bh, k, n) makes both parts collapse:
#   - within one row (all N queries of ONE (bh, k) pair) the kv coordinate
#     is a per-row SCALAR and the query coordinates are one static [2, N]
#     VMEM constant (grid_q is a model constant) — position diffs are two
#     VPU broadcasts, nothing crosses HBM;
#   - the dgkv reduction is a lane-sum of the row, emitted as a tiny
#     [R, 2] array (R = BH*K), reduced per-bh by XLA for free.
# The bias comes out in [BH, K, N] layout; DeformCrossAttention2D's "kn"
# attention layout (models/deform_attention.py) computes sim/softmax/PV in
# the same layout, so no transpose ever materializes.  The consistency
# losses contract attention maps over all trailing axes and are layout-
# independent (train/losses.py).

_T_ROWS = 8  # (bh, k) rows per grid step; f32 sublane tile


def _cpbt_mlp_row(fx, fy, w1, b1c, w2, b2c, w3, b3):
    """Wide MLP on one [1, N] row pair -> (bias [O, N] — one row per output
    head-channel of w3 [HID, O] — plus h1 [HID, N], h2)."""
    h1 = jnp.maximum(w1[0][:, None] * fx + w1[1][:, None] * fy + b1c, 0.0)
    h2 = jax.lax.dot_general(w2, h1, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    h2 = jnp.maximum(h2 + b2c, 0.0)
    bias = (jax.lax.dot_general(w3, h2, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            + b3[:, None])
    return bias, h1, h2


def _cpbt_row_pos(qp, gkv, g):
    """px, py, fx, fy [1, N] for block row g (kv coord is a scalar)."""
    px = qp[0:1, :] - gkv[g:g + 1, 0:1]
    py = qp[1:2, :] - gkv[g:g + 1, 1:2]
    fx = jnp.sign(px) * jnp.log1p(jnp.abs(px))
    fy = jnp.sign(py) * jnp.log1p(jnp.abs(py))
    return px, py, fx, fy


def _cpbt_fwd_kernel(qp_ref, gkv_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                     w3_ref, b3_ref, *bias_refs):
    qp = qp_ref[...]                                   # [2, N] static coords
    gkv = gkv_ref[...]                                 # [_T_ROWS, 2]
    w1 = w1_ref[...]
    b1c = b1_ref[...][:, None]
    b2c = b2_ref[...][:, None]
    w2 = w2_ref[...]
    w3 = w3_ref[...]
    b3 = b3_ref[...]
    n_out = len(bias_refs)
    rows = [[] for _ in range(n_out)]
    for g in range(_T_ROWS):
        _, _, fx, fy = _cpbt_row_pos(qp, gkv, g)
        bias, _, _ = _cpbt_mlp_row(fx, fy, w1, b1c, w2, b2c, w3, b3)
        for o in range(n_out):
            rows[o].append(bias[o:o + 1, :])
    for o in range(n_out):
        bias_refs[o][...] = jnp.concatenate(rows[o], axis=0)  # [_T_ROWS, N]


def _cpbt_bwd_kernel(qp_ref, gkv_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                     w3_ref, b3_ref, *refs):
    n_out = (len(refs) - 7)
    dbias_refs = refs[:n_out]
    (dgkv_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
     dw3_ref, db3_ref) = refs[n_out:]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dw3_ref[...] = jnp.zeros_like(dw3_ref)
        db3_ref[...] = jnp.zeros_like(db3_ref)

    qp = qp_ref[...]
    gkv = gkv_ref[...]
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    w3 = w3_ref[...]
    b1c = b1_ref[...][:, None]
    b2c = b2_ref[...][:, None]
    b3 = b3_ref[...]
    db_alls = [r[...] for r in dbias_refs]             # n_out x [_T_ROWS, N]
    dg_rows = []
    for g in range(_T_ROWS):
        px, py, fx, fy = _cpbt_row_pos(qp, gkv, g)
        _, h1, h2 = _cpbt_mlp_row(fx, fy, w1, b1c, w2, b2c, w3, b3)
        db = jnp.concatenate([d[g:g + 1, :] for d in db_alls],
                             axis=0)                   # [O, N]
        dw3_ref[...] += jax.lax.dot_general(
            h2, db, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [HID, O]
        db3_ref[...] += jnp.sum(db, axis=1, keepdims=True)  # [O, 1]
        dh2 = jax.lax.dot_general(w3, db, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dh2 = dh2 * (h2 > 0).astype(jnp.float32)
        dw2_ref[...] += jax.lax.dot_general(
            h1, dh2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [HID, HID]
        db2_ref[...] += jnp.sum(dh2, axis=1, keepdims=True)
        dh1 = jax.lax.dot_general(w2, dh2, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dh1 = dh1 * (h1 > 0).astype(jnp.float32)       # [HID, N]
        db1_ref[...] += jnp.sum(dh1, axis=1, keepdims=True)
        dw1_ref[...] += jnp.concatenate([
            jax.lax.dot_general(fx, dh1, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32),
            jax.lax.dot_general(fy, dh1, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)],
            axis=0)                                    # [2, HID]
        dfx = jax.lax.dot_general(w1[0:1, :], dh1, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dfy = jax.lax.dot_general(w1[1:2, :], dh1, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dpx = dfx / (1.0 + jnp.abs(px))                # [1, N]
        dpy = dfy / (1.0 + jnp.abs(py))
        dg_rows.append(jnp.concatenate([
            -jnp.sum(dpx, axis=1, keepdims=True),
            -jnp.sum(dpy, axis=1, keepdims=True)], axis=1))  # [1, 2]
    dgkv_ref[...] = jnp.concatenate(dg_rows, axis=0)   # [_T_ROWS, 2]


def _cpbt_fwd_call(grid_q, grid_kv, w1, b1, w2, b2, w3, b3, interpret):
    N = grid_q.shape[0]
    BH, K, _ = grid_kv.shape
    O = w3.shape[1]
    R = BH * K
    R_pad = _round_up(R, _T_ROWS)
    qp = grid_q.T                                      # [2, N]
    gkv_rows = _pad_n(grid_kv.reshape(R, 2), R_pad, axis=0)
    grid = (R_pad // _T_ROWS,)
    biases = pl.pallas_call(
        _cpbt_fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),              # qp [2,N]
            pl.BlockSpec((_T_ROWS, 2), lambda i: (i, 0)),       # gkv rows
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=[pl.BlockSpec((_T_ROWS, N), lambda i: (i, 0))] * O,
        out_shape=[jax.ShapeDtypeStruct((R_pad, N), jnp.float32)] * O,
        interpret=interpret,
    )(qp, gkv_rows, w1, b1, w2, b2, w3, b3)
    if O == 1:
        return biases[0][:R].reshape(BH, K, N)
    return jnp.stack([bo[:R].reshape(BH, K, N) for bo in biases], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def cpb_bias_transposed(grid_q, grid_kv, w1, b1, w2, b2, w3, b3,
                        interpret=False):
    """Transposed-layout CPB: grid_q [N,2] (STATIC; zero cotangent),
    grid_kv [BH,K,2], MLP params -> bias [BH, K, N] (kv-major) when
    w3 [HID, 1], or [BH, O, K, N] for O output head-channels (the 1-D CPB
    has heads/offset_groups = 2; the shared MLP recompute is done once per
    row for all channels).  Position diffs, the log transform and the dgkv
    reduction all run in-kernel; no [BH*N*K] position streams touch HBM."""
    return _cpbt_fwd_call(grid_q, grid_kv, w1, b1, w2, b2, w3, b3, interpret)


def _cpbt_vjp_fwd(grid_q, grid_kv, w1, b1, w2, b2, w3, b3, interpret):
    bias = _cpbt_fwd_call(grid_q, grid_kv, w1, b1, w2, b2, w3, b3, interpret)
    return bias, (grid_q, grid_kv, w1, b1, w2, b2, w3, b3)


def _cpbt_vjp_bwd(interpret, res, dbias):
    grid_q, grid_kv, w1, b1, w2, b2, w3, b3 = res
    N = grid_q.shape[0]
    BH, K, _ = grid_kv.shape
    O = w3.shape[1]
    R = BH * K
    R_pad = _round_up(R, _T_ROWS)
    qp = grid_q.T
    gkv_rows = _pad_n(grid_kv.reshape(R, 2), R_pad, axis=0)
    if O == 1:
        dbs = [_pad_n(dbias.reshape(R, N), R_pad, axis=0)]
    else:
        dbs = [_pad_n(dbias[:, o].reshape(R, N), R_pad, axis=0)
               for o in range(O)]                      # zero rows in pad
    grid = (R_pad // _T_ROWS,)
    outs = pl.pallas_call(
        _cpbt_bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((_T_ROWS, 2), lambda i: (i, 0)),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
          + [pl.BlockSpec((_T_ROWS, N), lambda i: (i, 0))] * O,  # dbias
        out_specs=[
            pl.BlockSpec((_T_ROWS, 2), lambda i: (i, 0)),       # dgkv rows
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R_pad, 2), jnp.float32),
            jax.ShapeDtypeStruct((2, HID), jnp.float32),
            jax.ShapeDtypeStruct((HID, 1), jnp.float32),
            jax.ShapeDtypeStruct((HID, HID), jnp.float32),
            jax.ShapeDtypeStruct((HID, 1), jnp.float32),
            jax.ShapeDtypeStruct((HID, O), jnp.float32),
            jax.ShapeDtypeStruct((O, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qp, gkv_rows, w1, b1, w2, b2, w3, b3, *dbs)
    dgkv, dw1, db1, dw2, db2, dw3, db3 = outs
    return (jnp.zeros_like(grid_q), dgkv[:R].reshape(BH, K, 2),
            dw1, db1[:, 0], dw2, db2[:, 0], dw3, db3[:, 0])


cpb_bias_transposed.defvjp(_cpbt_vjp_fwd, _cpbt_vjp_bwd)


# ===========================================================================
# Fused kn-layout deformable attention (v8: CPB + sim + softmax + PV in one
# kernel, transposed (bh, k, n) world — the production attention path)
# ===========================================================================
# With the "kn" layout established (v7), the whole attention body fuses into
# one kernel per (b, h): the CPB bias rows build in VMEM scratch (position
# diffs from the static [2, N] query constant + per-row kv scalars), sim is
# one [K,D]x[N,D]^T MXU contraction, softmax reduces over the SUBLANE axis
# (max: native sublane reduce; sum: ones-matmul), and PV contracts sublanes
# again.  Nothing but q/k/v/out/attn crosses HBM — the [K, N] sim and bias
# never materialize.  Dropout is seeded per (bh) with the TPU PRNG and
# regenerated in the backward, so no mask is stored.
#
# MEASURED NEGATIVE RESULT (v5e, production shapes [32, 2500, 64], K=144,
# interleaved min-of-5 to defeat tunnel noise): fwd+bwd 4.45 ms vs 4.05 for
# the v7 kernel + XLA composition; with dropout 0.1, 4.58 vs 3.89.  The
# composition wins because XLA runs the sim and PV einsums in bf16 with
# well-scheduled fused softmax/dropout, while this kernel's f32 dot_generals
# and per-(bh) grid give no traffic advantage once the attn map must be
# materialized for the consistency losses anyway.  Kept golden-tested as
# the fallback for a future no-attn-output path (where sim/attn never
# touching HBM WOULD cut traffic).

_KN_KB = 8  # CPB rows built per fori step (sublane tile)


def _kn_cpb_chunk(qp, gkv_ref, i, KB, w1, b1c, w2, b2c, w3, b3):
    """KB consecutive bias rows [KB, N] for kv rows i*KB.. (VMEM only)."""
    rows = []
    for g in range(KB):
        gx = gkv_ref[0, pl.ds(i * KB + g, 1), :]       # [1, 2]
        px = qp[0:1, :] - gx[:, 0:1]
        py = qp[1:2, :] - gx[:, 1:2]
        fx = jnp.sign(px) * jnp.log1p(jnp.abs(px))
        fy = jnp.sign(py) * jnp.log1p(jnp.abs(py))
        h1 = jnp.maximum(w1[0][:, None] * fx + w1[1][:, None] * fy + b1c,
                         0.0)                          # [HID, N]
        h2 = jax.lax.dot_general(w2, h1, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        h2 = jnp.maximum(h2 + b2c, 0.0)
        rows.append(jax.lax.dot_general(w3, h2, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                    + b3[0])
    return jnp.concatenate(rows, axis=0)


def _kn_softmax(sim, K):
    """Softmax over the sublane (kv) axis of [K, N]."""
    m = jnp.max(sim, axis=0, keepdims=True)            # sublane max [1, N]
    e = jnp.exp(sim - m)
    denom = jax.lax.dot_general(jnp.ones((1, K), jnp.float32), e,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    return e * (1.0 / denom)


def _kn_dropout_mask(seed_ref, bh, shape, rate):
    pltpu.prng_seed(seed_ref[0] + bh * 65537)
    bits = pltpu.prng_random_bits(shape)
    u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
    return (u >= rate).astype(jnp.float32)


def _kn_fwd_kernel(seed_ref, qp_ref, gkv_ref, q_ref, k_ref, v_ref,
                   w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                   out_ref, attn_ref, bias_scratch, *, KB, dropout_rate):
    bh = pl.program_id(0)
    K, N = attn_ref.shape[1], attn_ref.shape[2]
    qp = qp_ref[...]
    w1 = w1_ref[...]
    b1c = b1_ref[...][:, None]
    b2c = b2_ref[...][:, None]
    w2 = w2_ref[...]
    w3 = w3_ref[...]
    b3 = b3_ref[...]

    def body(i, _):
        bias_scratch[pl.ds(i * KB, KB), :] = _kn_cpb_chunk(
            qp, gkv_ref, i, KB, w1, b1c, w2, b2c, w3, b3)
        return 0

    jax.lax.fori_loop(0, K // KB, body, 0)

    q = q_ref[0]                                       # [N, D] (pre-scaled)
    k = k_ref[0]                                       # [K, D]
    v = v_ref[0]
    sim = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [K, N]
    p = _kn_softmax(sim + bias_scratch[...], K)
    attn_ref[0] = p                                    # pre-dropout
    if dropout_rate > 0.0:
        mask = _kn_dropout_mask(seed_ref, bh, p.shape, dropout_rate)
        p = p * mask * (1.0 / (1.0 - dropout_rate))
    out_ref[0] = jax.lax.dot_general(p, v, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)


def _kn_bwd_kernel(seed_ref, qp_ref, gkv_ref, q_ref, k_ref, v_ref,
                   w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                   attn_ref, gout_ref, gattn_ref,
                   dq_ref, dk_ref, dv_ref, dgkv_ref,
                   dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref, db3_ref,
                   bias_scratch, *, KB, dropout_rate):
    bh = pl.program_id(0)

    @pl.when(bh == 0)
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dw3_ref[...] = jnp.zeros_like(dw3_ref)
        db3_ref[...] = jnp.zeros_like(db3_ref)

    K, N = gattn_ref.shape[1], gattn_ref.shape[2]
    qp = qp_ref[...]
    w1 = w1_ref[...]
    b1c = b1_ref[...][:, None]
    b2c = b2_ref[...][:, None]
    w2 = w2_ref[...]
    w3 = w3_ref[...]
    b3 = b3_ref[...]

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    # the forward's attn output IS the softmax residual — read it back
    # (46 MB) instead of recomputing the whole CPB+sim+softmax chain (~1 ms)
    p = attn_ref[0]                                    # [K, N] pre-dropout

    g_out = gout_ref[0]                                # [N, D]
    g_attn = gattn_ref[0]                              # [K, N]

    if dropout_rate > 0.0:
        mask = _kn_dropout_mask(seed_ref, bh, p.shape, dropout_rate)
        scale = 1.0 / (1.0 - dropout_rate)
        p_used = p * mask * scale
    else:
        mask = None
        p_used = p

    dv_ref[0] = jax.lax.dot_general(p_used, g_out, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(v, g_out, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [K, N]
    if mask is not None:
        dp = dp * mask * scale
    dp = dp + g_attn
    colsum = jax.lax.dot_general(jnp.ones((1, K), jnp.float32), p * dp,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    ds = p * (dp - colsum)                             # [K, N]
    dq_ref[0] = jax.lax.dot_general(ds, k, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    dk_ref[0] = jax.lax.dot_general(ds, q, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)

    # --- CPB backward: recompute rows, consume ds rows from scratch --------
    bias_scratch[...] = ds

    def bwd_body(i, _):
        for g in range(KB):
            gx = gkv_ref[0, pl.ds(i * KB + g, 1), :]
            px = qp[0:1, :] - gx[:, 0:1]
            py = qp[1:2, :] - gx[:, 1:2]
            fx = jnp.sign(px) * jnp.log1p(jnp.abs(px))
            fy = jnp.sign(py) * jnp.log1p(jnp.abs(py))
            h1 = jnp.maximum(w1[0][:, None] * fx + w1[1][:, None] * fy + b1c,
                             0.0)
            h2 = jax.lax.dot_general(w2, h1, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            h2 = jnp.maximum(h2 + b2c, 0.0)
            db = bias_scratch[pl.ds(i * KB + g, 1), :]  # ds row [1, N]
            dw3_ref[...] += jax.lax.dot_general(
                h2, db, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            db3_ref[...] += jnp.sum(db, axis=1, keepdims=True)
            dh2 = w3 * db
            dh2 = dh2 * (h2 > 0).astype(jnp.float32)
            dw2_ref[...] += jax.lax.dot_general(
                h1, dh2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            db2_ref[...] += jnp.sum(dh2, axis=1, keepdims=True)
            dh1 = jax.lax.dot_general(w2, dh2, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            dh1 = dh1 * (h1 > 0).astype(jnp.float32)
            db1_ref[...] += jnp.sum(dh1, axis=1, keepdims=True)
            dw1_ref[...] += jnp.concatenate([
                jax.lax.dot_general(fx, dh1, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32),
                jax.lax.dot_general(fy, dh1, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)],
                axis=0)
            dfx = jax.lax.dot_general(w1[0:1, :], dh1,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            dfy = jax.lax.dot_general(w1[1:2, :], dh1,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            dpx = dfx / (1.0 + jnp.abs(px))
            dpy = dfy / (1.0 + jnp.abs(py))
            dgkv_ref[0, pl.ds(i * KB + g, 1), :] = jnp.concatenate([
                -jnp.sum(dpx, axis=1, keepdims=True),
                -jnp.sum(dpy, axis=1, keepdims=True)], axis=1)
        return 0

    jax.lax.fori_loop(0, K // KB, bwd_body, 0)


def _kn_kb(K: int):
    """CPB chunk rows: 8 when it divides K, else K itself for small K."""
    if K % _KN_KB == 0:
        return _KN_KB
    if K <= _KN_KB:
        return K
    raise ValueError(
        f"fused kn kernel requires K <= {_KN_KB} or K % {_KN_KB} == 0, "
        f"got K={K}")


_KN_VMEM_LIMIT = 100 * 1024 * 1024


def _kn_call_fwd(q, k, v, grid_q, grid_kv, w1, b1, w2, b2, w3, b3, seed,
                 dropout_rate, interpret):
    BH, N, D = q.shape
    K = k.shape[1]
    KB = _kn_kb(K)
    out, attn = pl.pallas_call(
        functools.partial(_kn_fwd_kernel, KB=KB, dropout_rate=dropout_rate),
        grid=(BH,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),              # seed
            pl.BlockSpec(memory_space=pltpu.VMEM),              # qp [2,N]
            pl.BlockSpec((1, K, 2), lambda i: (i, 0, 0)),       # grid_kv
            pl.BlockSpec((1, N, D), lambda i: (i, 0, 0)),       # q
            pl.BlockSpec((1, K, D), lambda i: (i, 0, 0)),       # k
            pl.BlockSpec((1, K, D), lambda i: (i, 0, 0)),       # v
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=[
            pl.BlockSpec((1, N, D), lambda i: (i, 0, 0)),       # out
            pl.BlockSpec((1, K, N), lambda i: (i, 0, 0)),       # attn
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, N, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, K, N), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((K, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_KN_VMEM_LIMIT),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.float32).reshape(1).astype(jnp.int32),
      grid_q.T, grid_kv, q, k, v, w1, b1, w2, b2, w3, b3)
    return out, attn


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13))
def fused_deform_attention_kn(q, k, v, grid_q, grid_kv, w1, b1, w2, b2, w3,
                              b3, seed, dropout_rate=0.0, interpret=False):
    """Fused kn-layout deformable attention.

    q [BH,N,D] (PRE-scaled), k/v [BH,K,D], grid_q [N,2] (STATIC; zero
    cotangent), grid_kv [BH,K,2], CPB MLP params, seed (int scalar; dropout
    masks are seeded per (bh) and regenerated in the backward).  Returns
    (out [BH,N,D], attn [BH,K,N] pre-dropout, kv-major).
    """
    out, attn = _kn_call_fwd(q, k, v, grid_q, grid_kv, w1, b1, w2, b2, w3,
                             b3, seed, dropout_rate, interpret)
    return out, attn


def _kn_vjp_fwd(q, k, v, grid_q, grid_kv, w1, b1, w2, b2, w3, b3, seed,
                dropout_rate, interpret):
    out, attn = _kn_call_fwd(q, k, v, grid_q, grid_kv, w1, b1, w2, b2, w3,
                             b3, seed, dropout_rate, interpret)
    return (out, attn), (q, k, v, grid_q, grid_kv, w1, b1, w2, b2, w3, b3,
                         seed, attn)


def _kn_vjp_bwd(dropout_rate, interpret, res, gouts):
    q, k, v, grid_q, grid_kv, w1, b1, w2, b2, w3, b3, seed, attn = res
    g_out, g_attn = gouts
    BH, N, D = q.shape
    K = k.shape[1]
    KB = _kn_kb(K)
    outs = pl.pallas_call(
        functools.partial(_kn_bwd_kernel, KB=KB, dropout_rate=dropout_rate),
        grid=(BH,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 2), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, N, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, K, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, K, D), lambda i: (i, 0, 0)),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6 + [
            pl.BlockSpec((1, K, N), lambda i: (i, 0, 0)),       # attn (fwd)
            pl.BlockSpec((1, N, D), lambda i: (i, 0, 0)),       # g_out
            pl.BlockSpec((1, K, N), lambda i: (i, 0, 0)),       # g_attn
        ],
        out_specs=[
            pl.BlockSpec((1, N, D), lambda i: (i, 0, 0)),       # dq
            pl.BlockSpec((1, K, D), lambda i: (i, 0, 0)),       # dk
            pl.BlockSpec((1, K, D), lambda i: (i, 0, 0)),       # dv
            pl.BlockSpec((1, K, 2), lambda i: (i, 0, 0)),       # dgkv
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, N, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, K, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, K, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, K, 2), jnp.float32),
            jax.ShapeDtypeStruct((2, HID), jnp.float32),
            jax.ShapeDtypeStruct((HID, 1), jnp.float32),
            jax.ShapeDtypeStruct((HID, HID), jnp.float32),
            jax.ShapeDtypeStruct((HID, 1), jnp.float32),
            jax.ShapeDtypeStruct((HID, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((K, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_KN_VMEM_LIMIT),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.float32).reshape(1).astype(jnp.int32),
      grid_q.T, grid_kv, q, k, v, w1, b1, w2, b2, w3, b3, attn, g_out,
      g_attn)
    dq, dk, dv, dgkv, dw1, db1, dw2, db2, dw3, db3 = outs
    return (dq, dk, dv, jnp.zeros_like(grid_q), dgkv, dw1, db1[:, 0], dw2,
            db2[:, 0], dw3, db3[0], jnp.zeros(()))


fused_deform_attention_kn.defvjp(_kn_vjp_fwd, _kn_vjp_bwd)


# ===========================================================================
# Table-interpolated CPB (v9: lattice + bilinear window — approximate)
# ===========================================================================
# The CPB bias MLP is evaluated at BH*K*N relative positions per attention
# (11.5M at production shapes) — the teacher's measured bottleneck at ~55%
# of the practical f32 matmul rate (PERF.md).  But the QUERY positions are a
# fixed uniform grid (deform_attention.py:376-377): for one kv point p, the
# bias row over all N queries is the smooth scalar field
#     T(d) = MLP(sign(d) * log1p|d|),   d = q - p,
# sampled on a uniform lattice whose fractional shift is the only thing
# that depends on p.  So: evaluate T ONCE per step on a lattice of spacing
# (query spacing / divisor) — ~300k points instead of 11.5M — and produce
# each bias row as a bilinear blend of four lattice windows.  Because the
# query spacing is an integer multiple (the divisor) of the lattice spacing,
# the bilinear weights are PER-ROW SCALARS and the four taps are contiguous
# windows of the phase-decomposed table: no per-element gathers anywhere.
#
# Accuracy (tools/exp_cpb_table_acc.py, production geometry, random CPB
# weights at 1-2x init scale): divisor 4 gives max bias error ~1.4e-3 of
# the bias dynamic range and post-softmax attention-probability error
# ~1e-5..8e-4 — below the bf16 noise already accepted in the attention
# matmuls.  Exact CPB stays the default; this is opt-in via
# cfg.cpb_table_divisor (see models/deform_attention.py).
#
# Decomposition:
#   - table build + phase reshape + shift computation: plain XLA,
#     differentiable (MLP-weight and grid_kv gradients flow through it);
#   - `_table_interp(tablep, shifts)`: the Pallas kernel (custom VJP).
# The kernel's backward scatters the window cotangents back into a table
# cotangent (sequential-grid accumulation, like the v7 weight grads) and
# emits per-row shift cotangents via the bilinear weight derivatives.

_TBL_ROWS = 8  # (bh, k) rows per grid step; f32 sublane tile

# bf16 interp output streams (r5, cfg.cpb_table_bf16): the interpolation
# arithmetic stays f32 in-kernel; only the window STORE quantizes to bf16,
# halving (a) the kernel's output write, (b) the [R,side,side]->[BH,K,N]
# relayout traffic, and (c) the bias-add read in the attention — and the
# mirrored backward streams (the window cotangent arrives bf16 and is
# upcast per-row in-kernel; dtab/dsh accumulate in f32).  Natural follow-on
# to ATTN_BF16_STREAMS: the bias feeds a bf16 sim stream anyway.
TBL_BF16_OUT = False


def _tbl_out_dtype():
    return jnp.bfloat16 if TBL_BF16_OUT else jnp.float32


def _tbl_win_rows(side):
    """Aligned sublane window: Mosaic only allows dynamic sublane-slice
    starts that are multiples of 8, so windows load 8-aligned and rotate
    by the residue.  No wrap contamination: residue + side <= window."""
    return _round_up(side + 8, 8)


def _tbl_read(tab_ref, b, side):
    """rows [b, b+side) of tab_ref via an 8-aligned load + sublane roll."""
    win = _tbl_win_rows(side)
    b0 = (b // 8) * 8
    rem = b - b0
    t = tab_ref[pl.ds(b0, win), :]
    return pltpu.roll(t, win - rem, axis=0)[:side, :]


def _tbl_sum2d(x):
    """Full [S, L] -> [1, 1] sum (ones-matmul over sublanes, lane reduce).

    MUST run at full-f32 precision: the shift-cotangent sums it feeds
    cancel heavily (terms O(1), result O(1e-2)), so the TPU default
    bf16-pass MXU truncation puts a ~5e-2 REL error on dsh (measured,
    tools/exp_v10_dshprobe.py: default 4.8e-2, HIGHEST 2.4e-6; interpret
    mode is f32-exact, which is why CPU goldens never caught it)."""
    r = jax.lax.dot_general(jnp.ones((1, x.shape[0]), jnp.float32), x,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    return jnp.sum(r, axis=1, keepdims=True)


def _tbl_fwd_kernel(idx_ref, frac_ref, tab_ref, out_ref):
    side = out_ref.shape[1]
    cn = tab_ref.shape[1]
    for g in range(_TBL_ROWS):
        b00 = idx_ref[g, 0]
        b10 = idx_ref[g, 1]
        b01 = idx_ref[g, 2]
        b11 = idx_ref[g, 3]
        ox0 = idx_ref[g, 4]
        ox1 = idx_ref[g, 5]
        fy = frac_ref[g, 0]
        fx = frac_ref[g, 1]
        ty0 = (_tbl_read(tab_ref, b00, side) * (1.0 - fy)
               + _tbl_read(tab_ref, b10, side) * fy)
        ty1 = (_tbl_read(tab_ref, b01, side) * (1.0 - fy)
               + _tbl_read(tab_ref, b11, side) * fy)
        a = pltpu.roll(ty0, cn - ox0, axis=1)[:, :side]
        b = pltpu.roll(ty1, cn - ox1, axis=1)[:, :side]
        out_ref[g] = (a * (1.0 - fx) + b * fx).astype(out_ref.dtype)


def _tbl_bwd_kernel(idx_ref, frac_ref, tab_ref, db_ref, dtab_ref, dsh_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dtab_ref[...] = jnp.zeros_like(dtab_ref)

    side = db_ref.shape[1]
    cn = tab_ref.shape[1]
    dsh_rows = []
    for g in range(_TBL_ROWS):
        b00 = idx_ref[g, 0]
        b10 = idx_ref[g, 1]
        b01 = idx_ref[g, 2]
        b11 = idx_ref[g, 3]
        ox0 = idx_ref[g, 4]
        ox1 = idx_ref[g, 5]
        fy = frac_ref[g, 0]
        fx = frac_ref[g, 1]
        dw = db_ref[g].astype(jnp.float32)                 # [side, side]
        w00 = _tbl_read(tab_ref, b00, side)                # [side, cn]
        w10 = _tbl_read(tab_ref, b10, side)
        w01 = _tbl_read(tab_ref, b01, side)
        w11 = _tbl_read(tab_ref, b11, side)
        win = _tbl_win_rows(side)
        dwpad = jnp.pad(dw, ((0, win - side), (0, cn - side)))
        s0 = pltpu.roll(dwpad, ox0, axis=1)
        s1 = pltpu.roll(dwpad, ox1, axis=1)
        # shift cotangents WITHOUT lane-rolling the taps into window frame:
        # sum(dw * roll(X, cn-ox)) == sum(roll(dwpad, ox) * X), so both
        # blend derivatives contract the scattered dw (s0/s1, which the
        # RMWs below need anyway) against raw table windows.
        ty0f = w00 * (1.0 - fy) + w10 * fy
        ty1f = w01 * (1.0 - fy) + w11 * fy
        dfx = _tbl_sum2d(s1[:side, :] * ty1f - s0[:side, :] * ty0f)
        dfy = _tbl_sum2d((s0[:side, :] * (w10 - w00)) * (1.0 - fx)
                         + (s1[:side, :] * (w11 - w01)) * fx)
        dsh_rows.append(jnp.concatenate([dfy, dfx], axis=1))  # [1, 2]

        # four 8-aligned read-modify-writes (scatter rows rolled DOWN by the
        # alignment residue); in-order ref accesses keep overlapping windows
        # (divisor 1) correct
        def _acc(b, s, coeff):
            b0_ = (b // 8) * 8
            rem = b - b0_
            cur = dtab_ref[pl.ds(b0_, win), :]
            dtab_ref[pl.ds(b0_, win), :] = (
                cur + pltpu.roll(s, rem, axis=0) * coeff)

        _acc(b00, s0, (1.0 - fy) * (1.0 - fx))
        _acc(b10, s0, fy * (1.0 - fx))
        _acc(b01, s1, (1.0 - fy) * fx)
        _acc(b11, s1, fy * fx)
    dsh_ref[...] = jnp.concatenate(dsh_rows, axis=0)       # [_TBL_ROWS, 2]


def _tbl_split_rows(side, rn):
    """Rows per copy in the lane-split layout (8-aligned so copy B's rows
    stay 8-aligned in the stacked table)."""
    return _round_up(rn + _tbl_win_rows(side), 8)


def _tbl_idx(shifts, side, divisor, rn, split=0):
    """Continuous (ty, tx) [R, 2] -> int taps [R, 6] + fracs [R, 2].

    Full-lattice index iy decomposes as (phase iy % d, row iy // d); the
    window's stride-d rows are then CONTIGUOUS rows of phase-block
    (py*d + px)*rn + oy of the phase-decomposed table.

    ``split`` (divisor 1 only): the table's ``rn`` lanes are stored as TWO
    stacked 128-lane copies — lanes [0, 128) and lanes [split, rn) with
    ``split = rn - 128`` — so every lane-wise kernel pass runs at half
    width when rn would pad to 256.  A row's windows (x-taps ox and ox+1,
    each ``side`` wide) always fit entirely in one copy; the selector
    rewrites (row, ox) into the chosen copy's frame and the kernels are
    untouched."""
    d = divisor
    hi = (rn - side) * d + d - 2       # keep oy + side <= rn for iy and iy+1
    i0 = jnp.clip(jnp.floor(shifts), 0.0, float(hi))
    frac = (shifts - i0).astype(jnp.float32)
    i0 = i0.astype(jnp.int32)
    i1 = i0 + 1
    py0, oy0 = i0[:, 0] % d, i0[:, 0] // d
    py1, oy1 = i1[:, 0] % d, i1[:, 0] // d
    px0, ox0 = i0[:, 1] % d, i0[:, 1] // d
    px1, ox1 = i1[:, 1] % d, i1[:, 1] // d
    rows = [(py0 * d + px0) * rn + oy0,
            (py1 * d + px0) * rn + oy1,
            (py0 * d + px1) * rn + oy0,
            (py1 * d + px1) * rn + oy1]
    if split:
        assert divisor == 1, "lane-split layout is divisor-1 only"
        c = (ox0 > 127 - side).astype(jnp.int32)   # ox+1 window must fit A
        rows = [r + c * _tbl_split_rows(side, rn) for r in rows]
        ox0 = ox0 - c * split
        ox1 = ox1 - c * split
    idx = jnp.stack(rows + [ox0, ox1], axis=1).astype(jnp.int32)
    return idx, frac


def _tbl_interp_ref(tablep, shifts, side, divisor, rn, split=0):
    """jnp reference of the interpolation (CPU path + kernel golden)."""
    idx, frac = _tbl_idx(shifts, side, divisor, rn, split)

    def one(ivec, fvec):
        def win(b, ox):
            t = jax.lax.dynamic_slice(tablep, (b, 0), (side,
                                                       tablep.shape[1]))
            return jnp.roll(t, -ox, axis=1)[:, :side]

        fy, fx = fvec[0], fvec[1]
        a = win(ivec[0], ivec[4]) * (1 - fy) + win(ivec[1], ivec[4]) * fy
        b = win(ivec[2], ivec[5]) * (1 - fy) + win(ivec[3], ivec[5]) * fy
        return (a * (1 - fx) + b * fx).astype(_tbl_out_dtype())

    return jax.vmap(one)(idx, frac)


def _tbl_d1_fwd_kernel(idx_ref, frac_ref, tab_ref, out_ref):
    """Divisor-1 specialization of :func:`_tbl_fwd_kernel`.

    At divisor 1 the phase decomposition collapses (the table IS the full
    lattice), so a row's four bilinear taps are the contiguous neighborhood
    ``(b, b+1) x (ox, ox+1)``: ONE 8-aligned sublane window serves both row
    taps (sublane rolls by the residue and residue+1) and one lane-roll
    pair serves both column taps — 1 table load per row instead of 4."""
    side = out_ref.shape[1]
    cn = tab_ref.shape[1]
    win = _tbl_win_rows(side)
    for g in range(_TBL_ROWS):
        b = idx_ref[g, 0]
        ox = idx_ref[g, 4]
        fy = frac_ref[g, 0]
        fx = frac_ref[g, 1]
        b0 = (b // 8) * 8
        rem = b - b0
        t = tab_ref[pl.ds(b0, win), :]
        r1 = pltpu.roll(t, win - rem, axis=0)         # rows [b, ...]
        r2 = pltpu.roll(t, win - rem - 1, axis=0)     # rows [b+1, ...]
        ty = r1 * (1.0 - fy) + r2 * fy
        l1 = pltpu.roll(ty, cn - ox, axis=1)          # lanes [ox, ...]
        l2 = pltpu.roll(ty, cn - ox - 1, axis=1)      # lanes [ox+1, ...]
        out_ref[g] = ((l1 * (1.0 - fx) + l2 * fx)[:side, :side]
                      .astype(out_ref.dtype))


def _tbl_d1_bwd_kernel(idx_ref, frac_ref, tab_ref, db_ref, dtab_ref,
                       dsh_ref):
    """Divisor-1 specialization of :func:`_tbl_bwd_kernel`: one table load
    feeds all four tap reconstructions, and the four scatter
    read-modify-writes merge into ONE — the (1-fy)/fy row pair is
    pre-combined in window frame (rolled by residue and residue+1) before a
    single accumulate into the table-cotangent scratch."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dtab_ref[...] = jnp.zeros_like(dtab_ref)

    side = db_ref.shape[1]
    cn = tab_ref.shape[1]
    win = _tbl_win_rows(side)
    dsh_rows = []
    for g in range(_TBL_ROWS):
        b = idx_ref[g, 0]
        ox = idx_ref[g, 4]
        fy = frac_ref[g, 0]
        fx = frac_ref[g, 1]
        b0 = (b // 8) * 8
        rem = b - b0
        dw = db_ref[g].astype(jnp.float32)                 # [side, side]
        t = tab_ref[pl.ds(b0, win), :]
        r1 = pltpu.roll(t, win - rem, axis=0)
        r2 = pltpu.roll(r1, win - 1, axis=0)
        dyt = r2 - r1                                      # d(y-blend)/dfy
        ty = r1 * (1.0 - fy) + r2 * fy
        dwpad = jnp.pad(dw, ((0, win - side), (0, cn - side)))
        s = pltpu.roll(dwpad, ox, axis=1)                  # x-tap 0 frame
        s2 = pltpu.roll(s, 1, axis=1)                      # x-tap 1 frame
        # algebraic fold (r4, tools/exp_tbl_scatter.py variant G, the
        # measured best): ONE x-blended cotangent m = s*(1-fx) + s2*fx
        # feeds dfy AND both scatter rows — two fewer [win, cn] passes per
        # row than blending u/v separately.  Shift cotangents contract in
        # table lane frame without reconstructing the gathered windows:
        # sum(dw * roll(X, cn-ox)) == sum(roll(dwpad, ox) * X).
        m = s * (1.0 - fx) + s2 * fx
        dfx = _tbl_sum2d((s2 - s) * ty)
        dfy = _tbl_sum2d(m * dyt)
        dsh_rows.append(jnp.concatenate([dfy, dfx], axis=1))  # [1, 2]
        mr = pltpu.roll(m, rem, axis=0)
        w = mr * (1.0 - fy) + pltpu.roll(mr, 1, axis=0) * fy
        cur = dtab_ref[pl.ds(b0, win), :]
        dtab_ref[pl.ds(b0, win), :] = cur + w
    dsh_ref[...] = jnp.concatenate(dsh_rows, axis=0)       # [_TBL_ROWS, 2]


def _tbl_interp_call(tablep, shifts, side, divisor, rn, split, interpret):
    r = shifts.shape[0]
    r_pad = _round_up(r, _TBL_ROWS)
    idx, frac = _tbl_idx(shifts, side, divisor, rn, split)
    idx = _pad_n(idx, r_pad, axis=0)
    frac = _pad_n(frac, r_pad, axis=0)
    out = pl.pallas_call(
        _tbl_d1_fwd_kernel if divisor == 1 else _tbl_fwd_kernel,
        grid=(r_pad // _TBL_ROWS,),
        in_specs=[
            pl.BlockSpec((_TBL_ROWS, 6), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_TBL_ROWS, 2), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TBL_ROWS, side, side), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((r_pad, side, side),
                                       _tbl_out_dtype()),
        interpret=interpret,
    )(idx, frac, tablep)
    return out[:r]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _table_interp(tablep, shifts, side, divisor, rn, split=0,
                  interpret=False):
    """Bilinear window interpolation: phase-decomposed table
    ``[d*d*rn + pad, cn]`` (or the lane-split two-copy layout when
    ``split > 0``, see :func:`_tbl_idx`) + per-row continuous lattice
    shifts ``[R, 2]`` (ty, tx) -> bias windows ``[R, side, side]``.
    Differentiable wrt both."""
    return _tbl_interp_call(tablep, shifts, side, divisor, rn, split,
                            interpret)


def _tbl_vjp_fwd(tablep, shifts, side, divisor, rn, split, interpret):
    out = _tbl_interp_call(tablep, shifts, side, divisor, rn, split,
                           interpret)
    return out, (tablep, shifts)


def _tbl_vjp_bwd(side, divisor, rn, split, interpret, res, dout):
    tablep, shifts = res
    r = shifts.shape[0]
    r_pad = _round_up(r, _TBL_ROWS)
    idx, frac = _tbl_idx(shifts, side, divisor, rn, split)
    idx = _pad_n(idx, r_pad, axis=0)
    frac = _pad_n(frac, r_pad, axis=0)
    db = _pad_n(dout, r_pad, axis=0)                       # zero pad rows
    dtab, dsh = pl.pallas_call(
        _tbl_d1_bwd_kernel if divisor == 1 else _tbl_bwd_kernel,
        grid=(r_pad // _TBL_ROWS,),
        in_specs=[
            pl.BlockSpec((_TBL_ROWS, 6), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_TBL_ROWS, 2), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((_TBL_ROWS, side, side), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((_TBL_ROWS, 2), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(tablep.shape, jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 2), jnp.float32),
        ],
        interpret=interpret,
    )(idx, frac, tablep, db)
    # clip saturates out-of-range rows: their shift cotangent is dropped
    # (matches the reference impl's stop-gradient-through-floor semantics
    # only up to the clip boundary; in-range rows are exact)
    return dtab, dsh[:r]


_table_interp.defvjp(_tbl_vjp_fwd, _tbl_vjp_bwd)


def _tbl_consts(side, divisor, kv_bound):
    """Lattice geometry: spacing h, origin t0, per-phase rows rn, total Tn."""
    s = 2.0 / (side - 1)
    h = s / divisor
    max_abs = 1.0 + kv_bound                   # |q - p| bound
    n_lo = int(-(-max_abs // h)) + 2           # ceil + 2 cells margin
    tn = 2 * n_lo + 1
    rn = -(-tn // divisor)
    tn = rn * divisor
    t0 = -n_lo * h
    return h, t0, rn, tn


def cpb_bias_table_parts(grid_kv, w1, b1, w2, b2, w3, b3, *, side, kv_bound):
    """The XLA (differentiable) part of the divisor-1 table CPB: MLP table
    build + lane-split layout + continuous lattice shifts.  Returns
    ``(tablep, shifts, rn, split)`` — the inputs of :func:`_table_interp`
    and :func:`fused_table_attention` (v10)."""
    assert w3.shape[1] == 1, "table CPB supports one output channel"
    bh, k, _ = grid_kv.shape
    h, t0, rn, tn = _tbl_consts(side, 1, kv_bound)
    lattice = t0 + h * jnp.arange(tn, dtype=jnp.float32)
    f = jnp.sign(lattice) * jnp.log1p(jnp.abs(lattice))
    # Full-f32 matmuls: the table is tiny (~20k points) but every bias
    # value interpolates from it, so TPU default (bf16-pass) precision
    # would put a ~1e-2 error floor under the whole approximation.
    dot = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
    hid = jnp.maximum(f[None, :, None] * w1[0] + f[:, None, None] * w1[1]
                      + b1, 0.0)
    hid = jnp.maximum(dot(hid, w2) + b2, 0.0)
    t_full = (dot(hid, w3) + b3)[..., 0]                   # [tn, tn]
    split = 0
    if rn > 128 and rn <= 256 - side:
        # lane-split layout: two stacked 128-lane copies (see _tbl_idx)
        split = rn - 128
        rpad = _tbl_split_rows(side, rn)
        tablep = jnp.concatenate([
            jnp.pad(t_full[:, :128], ((0, rpad - rn), (0, 0))),
            jnp.pad(t_full[:, split:rn], ((0, rpad - rn), (0, 0))),
        ], axis=0)                                         # [2*rpad, 128]
    else:
        cn = _round_up(rn, 128)
        tablep = jnp.pad(t_full, ((0, _tbl_win_rows(side)), (0, cn - rn)))
    ty = (-1.0 - grid_kv[..., 1] - t0) / h
    tx = (-1.0 - grid_kv[..., 0] - t0) / h
    shifts = jnp.stack([ty, tx], axis=-1).reshape(bh * k, 2)
    return tablep, shifts, rn, split


def cpb_bias_table(grid_kv, w1, b1, w2, b2, w3, b3, *, side, divisor,
                   kv_bound, interpret=False, use_kernel=None):
    """Approximate CPB bias on the standard normalized query grid
    (``create_grid_2d(side, side)`` normalized to [-1, 1], x fast axis):
    ``grid_kv`` [BH, K, 2] -> bias [BH, K, side*side] (kv-major, like
    :func:`cpb_bias_transposed`).  ``kv_bound`` is a static bound on
    ``|grid_kv|`` (the deformable offsets are tanh-bounded, so the caller
    can derive it exactly).  Single output channel (w3 [HID, 1]) only.

    Everything except the window interpolation is plain differentiable
    XLA, so MLP-weight and grid_kv gradients flow through the table and
    the shift computation respectively."""
    assert w3.shape[1] == 1, "table CPB supports one output channel"
    bh, k, _ = grid_kv.shape
    if divisor == 1:
        tablep, shifts, rn, split = cpb_bias_table_parts(
            grid_kv, w1, b1, w2, b2, w3, b3, side=side, kv_bound=kv_bound)
    else:
        h, t0, rn, tn = _tbl_consts(side, divisor, kv_bound)
        lattice = t0 + h * jnp.arange(tn, dtype=jnp.float32)
        f = jnp.sign(lattice) * jnp.log1p(jnp.abs(lattice))
        # T_full[a, b] = MLP(fx=f[b], fy=f[a])  (rows = dy, cols = dx).
        # Full-f32 matmuls: see cpb_bias_table_parts.
        dot = functools.partial(jnp.matmul,
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
        hid = jnp.maximum(f[None, :, None] * w1[0] + f[:, None, None] * w1[1]
                          + b1, 0.0)
        hid = jnp.maximum(dot(hid, w2) + b2, 0.0)
        t_full = (dot(hid, w3) + b3)[..., 0]               # [tn, tn]
        split = 0
        tablep = t_full.reshape(rn, divisor, rn, divisor)
        tablep = tablep.transpose(1, 3, 0, 2).reshape(
            divisor * divisor * rn, rn)
        cn = _round_up(rn, 128)
        # row pad: headroom for the kernel's 8-aligned sublane window loads
        tablep = jnp.pad(tablep, ((0, _tbl_win_rows(side)), (0, cn - rn)))
        # shifts in lattice units: first query coord is -1 on both axes
        ty = (-1.0 - grid_kv[..., 1] - t0) / h
        tx = (-1.0 - grid_kv[..., 0] - t0) / h
        shifts = jnp.stack([ty, tx], axis=-1).reshape(bh * k, 2)
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    if use_kernel:
        wins = _table_interp(tablep, shifts, side, divisor, rn, split,
                             interpret)
    else:
        wins = _tbl_interp_ref(tablep, shifts, side, divisor, rn, split)
    return wins.reshape(bh, k, side * side)


# ===========================================================================
# 1-D table-interpolated CPB (v9 flavor for DeformCrossAttention1D)
# ===========================================================================
# The 1-D CPB (reference models/DeformableAttention1D.py:60-102) evaluates
# the same MLP at BH*K*N positions with K = N/4 — at production shapes
# (N=2501, K=626) that is ~16 ms of the 41 ms 1-D attention call.  The 1-D
# query grid is uniform with spacing 2/(N-1) ≈ 8e-4 — so fine that a
# divisor-1 lattice (table spacing == query spacing) is already far below
# f32 matmul noise, and the stride-1 window needs NO phase decomposition:
# each (bh, k) row's bias is a contiguous [N]-lane segment of a per-channel
# table row, linearly blended between two adjacent lane offsets.  All table
# rows are indexed statically (O channels only); the only dynamic ops are
# lane rotates.

_T1_ROWS = 8  # (bh, k) rows per grid step


def _tbl1_fwd_kernel(idx_ref, frac_ref, tab_ref, out_ref):
    n_q = out_ref.shape[2]
    cn = tab_ref.shape[1]
    n_out = out_ref.shape[1]
    for g in range(_T1_ROWS):
        ox = idx_ref[g, 0]
        fx = frac_ref[g, 0]
        rows = []
        for c in range(n_out):
            row = tab_ref[c:c + 1, :]                     # [1, cn] static
            a = pltpu.roll(row, cn - ox, axis=1)[:, :n_q]
            b = pltpu.roll(row, cn - ox - 1, axis=1)[:, :n_q]
            rows.append(a * (1.0 - fx) + b * fx)
        out_ref[g] = jnp.concatenate(rows, axis=0)        # [n_out, n_q]


def _tbl1_bwd_kernel(idx_ref, frac_ref, tab_ref, db_ref, dtab_ref, dsh_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dtab_ref[...] = jnp.zeros_like(dtab_ref)

    n_q = db_ref.shape[2]
    cn = tab_ref.shape[1]
    n_out = db_ref.shape[1]
    dsh_rows = []
    for g in range(_T1_ROWS):
        ox = idx_ref[g, 0]
        fx = frac_ref[g, 0]
        dfx = jnp.zeros((1, 1), jnp.float32)
        for c in range(n_out):
            row = tab_ref[c:c + 1, :]
            a = pltpu.roll(row, cn - ox, axis=1)[:, :n_q]
            b = pltpu.roll(row, cn - ox - 1, axis=1)[:, :n_q]
            dw = db_ref[g, c:c + 1, :]                    # [1, n_q]
            dfx = dfx + jnp.sum(dw * (b - a), axis=1, keepdims=True)
            dwpad = jnp.pad(dw, ((0, 0), (0, cn - n_q)))
            s0 = pltpu.roll(dwpad, ox, axis=1)
            s1 = pltpu.roll(dwpad, ox + 1, axis=1)
            cur = dtab_ref[c:c + 1, :]
            dtab_ref[c:c + 1, :] = cur + s0 * (1.0 - fx) + s1 * fx
        dsh_rows.append(dfx)
    dsh_ref[...] = jnp.concatenate(dsh_rows, axis=0)      # [_T1_ROWS, 1]


def _tbl1_idx(shifts, n_q, tn):
    i0 = jnp.clip(jnp.floor(shifts), 0.0, float(tn - n_q - 2))
    frac = (shifts - i0).astype(jnp.float32)
    return i0.astype(jnp.int32), frac


def _tbl1_interp_ref(table, shifts, n_q, tn):
    """jnp reference of the 1-D interpolation (CPU path + kernel golden)."""
    idx, frac = _tbl1_idx(shifts, n_q, tn)

    def one(ivec, fvec):
        def win(off):
            return jax.vmap(lambda row: jax.lax.dynamic_slice(
                row, (off,), (n_q,)))(table)              # [O, n_q]

        return win(ivec[0]) * (1 - fvec[0]) + win(ivec[0] + 1) * fvec[0]

    return jax.vmap(one)(idx, frac)                       # [R, O, n_q]


def _tbl1_interp_call(table, shifts, n_q, tn, interpret):
    r = shifts.shape[0]
    r_pad = _round_up(r, _T1_ROWS)
    n_out = table.shape[0]
    idx, frac = _tbl1_idx(shifts, n_q, tn)
    idx = _pad_n(idx, r_pad, axis=0)
    frac = _pad_n(frac, r_pad, axis=0)
    out = pl.pallas_call(
        _tbl1_fwd_kernel,
        grid=(r_pad // _T1_ROWS,),
        in_specs=[
            pl.BlockSpec((_T1_ROWS, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_T1_ROWS, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_T1_ROWS, n_out, n_q), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((r_pad, n_out, n_q), jnp.float32),
        interpret=interpret,
    )(idx, frac, table)
    return out[:r]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _table1_interp(table, shifts, n_q, tn, interpret=False):
    """1-D bilinear segment interpolation: per-channel table ``[O, cn]`` +
    per-row lattice shifts ``[R, 1]`` -> bias segments ``[R, O, n_q]``."""
    return _tbl1_interp_call(table, shifts, n_q, tn, interpret)


def _tbl1_vjp_fwd(table, shifts, n_q, tn, interpret):
    return _tbl1_interp_call(table, shifts, n_q, tn, interpret), (table,
                                                                  shifts)


def _tbl1_vjp_bwd(n_q, tn, interpret, res, dout):
    table, shifts = res
    r = shifts.shape[0]
    r_pad = _round_up(r, _T1_ROWS)
    n_out = table.shape[0]
    idx, frac = _tbl1_idx(shifts, n_q, tn)
    idx = _pad_n(idx, r_pad, axis=0)
    frac = _pad_n(frac, r_pad, axis=0)
    db = _pad_n(dout, r_pad, axis=0)
    dtab, dsh = pl.pallas_call(
        _tbl1_bwd_kernel,
        grid=(r_pad // _T1_ROWS,),
        in_specs=[
            pl.BlockSpec((_T1_ROWS, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_T1_ROWS, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((_T1_ROWS, n_out, n_q), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((_T1_ROWS, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(table.shape, jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(idx, frac, table, db)
    return dtab, dsh[:r]


_table1_interp.defvjp(_tbl1_vjp_fwd, _tbl1_vjp_bwd)


# --- w128 1-D interpolation (r5): [rows, 128] flat-roll window layout ------
# The original _tbl1 kernels roll [1, cn] single-sublane rows (cn ~ 5k lanes
# at production N=2501), using 1 of 8 sublanes of every vreg — why the 1-D
# table CPB measured perf-NEUTRAL vs the exact MLP it replaces (PERF.md).
# The w128 layout stores each channel's lattice row as a [rt, 128] block
# (flat index f -> (row f // 128, lane f % 128)); a row's contiguous
# [ox, ox + n_q] window is materialized on [win1, 128] tiles with a sublane
# roll (the 128-aligned part) plus a lane roll + next-row-carry select (the
# residue), at full 8/8 sublane utilization.  The [R, O, wr, 128] output is
# flattened/sliced to [R, O, n_q] by ONE bandwidth-bound XLA relayout
# (differentiable glue) instead of ~8x wasted VPU passes.

TBL1_W128 = False  # opt-in: measured NEGATIVE on chip (fwd 11.2 vs 8.6 ms
# for the full 1-D attention, tools/exp_tbl1_w128.py r5) — the [wr,128]
# window flatten relayout + carry selects outweigh the sublane-utilization
# win, and the 1-D attention's ~20 ms floor is its [B,H,K,N] streams
# (K≈626), not the CPB.  True = w128 layout (golden-tested both ways).


def _tbl1w_geom(n_q, tn):
    """wr: window rows (residue <= 127 + n_q + 1 taps); win1: loaded rows
    (8-aligned, wr+1 valid after the residue roll); rt: table rows per
    channel; rows_pad: per-channel stride (load headroom, 8-aligned)."""
    wr = -(-(n_q + 128) // 128)
    win1 = _round_up(wr + 8, 8)
    rt = -(-tn // 128)
    rows_pad = _round_up(rt + win1, 8)
    return wr, win1, rt, rows_pad


def _tbl1w_window(tab_ref, base, b, win1, lane):
    """Both flat-window taps [win1, 128]: w0[r, l] = flat[ox + 128 r + l]
    and w1[r, l] = flat[ox + 1 + 128 r + l], where ox = 128 * row0 + b and
    ``base`` = channel_offset + row0."""
    s0 = (base // 8) * 8
    rem = base - s0
    t = tab_ref[pl.ds(s0, win1), :]
    t = pltpu.roll(t, win1 - rem, axis=0)              # row0 at sublane 0
    u = pltpu.roll(t, (128 - b) % 128, axis=1)         # u[r,l] = t[r,(l+b)%128]
    v = pltpu.roll(u, win1 - 1, axis=0)                # v[r] = u[r+1]
    w0 = jnp.where(lane < 128 - b, u, v)
    w0s = pltpu.roll(w0, 127, axis=1)                  # w0[r, l+1]
    w0rs = pltpu.roll(pltpu.roll(w0, win1 - 1, axis=0), 127, axis=1)
    w1 = jnp.where(lane < 127, w0s, w0rs)              # flat shift by one
    return w0, w1, s0, rem


def _tbl1w_fwd_kernel(idx_ref, frac_ref, tab_ref, out_ref, *, rows_pad):
    n_out, wr = out_ref.shape[1], out_ref.shape[2]
    win1 = _round_up(wr + 8, 8)
    lane = jax.lax.broadcasted_iota(jnp.int32, (win1, 128), 1)
    for g in range(_T1_ROWS):
        ox = idx_ref[g, 0]
        fx = frac_ref[g, 0]
        row0 = ox // 128
        b = ox - row0 * 128
        for c in range(n_out):
            w0, w1, _, _ = _tbl1w_window(tab_ref, c * rows_pad + row0, b,
                                         win1, lane)
            out_ref[g, c] = (w0 * (1.0 - fx) + w1 * fx)[:wr, :]


def _tbl1w_bwd_kernel(idx_ref, frac_ref, tab_ref, db_ref, dtab_ref, dsh_ref,
                      *, rows_pad):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dtab_ref[...] = jnp.zeros_like(dtab_ref)

    n_out, wr = db_ref.shape[1], db_ref.shape[2]
    win1 = _round_up(wr + 8, 8)
    lane = jax.lax.broadcasted_iota(jnp.int32, (win1, 128), 1)
    dsh_rows = []
    for g in range(_T1_ROWS):
        ox = idx_ref[g, 0]
        fx = frac_ref[g, 0]
        row0 = ox // 128
        b = ox - row0 * 128
        dfx = jnp.zeros((1, 1), jnp.float32)
        for c in range(n_out):
            w0, w1, s0, rem = _tbl1w_window(tab_ref, c * rows_pad + row0, b,
                                            win1, lane)
            dw = jnp.pad(db_ref[g, c], ((0, win1 - wr), (0, 0)))
            dfx = dfx + _tbl_sum2d(dw * (w1 - w0))
            # scatter both taps with ONE table RMW: fold the fx tap into the
            # flat frame (dflat[ox+1+j] += dw[j]*fx means a +1 flat shift of
            # the cotangent image), then invert the window construction
            m2 = dw * fx
            m2a = pltpu.roll(m2, 1, axis=1)            # m2[r, l-1]
            m2b = pltpu.roll(m2a, 1, axis=0)           # m2[r-1, 127] at l=0
            md = dw * (1.0 - fx) + jnp.where(lane >= 1, m2a, m2b)
            mdu = jnp.where(lane < 128 - b, md, 0.0)
            mdv = pltpu.roll(jnp.where(lane >= 128 - b, md, 0.0), 1, axis=0)
            mdt = pltpu.roll(mdu + mdv, b, axis=1)     # back to table lanes
            mdt = pltpu.roll(mdt, rem, axis=0)         # undo 8-alignment
            cur = dtab_ref[pl.ds(s0, win1), :]
            dtab_ref[pl.ds(s0, win1), :] = cur + mdt
        dsh_rows.append(dfx)
    dsh_ref[...] = jnp.concatenate(dsh_rows, axis=0)   # [_T1_ROWS, 1]


def _tbl1w_pack(table, n_q, tn):
    """[O, tn] channel rows -> the [O * rows_pad, 128] w128 layout."""
    n_out = table.shape[0]
    _, _, rt, rows_pad = _tbl1w_geom(n_q, tn)
    tw = jnp.pad(table[:, :tn], ((0, 0), (0, rt * 128 - tn)))
    tw = tw.reshape(n_out, rt, 128)
    tw = jnp.pad(tw, ((0, 0), (0, rows_pad - rt), (0, 0)))
    return tw.reshape(n_out * rows_pad, 128)


def _tbl1w_interp_call(tw, shifts, n_q, tn, interpret):
    r = shifts.shape[0]
    r_pad = _round_up(r, _T1_ROWS)
    wr, _, _, rows_pad = _tbl1w_geom(n_q, tn)
    n_out = tw.shape[0] // rows_pad
    idx, frac = _tbl1_idx(shifts, n_q, tn)
    idx = _pad_n(idx, r_pad, axis=0)
    frac = _pad_n(frac, r_pad, axis=0)
    out = pl.pallas_call(
        functools.partial(_tbl1w_fwd_kernel, rows_pad=rows_pad),
        grid=(r_pad // _T1_ROWS,),
        in_specs=[
            pl.BlockSpec((_T1_ROWS, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_T1_ROWS, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_T1_ROWS, n_out, wr, 128),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((r_pad, n_out, wr, 128), jnp.float32),
        interpret=interpret,
    )(idx, frac, tw)
    return out[:r]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _table1w_interp(tw, shifts, n_q, tn, interpret=False):
    """w128 1-D interpolation: packed table ``[O * rows_pad, 128]`` +
    per-row lattice shifts ``[R, 1]`` -> flat windows ``[R, O, wr, 128]``
    (window element j at (j // 128, j % 128); valid through j = n_q - 1)."""
    return _tbl1w_interp_call(tw, shifts, n_q, tn, interpret)


def _tbl1w_vjp_fwd(tw, shifts, n_q, tn, interpret):
    return _tbl1w_interp_call(tw, shifts, n_q, tn, interpret), (tw, shifts)


def _tbl1w_vjp_bwd(n_q, tn, interpret, res, dout):
    tw, shifts = res
    r = shifts.shape[0]
    r_pad = _round_up(r, _T1_ROWS)
    wr, _, _, rows_pad = _tbl1w_geom(n_q, tn)
    n_out = tw.shape[0] // rows_pad
    idx, frac = _tbl1_idx(shifts, n_q, tn)
    idx = _pad_n(idx, r_pad, axis=0)
    frac = _pad_n(frac, r_pad, axis=0)
    db = _pad_n(dout, r_pad, axis=0)
    dtw, dsh = pl.pallas_call(
        functools.partial(_tbl1w_bwd_kernel, rows_pad=rows_pad),
        grid=(r_pad // _T1_ROWS,),
        in_specs=[
            pl.BlockSpec((_T1_ROWS, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_T1_ROWS, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((_T1_ROWS, n_out, wr, 128), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((_T1_ROWS, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(tw.shape, jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(idx, frac, tw, db)
    return dtw, dsh[:r]


_table1w_interp.defvjp(_tbl1w_vjp_fwd, _tbl1w_vjp_bwd)


def cpb_bias_table_1d(grid_kv, w1, b1, w2, b2, w3, b3, *, n_q, kv_bound,
                      interpret=False, use_kernel=None):
    """Approximate 1-D CPB bias on the standard normalized query sequence
    (2i/(n_q-1) - 1): ``grid_kv`` [BH, K] -> bias [BH, O, K, n_q] (the
    multi-channel kv-major layout of :func:`cpb_bias_transposed`).  Lattice
    spacing == query spacing (divisor 1): at production N=2501 that is
    8e-4 in normalized units — interpolation error is far below f32 matmul
    noise.  ``w1`` is the 1-coordinate first layer ``[1, HID]``."""
    bh, k = grid_kv.shape
    n_out = w3.shape[1]
    s = 2.0 / (n_q - 1)
    max_abs = 1.0 + kv_bound
    n_lo = int(-(-max_abs // s)) + 2
    tn = 2 * n_lo + 1
    t0 = -n_lo * s
    lattice = t0 + s * jnp.arange(tn, dtype=jnp.float32)
    f = jnp.sign(lattice) * jnp.log1p(jnp.abs(lattice))
    dot = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
    hid = jnp.maximum(f[:, None] * w1[0] + b1, 0.0)       # [tn, HID]
    hid = jnp.maximum(dot(hid, w2) + b2, 0.0)
    table = (dot(hid, w3) + b3).T                         # [O, tn]
    cn = _round_up(tn, 128)
    table = jnp.pad(table, ((0, 0), (0, cn - tn)))
    shifts = ((-1.0 - grid_kv - t0) / s).reshape(bh * k, 1)
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    if use_kernel and TBL1_W128:
        wr, _, _, _ = _tbl1w_geom(n_q, tn)
        tw = _tbl1w_pack(table, n_q, tn)
        w = _table1w_interp(tw, shifts, n_q, tn, interpret)
        # flatten the [wr, 128] window rows to [n_q] lanes: one bandwidth-
        # bound XLA relayout (differentiable glue; its transpose zero-pads
        # the cotangent back to window-row layout for the bwd kernel)
        wins = w.reshape(bh * k, n_out, wr * 128)[:, :, :n_q]
    elif use_kernel:
        wins = _table1_interp(table, shifts, n_q, tn, interpret)
    else:
        wins = _tbl1_interp_ref(table, shifts, n_q, tn)
    return wins.reshape(bh, k, n_out, n_q).transpose(0, 2, 1, 3)


# ===========================================================================
# v10: fused divisor-1 table attention (windows + sim + softmax + PV + attn)
# ===========================================================================
# The r4 anatomy measurement (tools/exp_attn_anatomy.py) showed the v9
# production path's dominant cost is NOT compute but the XLA relayout of the
# interpolated bias from window layout [R, side, side] to the attention's
# [BH, K, N] row layout (~0.56 ms of the ~0.9 ms attention forward): a
# [*, 50, 50] array tiles (8, 128) on its minor dims, so the reshape
# physically rewrites 118 MB of padded tiles into 46 MB of dense rows.
#
# v10 removes the relayout entirely by fusing the divisor-1 window
# interpolation INTO the attention kernel: per (b*h) grid step the K bias
# windows are built once into a VMEM scratch (one 8-aligned table load +
# four rolls each, exactly `_tbl_d1_fwd_kernel`'s math), and the query axis
# is processed in 256-lane groups — sim is one [K,D]x[D,256] MXU
# contraction per group, the window rows intersecting the group are placed
# by static lane roll+mask (side and the group grid are static, so every
# placement is a compile-time constant), softmax reduces over sublanes, and
# PV contracts sublanes back to [256, D].  All stores (out rows, attn
# lanes) land on 128-aligned boundaries by construction.  The backward
# reads the attn residual, runs the same group loop in reverse (softmax/PV
# backward), re-splits ds into per-(k, qy) window cotangents, and finishes
# with the in-kernel divisor-1 interp backward (the m-fold of
# `_tbl_d1_bwd_kernel`), accumulating the table cotangent across the whole
# grid and emitting per-row shift cotangents.  Nothing but q/k/v/out/attn
# ever touches HBM.
#
# Semantics are identical to the composition it replaces
# (cpb_bias_table -> reshape -> sim+softmax+dropout+PV in
# models/deform_attention.py's kn branch); golden tests compare both.

_V10_GROUP = 256  # query-lane group width (multiple of 128: aligned stores)


def _v10_groups(n, side=1):
    groups, off = [], 0
    while off < n:
        groups.append((off, min(_V10_GROUP, n - off)))
        off += _V10_GROUP
    # a group narrower than one window row would crop window lanes in
    # _v10_place before the roll; impossible at the production N=2500
    # (last group 196 >= side 50) and guarded for everything else
    assert groups[-1][1] >= side, (
        f"v10 needs the last query group (N % {_V10_GROUP} = "
        f"{groups[-1][1]}) to be >= side ({side})")
    return groups


def _v10_pieces(off, w, side):
    """Static placements of window rows qy into group lanes [off, off+w):
    (qy, dst, lo, hi) with dst = qy*side - off, target lanes [lo, hi)."""
    out = []
    for qy in range(max(off // side, 0), min((off + w - 1) // side, side - 1) + 1):
        dst = qy * side - off
        lo, hi = max(dst, 0), min(dst + side, w)
        if hi > lo:
            out.append((qy, dst, lo, hi))
    return out


def _v10_win_mask(win, cn, side):
    sub = jax.lax.broadcasted_iota(jnp.int32, (win, cn), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (win, cn), 1)
    return ((sub < side) & (lane < side)).astype(jnp.float32)


def _v10_build_window(tab_ref, b, ox, fy, fx, side, mask_win):
    """One masked divisor-1 bias window [win, cn] (math of
    :func:`_tbl_d1_fwd_kernel`)."""
    win = mask_win.shape[0]
    cn = tab_ref.shape[1]
    b0 = (b // 8) * 8
    rem = b - b0
    t = tab_ref[pl.ds(b0, win), :]
    r1 = pltpu.roll(t, win - rem, axis=0)
    r2 = pltpu.roll(t, win - rem - 1, axis=0)
    ty = r1 * (1.0 - fy) + r2 * fy
    l1 = pltpu.roll(ty, cn - ox, axis=1)
    l2 = pltpu.roll(ty, cn - ox - 1, axis=1)
    return (l1 * (1.0 - fx) + l2 * fx) * mask_win


def _v10_place(piece, w, dst, lo, hi):
    """[K, cn] window rows -> [K, w] group lanes at [lo, hi) (static)."""
    kk, cn = piece.shape
    if w > cn:
        piece = jnp.concatenate([piece, jnp.zeros((kk, w - cn), jnp.float32)],
                                axis=1)
    elif w < cn:
        piece = piece[:, :w]
    piece = pltpu.roll(piece, dst % w, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (kk, w), 1)
    return piece * ((lane >= lo) & (lane < hi)).astype(jnp.float32)


def _v10_extract(ds_g, dst, lo, hi, cn):
    """[K, w] group-lane cotangents [lo, hi) -> [K, cn] window lanes."""
    kk, w = ds_g.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (kk, w), 1)
    piece = ds_g * ((lane >= lo) & (lane < hi)).astype(jnp.float32)
    piece = pltpu.roll(piece, (-dst) % w, axis=1)
    if w > cn:
        return piece[:, :cn]
    if w < cn:
        return jnp.concatenate([piece, jnp.zeros((kk, cn - w), jnp.float32)],
                               axis=1)
    return piece


def _v10_fwd_kernel(seed_ref, idx_ref, frac_ref, tab_ref, q_ref, k_ref,
                    v_ref, out_ref, attn_ref, w_scratch, *, side,
                    dropout_rate):
    bh = pl.program_id(0)
    K = k_ref.shape[1]
    N = q_ref.shape[1]
    cn = tab_ref.shape[1]
    win = _tbl_win_rows(side)
    mask_win = _v10_win_mask(win, cn, side)

    def build(r, _):
        b = idx_ref[0, r, 0]
        ox = idx_ref[0, r, 4]
        fy = frac_ref[0, r, 0]
        fx = frac_ref[0, r, 1]
        w_scratch[pl.ds(r, 1)] = _v10_build_window(
            tab_ref, b, ox, fy, fx, side, mask_win)[None]
        return 0

    jax.lax.fori_loop(0, K, build, 0)

    k = k_ref[0]                                       # [K, D]
    v = v_ref[0]
    for gi, (off, w) in enumerate(_v10_groups(N, side)):
        qg = q_ref[0, off:off + w, :]                  # [w, D] (pre-scaled)
        sim = jax.lax.dot_general(k, qg, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        for qy, dst, lo, hi in _v10_pieces(off, w, side):
            sim = sim + _v10_place(w_scratch[:, qy, :], w, dst, lo, hi)
        p = _kn_softmax(sim, K)                        # [K, w]
        attn_ref[0, :, off:off + w] = p                # pre-dropout residual
        if dropout_rate > 0.0:
            mask = _kn_dropout_mask(seed_ref, bh * 131 + gi, p.shape,
                                    dropout_rate)
            p = p * mask * (1.0 / (1.0 - dropout_rate))
        out_ref[0, off:off + w, :] = jax.lax.dot_general(
            p, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _v10_bwd_kernel(seed_ref, idx_ref, frac_ref, tab_ref, q_ref, k_ref,
                    v_ref, attn_ref, gout_ref, gattn_ref,
                    dq_ref, dk_ref, dv_ref, dtab_ref, dsh_ref,
                    dw_scratch, dsh_scratch, *, side, dropout_rate,
                    with_gattn):
    bh = pl.program_id(0)

    @pl.when(bh == 0)
    def _():
        dtab_ref[...] = jnp.zeros_like(dtab_ref)

    K = k_ref.shape[1]
    N = q_ref.shape[1]
    cn = tab_ref.shape[1]
    win = _tbl_win_rows(side)
    dw_scratch[...] = jnp.zeros_like(dw_scratch)

    k = k_ref[0]
    v = v_ref[0]
    dk_acc = jnp.zeros_like(k)
    dv_acc = jnp.zeros_like(v)
    for gi, (off, w) in enumerate(_v10_groups(N, side)):
        p = attn_ref[0, :, off:off + w]                # [K, w] pre-dropout
        gout = gout_ref[0, off:off + w, :]             # [w, D]
        if dropout_rate > 0.0:
            mask = _kn_dropout_mask(seed_ref, bh * 131 + gi, p.shape,
                                    dropout_rate)
            scale = 1.0 / (1.0 - dropout_rate)
            p_used = p * mask * scale
        else:
            p_used = p
        dv_acc = dv_acc + jax.lax.dot_general(
            p_used, gout, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(v, gout, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            dp = dp * mask * scale
        if with_gattn:
            dp = dp + gattn_ref[0, :, off:off + w]
        # VPU f32 reduction, NOT a ones-matmul: softmax backward relies on
        # exact per-query cancellation (sum_k ds == 0); the MXU's default
        # bf16-pass rounding breaks it and the error accumulates into the
        # table cotangent's global sum (CPB out-bias grad: 0.17 noise on a
        # ~7e-6 true value vs 9e-4 for the unfused path — /tmp/v10_b3diag2)
        colsum = jnp.sum(p * dp, axis=0, keepdims=True)
        ds = p * (dp - colsum)                         # [K, w]
        dq_ref[0, off:off + w, :] = jax.lax.dot_general(
            ds, k, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q_ref[0, off:off + w, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for qy, dst, lo, hi in _v10_pieces(off, w, side):
            dw_scratch[:, qy, :] = dw_scratch[:, qy, :] + _v10_extract(
                ds, dst, lo, hi, cn)
    dk_ref[0] = dk_acc
    dv_ref[0] = dv_acc

    # ---- divisor-1 interp backward over the K window cotangents ----------
    # (the m-fold of _tbl_d1_bwd_kernel; dw rows are already window-frame
    # [side, side] with zeros elsewhere, so no pad step)
    def ibwd(r, _):
        b = idx_ref[0, r, 0]
        ox = idx_ref[0, r, 4]
        fy = frac_ref[0, r, 0]
        fx = frac_ref[0, r, 1]
        b0 = (b // 8) * 8
        rem = b - b0
        dw = dw_scratch[pl.ds(r, 1)][0]                # [win, cn]
        t = tab_ref[pl.ds(b0, win), :]
        r1 = pltpu.roll(t, win - rem, axis=0)
        r2 = pltpu.roll(r1, win - 1, axis=0)
        dyt = r2 - r1
        ty = r1 * (1.0 - fy) + r2 * fy
        s = pltpu.roll(dw, ox, axis=1)
        s2 = pltpu.roll(s, 1, axis=1)
        m = s * (1.0 - fx) + s2 * fx
        dfx = _tbl_sum2d((s2 - s) * ty)
        dfy = _tbl_sum2d(m * dyt)
        # 3-D scratch, K on the LEADING (untiled) axis: Mosaic only allows
        # dynamic SUBLANE offsets at multiples of 8, so a 2-D [K, 2] scratch
        # indexed at row r would mis-lower; leading-axis dynamic stores are
        # exact (tools/exp_v10_dshprobe.py variant B).  The on-chip dsh
        # 7e-2 error was _tbl_sum2d's bf16-pass truncation, fixed there.
        dsh_scratch[pl.ds(r, 1)] = jnp.concatenate([dfy, dfx], axis=1)[None]
        mr = pltpu.roll(m, rem, axis=0)
        wacc = mr * (1.0 - fy) + pltpu.roll(mr, 1, axis=0) * fy
        cur = dtab_ref[pl.ds(b0, win), :]
        dtab_ref[pl.ds(b0, win), :] = cur + wacc
        return 0

    jax.lax.fori_loop(0, K, ibwd, 0)
    dsh_ref[0] = dsh_scratch[:, 0, :]


def _v10_call_fwd(q, k, v, tablep, idx, frac, seed, side, dropout_rate,
                  interpret):
    BH, N, D = q.shape
    K = k.shape[1]
    win = _tbl_win_rows(side)
    cn = tablep.shape[1]
    out, attn = pl.pallas_call(
        functools.partial(_v10_fwd_kernel, side=side,
                          dropout_rate=dropout_rate),
        grid=(BH,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),              # seed
            pl.BlockSpec((1, K, 6), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),              # idx
            pl.BlockSpec((1, K, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),              # frac
            pl.BlockSpec(memory_space=pltpu.VMEM),              # tablep
            pl.BlockSpec((1, N, D), lambda i: (i, 0, 0)),       # q
            pl.BlockSpec((1, K, D), lambda i: (i, 0, 0)),       # k
            pl.BlockSpec((1, K, D), lambda i: (i, 0, 0)),       # v
        ],
        out_specs=[
            pl.BlockSpec((1, N, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, K, N), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, N, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, K, N), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((K, win, cn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_KN_VMEM_LIMIT),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.float32).reshape(1).astype(jnp.int32),
      idx.reshape(BH, K, 6), frac.reshape(BH, K, 2), tablep, q, k, v)
    return out, attn


def _v10_call_bwd(q, k, v, tablep, idx, frac, seed, attn, g_out, g_attn,
                  side, dropout_rate, interpret, with_gattn):
    BH, N, D = q.shape
    K = k.shape[1]
    win = _tbl_win_rows(side)
    cn = tablep.shape[1]
    if g_attn is None:
        g_attn = jnp.zeros((1, 1, 1), jnp.float32)  # placeholder, unread
        gattn_spec = pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0))
    else:
        gattn_spec = pl.BlockSpec((1, K, N), lambda i: (i, 0, 0))
    outs = pl.pallas_call(
        functools.partial(_v10_bwd_kernel, side=side,
                          dropout_rate=dropout_rate, with_gattn=with_gattn),
        grid=(BH,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, 6), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, K, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, K, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, K, N), lambda i: (i, 0, 0)),       # attn
            pl.BlockSpec((1, N, D), lambda i: (i, 0, 0)),       # g_out
            gattn_spec,                                         # g_attn
        ],
        out_specs=[
            pl.BlockSpec((1, N, D), lambda i: (i, 0, 0)),       # dq
            pl.BlockSpec((1, K, D), lambda i: (i, 0, 0)),       # dk
            pl.BlockSpec((1, K, D), lambda i: (i, 0, 0)),       # dv
            pl.BlockSpec(memory_space=pltpu.VMEM),              # dtab
            pl.BlockSpec((1, K, 2), lambda i: (i, 0, 0)),       # dsh
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, N, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, K, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, K, D), jnp.float32),
            jax.ShapeDtypeStruct(tablep.shape, jnp.float32),
            jax.ShapeDtypeStruct((BH, K, 2), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((K, win, cn), jnp.float32),
                        pltpu.VMEM((K, 1, 2), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_KN_VMEM_LIMIT),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.float32).reshape(1).astype(jnp.int32),
      idx.reshape(BH, K, 6), frac.reshape(BH, K, 2), tablep, q, k, v,
      attn, g_out, g_attn)
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def fused_table_attention(q, k, v, tablep, shifts, seed, side, rn, split,
                          dropout_rate=0.0, interpret=False):
    """v10 fused divisor-1 table attention (kn layout).

    q [BH, N, D] PRE-scaled, k/v [BH, K, D], tablep the divisor-1
    (optionally lane-split) bias table from :func:`cpb_bias_table`'s build,
    shifts [BH*K, 2] continuous lattice shifts.  Returns
    (out [BH, N, D], attn [BH, K, N] pre-dropout).  Differentiable wrt
    q/k/v/tablep/shifts; dropout masks are regenerated in the backward
    from ``seed`` (per (bh, group)).
    """
    idx, frac = _tbl_idx(shifts, side, 1, rn, split)
    out, attn = _v10_call_fwd(q, k, v, tablep, idx, frac, seed, side,
                              dropout_rate, interpret)
    return out, attn


def _v10_vjp_fwd(q, k, v, tablep, shifts, seed, side, rn, split,
                 dropout_rate, interpret):
    idx, frac = _tbl_idx(shifts, side, 1, rn, split)
    out, attn = _v10_call_fwd(q, k, v, tablep, idx, frac, seed, side,
                              dropout_rate, interpret)
    return (out, attn), (q, k, v, tablep, shifts, seed, attn)


def _v10_vjp_bwd(side, rn, split, dropout_rate, interpret, res, gouts):
    q, k, v, tablep, shifts, seed, attn = res
    g_out, g_attn = gouts
    idx, frac = _tbl_idx(shifts, side, 1, rn, split)
    dq, dk, dv, dtab, dsh = _v10_call_bwd(
        q, k, v, tablep, idx, frac, seed, attn, g_out, g_attn, side,
        dropout_rate, interpret, with_gattn=True)
    return dq, dk, dv, dtab, dsh.reshape(-1, 2), jnp.zeros(())


fused_table_attention.defvjp(_v10_vjp_fwd, _v10_vjp_bwd)


def _v10_ref(q, k, v, tablep, shifts, side, rn, split):
    """jnp reference of the v10 forward (golden; no dropout)."""
    BH, N, D = q.shape
    K = k.shape[1]
    wins = _tbl_interp_ref(tablep, shifts, side, 1, rn, split)
    bias = wins.reshape(BH, K, N)
    sim = jnp.einsum("bjd,bid->bji", k, q) + bias
    attn = jax.nn.softmax(sim, axis=-2)
    out = jnp.einsum("bji,bjd->bid", attn, v)
    return out, attn


def v10_supported(n_q, side):
    """True if the v10 group decomposition covers (n_q, side) — see the
    guard in :func:`_v10_groups`."""
    r = n_q % _V10_GROUP
    return r == 0 or r >= side


def table_geometry(side, kv_bound):
    """(rn, split) of the divisor-1 table for ``side``/``kv_bound`` — the
    static arguments :func:`fused_table_attention` needs."""
    _, _, rn, _ = _tbl_consts(side, 1, kv_bound)
    split = rn - 128 if (rn > 128 and rn <= 256 - side) else 0
    return rn, split
