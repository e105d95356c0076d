"""Nystrom (landmark) attention core — O(N·m) attention for 2500-token bags.

Functional equivalent of the reference NystromAttention forward
(models/NystromAttention.py:74-157, identical pip package used at runtime,
models/Modules.py:24): pad the sequence LEFT to a multiple of m landmarks,
landmark q/k means by segment-sum, three softmax similarity blocks, iterative
pinv of the landmark-landmark block, then ``(attn1 @ pinv(attn2)) @ (attn3 @ v)``.

This module takes already-projected q, k, v (the linen layer owns the
projections and the depthwise value-conv residual).  All matmuls are MXU
shaped: [N, d] x [d, m] and [m, m] blocks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .pinv import moore_penrose_pinv


def nystrom_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_landmarks: int,
    pinv_iterations: int = 6,
    return_attn: bool = False,
    eps: float = 1e-8,
):
    """q, k, v: ``[B, H, N, D]`` with q already scaled by ``D**-0.5``.

    N is padded on the LEFT to a multiple of ``num_landmarks`` with zeros
    (reference pads the sequence front, models/NystromAttention.py:79-82),
    and the output is cropped back to the original N (``out[:, -n:]`` in the
    reference, models/NystromAttention.py:151).

    Returns out ``[B, H, N, D]`` (and the dense [N, N] attention if
    ``return_attn``, only sane for small N in tests).
    """
    B, H, N, D = q.shape
    m = num_landmarks
    remainder = N % m
    pad = (m - remainder) % m
    if pad:
        padw = ((0, 0), (0, 0), (pad, 0), (0, 0))
        q = jnp.pad(q, padw)
        k = jnp.pad(k, padw)
        v = jnp.pad(v, padw)
    n = N + pad
    l = n // m  # tokens per landmark

    # landmark means via reshape-mean: '... (n l) d -> ... n d'
    q_land = q.reshape(B, H, m, l, D).mean(axis=3)
    k_land = k.reshape(B, H, m, l, D).mean(axis=3)

    sim1 = jnp.einsum("bhid,bhjd->bhij", q, k_land)       # [B,H,n,m]
    sim2 = jnp.einsum("bhid,bhjd->bhij", q_land, k_land)  # [B,H,m,m]
    sim3 = jnp.einsum("bhid,bhjd->bhij", q_land, k)       # [B,H,m,n]

    attn1 = jax.nn.softmax(sim1, axis=-1)
    attn2 = jax.nn.softmax(sim2, axis=-1)
    attn3 = jax.nn.softmax(sim3, axis=-1)
    attn2_inv = moore_penrose_pinv(attn2, pinv_iterations)

    out = (attn1 @ attn2_inv) @ (attn3 @ v)  # [B,H,n,D]
    out = out[:, :, -N:] if pad else out

    if return_attn:
        attn = (attn1 @ attn2_inv @ attn3)
        attn = attn[:, :, -N:, -N:] if pad else attn
        return out, attn
    return out
