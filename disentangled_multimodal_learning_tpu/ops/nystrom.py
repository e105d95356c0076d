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

    # bf16 operands (f32 accumulation) on TPU: the matmul chain is the FLOP
    # cost and bf16 doubles MXU rate; CPU (tests) stays f32 — it cannot
    # execute mixed-precision dots and the goldens compare at f32 tolerance
    cdt = jnp.bfloat16 if jax.default_backend() == "tpu" else q.dtype
    # f32 accumulation for bf16 operands; full input precision otherwise
    # (the float64 golden test relies on f64 accumulation)
    pet = jnp.float32 if cdt == jnp.bfloat16 else None

    def ein(a, b, spec):
        return jnp.einsum(spec, a.astype(cdt), b.astype(cdt),
                          preferred_element_type=pet)

    # landmark means as an MXU segment-matmul: reshape(m, l).mean(axis) makes
    # XLA reduce over a MIDDLE axis (a ~1.8 ms relayout fusion for two
    # [4,8,2816,64] tensors on v5e, profiled); the constant [m, n] segment
    # indicator contracts on the MXU instead (~0.03 ms)
    seg = (jnp.arange(n, dtype=jnp.int32) // l == jnp.arange(m)[:, None])
    seg = seg.astype(q.dtype) / l                          # [m, n] constant
    q_land = ein(seg, q, "sn,bhnd->bhsd")
    k_land = ein(seg, k, "sn,bhnd->bhsd")

    sim1 = ein(q, k_land, "bhid,bhjd->bhij")              # [B,H,n,m]
    sim2 = ein(q_land, k_land, "bhid,bhjd->bhij")         # [B,H,m,m]
    sim3 = ein(q_land, k, "bhid,bhjd->bhij")              # [B,H,m,n]

    attn1 = jax.nn.softmax(sim1, axis=-1)
    attn2 = jax.nn.softmax(sim2, axis=-1)
    attn3 = jax.nn.softmax(sim3, axis=-1)
    attn2_inv = moore_penrose_pinv(attn2, pinv_iterations)

    def mm(a, b):
        return jnp.matmul(a.astype(cdt), b.astype(cdt),
                          preferred_element_type=pet)

    out = mm(mm(attn1, attn2_inv), mm(attn3, v))          # [B,H,n,D]
    out = out[:, :, -N:] if pad else out

    if return_attn:
        attn = (attn1 @ attn2_inv @ attn3)
        attn = attn[:, :, -N:, -N:] if pad else attn
        return out, attn
    return out
