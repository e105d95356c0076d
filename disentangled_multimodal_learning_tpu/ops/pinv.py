"""Iterative Moore-Penrose pseudo-inverse (Nystromformer eq. 15 helper).

Same Newton-Schulz-style cubic iteration as the reference
(models/NystromAttention.py:20-35): initialize ``z = x^T / (max_col * max_row)``
and iterate ``z <- 0.25 z (13 I - xz (15 I - xz (7 I - xz)))``.

Every step is three ``m x m`` matmuls (m = number of landmarks) — pure MXU
work; the loop is unrolled at trace time (``iters`` is static).
"""

from __future__ import annotations

import jax.numpy as jnp


def moore_penrose_pinv(x: jnp.ndarray, iters: int = 6) -> jnp.ndarray:
    """x: [..., m, m] square attention block; returns approximate pinv."""
    abs_x = jnp.abs(x)
    col = abs_x.sum(axis=-1)
    row = abs_x.sum(axis=-2)
    # reference normalizes by GLOBAL max over the whole batch
    # (models/NystromAttention.py:26: torch.max over all elements)
    z = jnp.swapaxes(x, -1, -2) / (jnp.max(col) * jnp.max(row))

    m = x.shape[-1]
    eye = jnp.eye(m, dtype=x.dtype)
    for _ in range(iters):
        xz = x @ z
        z = 0.25 * z @ (13.0 * eye - (xz @ (15.0 * eye - (xz @ (7.0 * eye - xz)))))
    return z
