"""Gradient modulation: conflict-projection surgery on classifier gradients.

Reference semantics (train_test.py:111-216 teacher, :863-967 deformpathomic):
the fused classifier's weight sees two feature halves (tumor|immune or
feature1|feature2).  Per output row, if the two half-gradients conflict
(cosine < 0), the half belonging to the currently *weaker* branch (softmax
score ratio < 1) is replaced by a projected/reflected vector.

The reference mutates ``.grad`` row-by-row in a Python loop with data-
dependent ifs; here the same arithmetic is a vectorized masked update inside
the jitted step (vmap over rows + jnp.where), including the reference's exact
double-subtraction quirk (grad' = grad - proj; perpen = grad' - proj;
result = |grad'| * perpen/|perpen| — train_test.py:163-170).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _project_row(g_weak: jnp.ndarray, g_strong: jnp.ndarray, eps: float = 1e-12):
    """The reference's projection surgery for one conflicting row."""
    dot = jnp.dot(g_weak, g_strong)
    proj = (dot / jnp.maximum(jnp.sum(g_strong * g_strong), eps)) * g_strong
    g1 = g_weak - proj
    perpen = g1 - proj
    unit = perpen / jnp.maximum(jnp.linalg.norm(perpen), eps)
    return jnp.linalg.norm(g1) * unit


def branch_scores(feature1, feature2, kernel, bias, labels):
    """Per-branch confidence scores (reference train_test.py:114-143):
    out_k = feature_k @ W_k + bias/2; score_k = sum_i softmax(out_k)[i, y_i].

    kernel: flax Dense kernel [2*hs, C]; bias [C]; features [B, hs].
    """
    hs = feature1.shape[-1]
    out1 = feature1 @ kernel[:hs] + bias / 2
    out2 = feature2 @ kernel[hs:] + bias / 2
    p1 = jax.nn.softmax(out1, axis=-1)
    p2 = jax.nn.softmax(out2, axis=-1)
    s1 = jnp.sum(jnp.take_along_axis(p1, labels[:, None], axis=1))
    s2 = jnp.sum(jnp.take_along_axis(p2, labels[:, None], axis=1))
    return s1, s2


def modulate_kernel_grad(kernel_grad: jnp.ndarray, feature1, feature2, kernel,
                         bias, labels) -> jnp.ndarray:
    """Return the modulated kernel gradient.

    kernel_grad / kernel: [2*hs, C] (flax layout, in x out — the reference
    operates on torch's [C, 2*hs] rows; per-class rows there are per-class
    COLUMNS here).
    """
    hs = feature1.shape[-1]
    s1, s2 = branch_scores(feature1, feature2, kernel, bias, labels)
    ratio1 = s1 / s2
    ratio2 = 1.0 / ratio1

    g1 = kernel_grad[:hs].T  # [C, hs] — row c = grad of class c wrt half 1
    g2 = kernel_grad[hs:].T

    def per_row(a, b):
        sim = jnp.dot(a, b) / jnp.maximum(jnp.linalg.norm(a) * jnp.linalg.norm(b),
                                          1e-12)
        conflict = sim < 0
        new_a = jnp.where(conflict & (ratio1 < 1), _project_row(a, b), a)
        new_b = jnp.where(conflict & (ratio1 >= 1) & (ratio2 < 1),
                          _project_row(b, a), b)
        return new_a, new_b

    new_g1, new_g2 = jax.vmap(per_row)(g1, g2)
    return jnp.concatenate([new_g1.T, new_g2.T], axis=0)
