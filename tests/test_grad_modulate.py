"""Golden test: vectorized gradient-modulation vs a literal torch
transcription of the reference's row-loop surgery (train_test.py:152-183)."""

import numpy as np
import jax.numpy as jnp
import pytest

from disentangled_multimodal_learning_tpu.train.grad_modulate import (
    branch_scores,
    modulate_kernel_grad,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def torch_reference_modulate(weight_grad, f1, f2, weight, bias, labels):
    """Literal transcription: torch layout weight [C, 2*hs], returns the
    modulated grad.  Mirrors reference train_test.py:111-216."""
    hs = f1.shape[1]
    W = torch.from_numpy(weight)
    G = torch.from_numpy(weight_grad).clone()
    b = torch.from_numpy(bias)
    t_f1 = torch.from_numpy(f1)
    t_f2 = torch.from_numpy(f2)
    y = torch.from_numpy(labels)

    out1 = t_f1.mm(W[:, :hs].t()) + b / 2
    out2 = t_f2.mm(W[:, hs:].t()) + b / 2
    score1 = sum(F.softmax(out1, dim=1)[i][y[i]] for i in range(out1.size(0)))
    score2 = sum(F.softmax(out2, dim=1)[i][y[i]] for i in range(out2.size(0)))
    ratio1 = score1 / score2
    ratio2 = 1 / ratio1

    i_index = 0
    for g1, g2 in zip(G[:, :hs], G[:, hs:]):
        sim = torch.dot(g1.flatten(), g2.flatten()) / (g1.norm() * g2.norm())
        if sim < 0:
            if ratio1 < 1:
                dot = torch.dot(g1.flatten(), g2.flatten())
                proj = dot / g2.norm() ** 2 * g2
                g1n = g1 - proj
                perpen = g1n - proj
                unit = perpen / perpen.norm()
                G[i_index, :hs] = g1n.norm() * unit
            elif ratio2 < 1:
                dot = torch.dot(g2.flatten(), g1.flatten())
                proj = dot / g1.norm() ** 2 * g1
                g2n = g2 - proj
                perpen = g2n - proj
                unit = perpen / perpen.norm()
                G[i_index, hs:] = g2n.norm() * unit
        i_index += 1
    return G.numpy()


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_modulation_matches_torch_loop(seed):
    rng = np.random.default_rng(seed)
    B, hs, C = 6, 8, 4
    f1 = rng.normal(size=(B, hs)).astype(np.float32)
    f2 = rng.normal(size=(B, hs)).astype(np.float32)
    labels = rng.integers(0, C, size=B)
    weight_t = rng.normal(size=(C, 2 * hs)).astype(np.float32)  # torch layout
    grad_t = rng.normal(size=(C, 2 * hs)).astype(np.float32)
    bias = rng.normal(size=(C,)).astype(np.float32)

    want = torch_reference_modulate(grad_t, f1, f2, weight_t, bias, labels)

    # flax layout: kernel = weight.T  [2*hs, C]
    got = modulate_kernel_grad(
        jnp.asarray(grad_t.T), jnp.asarray(f1), jnp.asarray(f2),
        jnp.asarray(weight_t.T), jnp.asarray(bias), jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(got).T, want, atol=2e-5, rtol=1e-4)


def test_branch_scores_match_torch(rng):
    B, hs, C = 5, 8, 3
    f1 = rng.normal(size=(B, hs)).astype(np.float32)
    f2 = rng.normal(size=(B, hs)).astype(np.float32)
    labels = rng.integers(0, C, size=B)
    weight_t = rng.normal(size=(C, 2 * hs)).astype(np.float32)
    bias = rng.normal(size=(C,)).astype(np.float32)

    W = torch.from_numpy(weight_t)
    out1 = torch.from_numpy(f1).mm(W[:, :hs].t()) + torch.from_numpy(bias) / 2
    out2 = torch.from_numpy(f2).mm(W[:, hs:].t()) + torch.from_numpy(bias) / 2
    y = torch.from_numpy(labels)
    s1t = sum(F.softmax(out1, dim=1)[i][y[i]] for i in range(B)).item()
    s2t = sum(F.softmax(out2, dim=1)[i][y[i]] for i in range(B)).item()

    s1, s2 = branch_scores(jnp.asarray(f1), jnp.asarray(f2),
                           jnp.asarray(weight_t.T), jnp.asarray(bias),
                           jnp.asarray(labels))
    assert abs(float(s1) - s1t) < 1e-5
    assert abs(float(s2) - s2t) < 1e-5


def test_no_conflict_no_change(rng):
    """Aligned half-gradients (cos >= 0) must pass through untouched."""
    hs, C = 4, 3
    g_half = rng.normal(size=(C, hs)).astype(np.float32)
    grad_t = np.concatenate([g_half, g_half * 2.0], axis=1)  # perfectly aligned
    f1 = rng.normal(size=(4, hs)).astype(np.float32)
    f2 = rng.normal(size=(4, hs)).astype(np.float32)
    labels = rng.integers(0, C, size=4)
    weight_t = rng.normal(size=(C, 2 * hs)).astype(np.float32)
    bias = np.zeros(C, dtype=np.float32)
    got = modulate_kernel_grad(
        jnp.asarray(grad_t.T), jnp.asarray(f1), jnp.asarray(f2),
        jnp.asarray(weight_t.T), jnp.asarray(bias), jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(got).T, grad_t, atol=1e-7)
