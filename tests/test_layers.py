"""Layer-level golden tests: AlphaDropout stats, combine_logits, survival
chain, MultiheadAttention vs torch, Pooler/FusionNet shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from disentangled_multimodal_learning_tpu.models.layers import (
    FusionNet,
    MultiheadAttention,
    Pooler,
    alpha_dropout,
    combine_logits,
    survival_chain,
)

torch = pytest.importorskip("torch")


def test_alpha_dropout_statistics():
    """AlphaDropout must preserve mean~0 / var~1 of SELU-normalized inputs
    (torch semantics)."""
    x = jnp.asarray(np.random.default_rng(0).normal(size=(200_000,)).astype(np.float32))
    y = alpha_dropout(x, 0.25, jax.random.PRNGKey(0), deterministic=False)
    y = np.asarray(y)
    assert abs(y.mean()) < 0.02
    assert abs(y.std() - 1.0) < 0.03
    # deterministic passthrough
    z = alpha_dropout(x, 0.25, jax.random.PRNGKey(0), deterministic=True)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(x))


def test_alpha_dropout_affine_matches_torch():
    """With a shared mask, our affine (a, b, alpha') must equal torch's.
    Recover torch's transform from its output on known inputs."""
    p = 0.3
    torch.manual_seed(0)
    ad = torch.nn.AlphaDropout(p)
    ad.train()
    x = torch.zeros(100_000)
    y = ad(x)
    # dropped zeros map to a*alpha'+b; kept zeros map to b
    vals = torch.unique(y)
    assert len(vals) == 2
    b_torch = float(vals.max())  # kept value: a*0 + b
    dropped_torch = float(vals.min())
    alpha_p = -1.7580993408473766
    keep = 1 - p
    a = (keep * (1 + p * alpha_p ** 2)) ** -0.5
    b = -a * alpha_p * p
    assert abs(b - b_torch) < 1e-5
    assert abs((a * alpha_p + b) - dropped_torch) < 1e-5


@pytest.mark.parametrize("mode", ["average", "softmax_average", "max_confidence",
                                  "weighted"])
def test_combine_logits_matches_torch(rng, mode):
    l1 = rng.normal(size=(5, 4)).astype(np.float32)
    l2 = rng.normal(size=(5, 4)).astype(np.float32)
    t1, t2 = torch.from_numpy(l1), torch.from_numpy(l2)
    if mode == "average":
        want = ((t1 + t2) / 2).numpy()
    elif mode == "weighted":
        want = (0.5 * t1 + 0.5 * t2).numpy()
    elif mode == "softmax_average":
        p1 = torch.softmax(t1, dim=1)
        p2 = torch.softmax(t2, dim=1)
        want = torch.log((p1 + p2) / 2 + 1e-8).numpy()
    else:
        p1 = torch.softmax(t1, dim=1)
        p2 = torch.softmax(t2, dim=1)
        c1, _ = torch.max(p1, dim=1)
        c2, _ = torch.max(p2, dim=1)
        mask = c1.unsqueeze(1) > c2.unsqueeze(1)
        want = torch.where(mask, t1, t2).numpy()
    got = np.asarray(combine_logits(jnp.asarray(l1), jnp.asarray(l2), mode))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_survival_chain_matches_torch(rng):
    logits = rng.normal(size=(3, 4)).astype(np.float32)
    t = torch.from_numpy(logits)
    h_t = torch.sigmoid(t)
    S_t = torch.cumprod(1 - h_t, dim=1)
    r_t = -torch.sum(S_t, dim=1)
    h, S, r = survival_chain(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(h), h_t.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(S), S_t.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r), r_t.numpy(), atol=1e-5)


def test_multihead_attention_matches_torch(rng):
    """Port our q/k/v/out weights into torch nn.MultiheadAttention and compare
    outputs + averaged attention weights."""
    B, L, S, D, H = 2, 5, 7, 16, 4
    q = rng.normal(size=(B, L, D)).astype(np.float32)
    k = rng.normal(size=(B, S, D)).astype(np.float32)
    v = rng.normal(size=(B, S, D)).astype(np.float32)

    mha = MultiheadAttention(embed_dim=D, num_heads=H, dropout=0.0)
    variables = mha.init(jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(k),
                         jnp.asarray(v))
    out, attn = mha.apply(variables, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))

    p = variables["params"]
    tm = torch.nn.MultiheadAttention(D, H, dropout=0.0, batch_first=True)
    with torch.no_grad():
        wq = torch.from_numpy(np.asarray(p["q_proj"]["kernel"]).T)
        wk = torch.from_numpy(np.asarray(p["k_proj"]["kernel"]).T)
        wv = torch.from_numpy(np.asarray(p["v_proj"]["kernel"]).T)
        tm.in_proj_weight.copy_(torch.cat([wq, wk, wv], dim=0))
        tm.in_proj_bias.copy_(torch.cat([
            torch.from_numpy(np.asarray(p["q_proj"]["bias"])),
            torch.from_numpy(np.asarray(p["k_proj"]["bias"])),
            torch.from_numpy(np.asarray(p["v_proj"]["bias"]))]))
        tm.out_proj.weight.copy_(torch.from_numpy(np.asarray(p["out_proj"]["kernel"]).T))
        tm.out_proj.bias.copy_(torch.from_numpy(np.asarray(p["out_proj"]["bias"])))
    tm.eval()
    want_out, want_attn = tm(torch.from_numpy(q), torch.from_numpy(k),
                             torch.from_numpy(v))
    np.testing.assert_allclose(np.asarray(out), want_out.detach().numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(attn), want_attn.detach().numpy(),
                               atol=2e-5, rtol=1e-4)


def test_pooler_and_fusionnet_shapes(rng):
    x = jnp.asarray(rng.normal(size=(2, 10, 16)).astype(np.float32))
    pool = Pooler(16)
    v = pool.init(jax.random.PRNGKey(0), x)
    out = pool.apply(v, x)
    assert out.shape == (2, 16)
    assert np.abs(np.asarray(out)).max() <= 1.0  # tanh bounded

    fus = FusionNet(16)
    v = fus.init(jax.random.PRNGKey(0), x, x)
    out = fus.apply(v, x, x)
    assert out.shape == (2, 10, 16)


def test_nystromformer_stack(rng):
    from disentangled_multimodal_learning_tpu.models.layers import Nystromformer

    x = jnp.asarray(rng.normal(size=(2, 40, 32)).astype(np.float32))
    m = Nystromformer(dim=32, depth=2, dim_head=8, heads=4, num_landmarks=8)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
