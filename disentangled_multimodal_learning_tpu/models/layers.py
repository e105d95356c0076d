"""Shared building blocks (implemented ONCE — the reference duplicates these
across files: Pooler x3, FusionNet x2, TransLayer/PPEG x3, patched MHA x2,
see SURVEY.md §2.2).

All modules are flax.linen; token tensors are channels-last ``[B, N, C]``.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.nystrom import nystrom_attention

# ---------------------------------------------------------------------------
# init helpers
# ---------------------------------------------------------------------------

def max_init() -> Callable:
    """Self-normalizing init: N(0, 1/fan_in) — reference init_max_weights
    (utils/utils.py:214-219, stdv = 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        return jax.random.normal(key, shape, dtype) / jnp.sqrt(jnp.asarray(fan_in, dtype))

    return init


def alpha_dropout(x: jnp.ndarray, rate: float, rng, deterministic: bool) -> jnp.ndarray:
    """SELU-preserving AlphaDropout (torch nn.AlphaDropout semantics; used by
    the reference MaxNet/SNN blocks, models/model.py:179-201)."""
    if deterministic or rate == 0.0:
        return x
    alpha_p = -1.7580993408473766  # -scale*alpha of SELU
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    a = (keep * (1.0 + rate * alpha_p ** 2)) ** -0.5
    b = -a * alpha_p * rate
    return a * jnp.where(mask, x, alpha_p) + b


class AlphaDropout(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if deterministic or self.rate == 0.0:
            return x
        return alpha_dropout(x, self.rate, self.make_rng("dropout"), deterministic)


# ---------------------------------------------------------------------------
# small shared modules
# ---------------------------------------------------------------------------

class Pooler(nn.Module):
    """Mean-pool tokens -> dense -> tanh (reference models/Modules.py:460-492)."""

    hidden_size: int

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray) -> jnp.ndarray:
        pooled = jnp.mean(hidden_states, axis=1)
        return jnp.tanh(nn.Dense(self.hidden_size, name="dense")(pooled))


class FusionNet(nn.Module):
    """Concat two token streams + learned linear fusion
    (reference models/Modules.py:66-76)."""

    feature_dim: int = 128

    @nn.compact
    def __call__(self, feature1: jnp.ndarray, feature2: jnp.ndarray) -> jnp.ndarray:
        combined = jnp.concatenate([feature1, feature2], axis=-1)
        return nn.Dense(self.feature_dim, name="fusion_layer")(combined)


class MultiheadAttention(nn.Module):
    """Batch-first multi-head attention returning per-call attention weights.

    Replaces both torch nn.MultiheadAttention uses (reference
    models/Modules.py:54-58,82-86) and the reference's patched fork whose
    ``need_raw`` returns raw pre-softmax maps (models/MultiheadAttention.py:
    333-488, raw return at cmta_utils.py:643-655) — here a single module with
    a ``raw`` switch.

    Inputs q/k/v: ``[B, L, D]``.  Returns (out ``[B, L, D]``, attn) where attn
    is head-averaged softmax weights ``[B, L, S]`` (torch ``need_weights``
    semantics) or raw pre-softmax per-head scores ``[B, H, L, S]`` if ``raw``.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, q, k, v, *, raw: bool = False, deterministic: bool = True):
        d = self.embed_dim
        h = self.num_heads
        hd = d // h
        # torch uses one packed in-projection; keep separate Dense per q/k/v
        # (same math, cleaner sharding)
        qp = nn.Dense(d, name="q_proj")(q)
        kp = nn.Dense(d, name="k_proj")(k)
        vp = nn.Dense(d, name="v_proj")(v)

        def split(t):
            B, L, _ = t.shape
            return t.reshape(B, L, h, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = split(qp), split(kp), split(vp)
        scores = jnp.einsum("bhld,bhsd->bhls", qh, kh) / jnp.sqrt(jnp.asarray(hd, q.dtype))
        attn = jax.nn.softmax(scores, axis=-1)
        attn_d = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        out = jnp.einsum("bhls,bhsd->bhld", attn_d, vh)
        B, _, L, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(B, L, d)
        out = nn.Dense(d, name="out_proj")(out)
        return out, (scores if raw else attn.mean(axis=1))


class NystromAttention(nn.Module):
    """Landmark attention layer (projections + fused core + value residual).

    Mirrors the pip ``nystrom_attention`` package the reference imports at
    runtime (models/Modules.py:24, models/mil.py:24; vendored copy at
    models/NystromAttention.py:39-157): qkv projection without bias, the
    O(N·m) landmark attention core, a depthwise length-axis conv residual on
    values (kernel 33), and an output projection with dropout.
    """

    dim: int
    dim_head: int = 64
    heads: int = 8
    num_landmarks: int = 256
    pinv_iterations: int = 6
    residual: bool = True
    residual_conv_kernel: int = 33
    dropout: float = 0.0
    # optional jax.sharding.Mesh with a 'seq' axis: computes the landmark
    # attention core with the token axis sharded over it (for bags beyond
    # one chip's HBM — parallel/seq_shard.py; cfg.seq_shard_devices)
    seq_mesh: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, N, _ = x.shape
        h, dh = self.heads, self.dim_head
        inner = h * dh
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            return t.reshape(B, N, h, dh).transpose(0, 2, 1, 3)

        vf = v  # [B, N, inner] — kept flat for the residual conv below
        q, k, v = split(q), split(k), split(v)
        q = q * (dh ** -0.5)
        if self.seq_mesh is not None:
            from ..parallel.seq_shard import nystrom_attention_seq_sharded
            out = nystrom_attention_seq_sharded(
                q, k, v, self.num_landmarks, self.seq_mesh,
                self.pinv_iterations)
        else:
            out = nystrom_attention(q, k, v, self.num_landmarks,
                                    self.pinv_iterations)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, inner)

        if self.residual:
            # depthwise conv over the length axis, one filter per head
            # (reference res_conv: Conv2d(heads, heads, (33,1), groups=heads),
            # models/NystromAttention.py:72).  Computed on the FLAT [B, N,
            # inner] values with each head's filter repeated across its 64
            # head-dims: identical math, but 512 channels ride the lane axis
            # instead of 8 (the 8-channel NHWC formulation measured
            # 5.0 ms fwd+bwd on v5e for 0.35 GFLOP; this one ~0.4 ms).
            ker = self.param(
                "res_conv", nn.initializers.lecun_normal(),
                (self.residual_conv_kernel, 1, 1, h),
            )
            ker_flat = jnp.repeat(ker[:, 0, 0, :], dh, axis=1)[:, None, :]
            pad = self.residual_conv_kernel // 2
            res = jax.lax.conv_general_dilated(
                vf, ker_flat, (1,), ((pad, pad),),
                dimension_numbers=("NHC", "HIO", "NHC"),
                feature_group_count=inner,
            )
            out = out + res

        out = nn.Dense(self.dim, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)


class TransLayer(nn.Module):
    """Pre-norm Nystrom transformer block: x + attn(LN(x))
    (reference models/Modules.py:30-48, dim=128 flavor; models/mil.py:171-189
    dim=512 flavor — one implementation here)."""

    dim: int = 128
    seq_mesh: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        y = nn.LayerNorm(name="norm")(x)
        y = NystromAttention(
            dim=self.dim, dim_head=self.dim // 8, heads=8,
            num_landmarks=self.dim // 2, pinv_iterations=6,
            residual=True, dropout=0.1, seq_mesh=self.seq_mesh, name="attn",
        )(y, deterministic=deterministic)
        return x + y


class TransFusionLayer(nn.Module):
    """Cross-attention of all tokens onto a single kv token, residual, then
    Pooler -> ``[B, 1, D]`` (reference models/Modules.py:78-99)."""

    dim: int = 128

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, deterministic: bool = True):
        norm = nn.LayerNorm(name="norm")
        attn_out, attn_w = MultiheadAttention(
            embed_dim=self.dim, num_heads=8, dropout=0.1, name="multihead_attn"
        )(norm(x1), norm(x2), norm(x2), deterministic=deterministic)
        x = x1 + attn_out
        pooled = Pooler(self.dim, name="pooler")(norm(x))
        return pooled[:, None, :], attn_w


class CrossAttLayer(nn.Module):
    """Residual cross-attention block (reference models/Modules.py:50-64)."""

    dim: int = 128

    @nn.compact
    def __call__(self, x1, x2, deterministic: bool = True):
        norm = nn.LayerNorm(name="norm")
        out, _ = MultiheadAttention(
            embed_dim=self.dim, num_heads=8, dropout=0.1, name="multihead_attn"
        )(norm(x1), norm(x2), norm(x2), deterministic=deterministic)
        return x1 + out


class PPEG(nn.Module):
    """Pyramid positional encoding: 3 depthwise convs (7/5/3) + identity on
    the token grid, cls token passed through (reference models/mil.py:192-206)."""

    dim: int = 512

    @nn.compact
    def __call__(self, x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
        B, _, C = x.shape
        cls_token, feat = x[:, :1], x[:, 1:]
        img = feat.reshape(B, H, W, C)

        def dwconv(k, name):
            ker = self.param(name, nn.initializers.lecun_normal(), (k, k, 1, C))
            bias = self.param(name + "_bias", nn.initializers.zeros, (C,))
            y = jax.lax.conv_general_dilated(
                img, ker, (1, 1), ((k // 2, k // 2), (k // 2, k // 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
            )
            return y + bias

        y = img + dwconv(7, "proj") + dwconv(5, "proj1") + dwconv(3, "proj2")
        return jnp.concatenate([cls_token, y.reshape(B, H * W, C)], axis=1)


class TorchTransformerEncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer equivalent (post-norm, relu FFN) as
    used by MCAT's path/omic transformers (reference models/model.py:1010-1017)."""

    d_model: int = 256
    nhead: int = 8
    dim_feedforward: int = 512
    dropout: float = 0.25

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        attn_out, _ = MultiheadAttention(
            embed_dim=self.d_model, num_heads=self.nhead, dropout=self.dropout,
            name="self_attn",
        )(x, x, x, deterministic=deterministic)
        x = x + nn.Dropout(self.dropout, deterministic=deterministic)(attn_out)
        x = nn.LayerNorm(name="norm1")(x)
        y = nn.Dense(self.dim_feedforward, name="linear1")(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        y = nn.Dense(self.d_model, name="linear2")(y)
        x = x + nn.Dropout(self.dropout, deterministic=deterministic)(y)
        return nn.LayerNorm(name="norm2")(x)


class Attn_Net_Gated(nn.Module):
    """Gated attention pooling head (reference models/mcat_utils.py:115-145)."""

    L: int = 1024
    D: int = 256
    dropout: bool = False
    n_classes: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        a = jnp.tanh(nn.Dense(self.D, name="attention_a")(x))
        b = jax.nn.sigmoid(nn.Dense(self.D, name="attention_b")(x))
        if self.dropout:
            a = nn.Dropout(0.25, deterministic=deterministic)(a)
            b = nn.Dropout(0.25, deterministic=deterministic)(b)
        A = nn.Dense(self.n_classes, name="attention_c")(a * b)
        return A, x


def combine_logits(logits1: jnp.ndarray, logits2: jnp.ndarray, combination_type: str,
                   weights=None) -> jnp.ndarray:
    """Multi-scale logit combination — all four modes of the reference
    (models/model.py:623-647).  ``max_confidence`` uses jnp.where on a
    confidence mask (no Python control flow on traced values)."""
    if combination_type == "average":
        return (logits1 + logits2) / 2
    if combination_type == "weighted":
        w = weights if weights is not None else (0.5, 0.5)
        return w[0] * logits1 + w[1] * logits2
    if combination_type == "softmax_average":
        p1 = jax.nn.softmax(logits1, axis=1)
        p2 = jax.nn.softmax(logits2, axis=1)
        return jnp.log((p1 + p2) / 2 + 1e-8)
    if combination_type == "max_confidence":
        c1 = jnp.max(jax.nn.softmax(logits1, axis=1), axis=1, keepdims=True)
        c2 = jnp.max(jax.nn.softmax(logits2, axis=1), axis=1, keepdims=True)
        return jnp.where(c1 > c2, logits1, logits2)
    raise ValueError(f"unknown combination_type {combination_type!r}")


def survival_chain(logits: jnp.ndarray):
    """hazards = sigmoid(logits); S = cumprod(1-h); risk = -sum(S)
    (reference models/model.py:854-864 and passim)."""
    hazards = jax.nn.sigmoid(logits)
    S = jnp.cumprod(1.0 - hazards, axis=1)
    risk = -jnp.sum(S, axis=1)
    return hazards, S, risk


class FeedForward(nn.Module):
    """GELU MLP block (reference models/NystromAttention.py:171-182)."""

    dim: int
    mult: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.dim * self.mult, name="net_0")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.dim, name="net_2")(h)


class Nystromformer(nn.Module):
    """Full pre-norm Nystrom transformer stack
    (reference models/NystromAttention.py:184-212)."""

    dim: int
    depth: int
    dim_head: int = 64
    heads: int = 8
    num_landmarks: int = 256
    pinv_iterations: int = 6
    attn_values_residual: bool = True
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.depth):
            y = nn.LayerNorm(name=f"attn_norm_{i}")(x)
            y = NystromAttention(
                dim=self.dim, dim_head=self.dim_head, heads=self.heads,
                num_landmarks=self.num_landmarks,
                pinv_iterations=self.pinv_iterations,
                residual=self.attn_values_residual,
                dropout=self.attn_dropout, name=f"attn_{i}",
            )(y, deterministic=deterministic)
            x = x + y
            y = nn.LayerNorm(name=f"ff_norm_{i}")(x)
            y = FeedForward(self.dim, dropout=self.ff_dropout,
                            name=f"ff_{i}")(y, deterministic=deterministic)
            x = x + y
        return x
