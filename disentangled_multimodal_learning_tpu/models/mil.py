"""Bag-level MIL path encoders: ABMIL / GatedABMIL / TransMIL.

Reference models/mil.py:34-259.  Inputs are precomputed WSI patch feature
bags ``[B, N, 1024]``.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import PPEG, TransLayer


class ABMIL(nn.Module):
    """Attention-MIL without gating (reference models/mil.py:34-82):
    attention scores Linear(1024->128)->Tanh->Linear(128->K), softmax over N,
    weighted bag sum, classifier + 1024->path_dim projection."""

    label_dim: int
    path_dim: int = 128
    L: int = 1024
    D: int = 128
    K: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        a = jnp.tanh(nn.Dense(self.D, name="attention_0")(x))
        a = nn.Dense(self.K, name="attention_1")(a)  # [B,N,K]
        a = jax.nn.softmax(jnp.swapaxes(a, 1, 2), axis=2)  # [B,K,N]
        m = jnp.einsum("bkn,bnl->bkl", a, x)  # [B,K,L]
        m = m.reshape(m.shape[0], self.L * self.K)
        logits = nn.Dense(self.label_dim, name="classifier")(m)
        encoded = nn.Dense(self.path_dim, name="multimodal_projection")(m)
        return encoded, logits, None


class GatedABMIL(nn.Module):
    """Gated attention MIL (reference models/mil.py:102-152; unused by the
    factory but part of the reference surface)."""

    label_dim: int = 2
    L: int = 1024
    D: int = 128
    K: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        av = jnp.tanh(nn.Dense(self.D, name="attention_V")(x))
        au = jax.nn.sigmoid(nn.Dense(self.D, name="attention_U")(x))
        a = nn.Dense(self.K, name="attention_weights")(av * au)
        a = jax.nn.softmax(jnp.swapaxes(a, 1, 2), axis=2)
        m = jnp.einsum("bkn,bnl->bkl", a, x).reshape(x.shape[0], self.L * self.K)
        prob = jax.nn.sigmoid(nn.Dense(self.label_dim, name="classifier")(m))
        pred = jnp.argmax(prob, axis=1)
        return prob, pred


class TransMIL(nn.Module):
    """Nystrom-transformer MIL (reference models/mil.py:209-259): 1024->512 fc,
    square-pad the bag by wrapping its head, cls token, TransLayer -> PPEG ->
    TransLayer, cls-token head."""

    label_dim: int
    path_dim: int = 128
    dim: int = 512
    # jax.sharding.Mesh with a 'seq' axis: shard the token axis of both
    # Nystrom attention cores (cfg.seq_shard_devices; parallel/seq_shard.py)
    seq_mesh: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        B, N, _ = x.shape
        h = nn.relu(nn.Dense(self.dim, name="_fc1")(x))

        side = int(math.ceil(math.sqrt(N)))
        add = side * side - N
        if add:
            h = jnp.concatenate([h, h[:, :add, :]], axis=1)

        cls = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.dim))
        h = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.dim)), h], axis=1)

        h = TransLayer(dim=self.dim, seq_mesh=self.seq_mesh,
                       name="layer1")(h, deterministic=deterministic)
        h = PPEG(dim=self.dim, name="pos_layer")(h, side, side)
        h = TransLayer(dim=self.dim, seq_mesh=self.seq_mesh,
                       name="layer2")(h, deterministic=deterministic)

        h = nn.LayerNorm(name="norm")(h)[:, 0]
        logits = nn.Dense(self.label_dim, name="_fc2")(h)
        encoded = nn.Dense(self.path_dim, name="multimodal_projection")(h)
        return encoded, logits, None
