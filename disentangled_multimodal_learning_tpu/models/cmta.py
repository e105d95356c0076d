"""CMTA: cross-modal translation + alignment baseline
(reference models/model.py:1134-1273; Transformer_P/G at
models/cmta_utils.py:894-948).

Path & gene Nystrom-transformer encoders/decoders, P<->G token cross
attention, cls-token averaging fusion, returns the four cls tokens for the
OrthogonalLoss.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from .fusion import BilinearFusion
from .layers import PPEG, MultiheadAttention, TransLayer
from .mcat import SNNBlock


class Transformer_P(nn.Module):
    """Square-pad + cls token + TransLayer/PPEG/TransLayer
    (reference models/cmta_utils.py:894-925)."""

    feature_dim: int = 256

    @nn.compact
    def __call__(self, features, deterministic: bool = True):
        B, N, _ = features.shape
        side = int(math.ceil(math.sqrt(N)))
        add = side * side - N
        h = jnp.concatenate([features, features[:, :add, :]], axis=1) if add else features
        cls = self.param("cls_token", nn.initializers.normal(1e-6),
                         (1, 1, self.feature_dim))
        h = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.feature_dim)), h], axis=1)
        h = TransLayer(dim=self.feature_dim, name="layer1")(h, deterministic)
        h = PPEG(dim=self.feature_dim, name="pos_layer")(h, side, side)
        h = TransLayer(dim=self.feature_dim, name="layer2")(h, deterministic)
        h = nn.LayerNorm(name="norm")(h)
        return h[:, 0], h[:, 1:]


class Transformer_G(nn.Module):
    """cls token + 2 TransLayers (reference models/cmta_utils.py:928-948)."""

    feature_dim: int = 256

    @nn.compact
    def __call__(self, features, deterministic: bool = True):
        B = features.shape[0]
        cls = self.param("cls_token", nn.initializers.normal(1e-6),
                         (1, 1, self.feature_dim))
        h = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.feature_dim)), features],
                            axis=1)
        h = TransLayer(dim=self.feature_dim, name="layer1")(h, deterministic)
        h = TransLayer(dim=self.feature_dim, name="layer2")(h, deterministic)
        h = nn.LayerNorm(name="norm")(h)
        return h[:, 0], h[:, 1:]


class CMTA(nn.Module):
    label_dim: int = 4
    omic_sizes: tuple = (100, 100, 100, 131)
    fusion: str = "concat"
    dropout: float = 0.25
    size_wsi: tuple = (1024, 256, 256)
    size_omic: tuple = (256, 256)

    @nn.compact
    def __call__(self, x_path, x_omic, deterministic: bool = True, **_):
        size = self.size_wsi
        h_path = nn.relu(nn.Dense(size[1], name="wsi_net")(x_path))
        h_path = nn.Dropout(0.25, deterministic=deterministic)(h_path)

        sizes = list(self.omic_sizes)
        offs = [sum(sizes[:i]) for i in range(len(sizes))]
        hidden = list(self.size_omic)
        h_omic = []
        for i, (o, s) in enumerate(zip(offs, sizes)):
            sig = x_omic[:, o: o + s]
            h = SNNBlock(hidden[0], name=f"sig_{i}_0")(sig, deterministic)
            for j, d in enumerate(hidden[1:], start=1):
                h = SNNBlock(d, name=f"sig_{i}_{j}")(h, deterministic)
            h_omic.append(h)
        h_omic_bag = jnp.stack(h_omic, axis=1)  # [B, n_sig, 256]

        fd = hidden[-1]
        cls_p_enc, tok_p_enc = Transformer_P(fd, name="pathomics_encoder")(
            h_path, deterministic)
        cls_g_enc, tok_g_enc = Transformer_G(fd, name="genomics_encoder")(
            h_omic_bag, deterministic)

        p_in_g, _ = MultiheadAttention(embed_dim=256, num_heads=1, name="P_in_G_Att")(
            tok_p_enc, tok_g_enc, tok_g_enc, deterministic=deterministic)
        g_in_p, _ = MultiheadAttention(embed_dim=256, num_heads=1, name="G_in_P_Att")(
            tok_g_enc, tok_p_enc, tok_p_enc, deterministic=deterministic)

        cls_p_dec, _ = Transformer_P(fd, name="pathomics_decoder")(p_in_g, deterministic)
        cls_g_dec, _ = Transformer_G(fd, name="genomics_decoder")(g_in_p, deterministic)

        p_avg = (cls_p_enc + cls_p_dec) / 2
        g_avg = (cls_g_enc + cls_g_dec) / 2
        if self.fusion == "bilinear":
            fused = BilinearFusion(dim1=256, dim2=256, scale_dim1=8, scale_dim2=8,
                                   mmhid=256, name="mm")(p_avg, g_avg,
                                                         deterministic=deterministic)
        else:
            fused = jnp.concatenate([p_avg, g_avg], axis=1)
            fused = nn.relu(nn.Dense(size[2], name="mm_0")(fused))
            fused = nn.relu(nn.Dense(size[2], name="mm_1")(fused))

        logits = nn.Dense(self.label_dim, name="classifier")(fused)
        hazards = jax.nn.sigmoid(logits)
        S = jnp.cumprod(1.0 - hazards, axis=1)
        return logits, hazards, S, cls_p_enc, cls_p_dec, cls_g_enc, cls_g_dec
