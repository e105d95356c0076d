"""MCAT: genomic-guided co-attention survival baseline
(reference models/model.py:979-1125, helpers models/mcat_utils.py:81-145).

Pipeline: WSI fc 1024->256; four per-signature SNN towers over the omic split
[100,100,100,131]; 1-head co-attention (omic queries, path kv); two 2-layer
torch-style transformer encoders; gated attention pooling; concat/bilinear
fusion; survival chain.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .fusion import BilinearFusion
from .layers import (
    AlphaDropout,
    Attn_Net_Gated,
    MultiheadAttention,
    TorchTransformerEncoderLayer,
    max_init,
)


class SNNBlock(nn.Module):
    """Linear -> ELU -> AlphaDropout (reference models/mcat_utils.py:84-95)."""

    dim2: int
    dropout: float = 0.25

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.dim2, kernel_init=max_init(), name="fc")(x)
        h = nn.elu(h)
        return AlphaDropout(self.dropout, name="adrop")(h, deterministic)


class MCAT_Surv(nn.Module):
    label_dim: int = 4
    omic_sizes: tuple = (100, 100, 100, 131)
    fusion: str = "concat"
    dropout: float = 0.25
    size_wsi: tuple = (1024, 256, 256)  # "small" (reference models/model.py:987)
    size_omic: tuple = (256, 256)

    @nn.compact
    def __call__(self, x_path, x_omic, deterministic: bool = True, **_):
        size = self.size_wsi
        h_path_bag = nn.relu(nn.Dense(size[1], name="wsi_net")(x_path))
        h_path_bag = nn.Dropout(0.25, deterministic=deterministic)(h_path_bag)

        # per-signature SNN towers over contiguous slices of the omic vector
        # (reference models/model.py:1038)
        sizes = list(self.omic_sizes)
        offs = [sum(sizes[:i]) for i in range(len(sizes))]
        h_omic = []
        hidden = list(self.size_omic)
        for i, (o, s) in enumerate(zip(offs, sizes)):
            sig = x_omic[:, o: o + s]
            h = SNNBlock(hidden[0], name=f"sig_{i}_0")(sig, deterministic)
            for j, d in enumerate(hidden[1:], start=1):
                h = SNNBlock(d, name=f"sig_{i}_{j}")(h, deterministic)
            h_omic.append(h)
        h_omic_bag = jnp.stack(h_omic, axis=1)  # [B, n_sig, 256]

        # 1-head co-attention: omic queries, path kv (reference :1047)
        h_path_coattn, A_coattn = MultiheadAttention(
            embed_dim=256, num_heads=1, name="coattn"
        )(h_omic_bag, h_path_bag, h_path_bag, deterministic=deterministic)

        def transformer(x, prefix):
            for i in range(2):
                x = TorchTransformerEncoderLayer(
                    d_model=256, nhead=8, dim_feedforward=512, dropout=self.dropout,
                    name=f"{prefix}_{i}")(x, deterministic=deterministic)
            return x

        def pooled(x, prefix):
            A, hfeat = Attn_Net_Gated(L=size[2], D=size[2], dropout=True, n_classes=1,
                                      name=f"{prefix}_attention_head")(
                x, deterministic=deterministic)
            w = jax.nn.softmax(jnp.swapaxes(A, 1, 2), axis=2)  # [B,1,n]
            h = jnp.einsum("bkn,bnc->bkc", w, hfeat)[:, 0]
            h = nn.relu(nn.Dense(size[2], name=f"{prefix}_rho")(h))
            return nn.Dropout(self.dropout, deterministic=deterministic)(h)

        h_path = pooled(transformer(h_path_coattn, "path_transformer"), "path")
        h_omic2 = pooled(transformer(h_omic_bag, "omic_transformer"), "omic")

        if self.fusion == "bilinear":
            h = BilinearFusion(dim1=256, dim2=256, scale_dim1=8, scale_dim2=8,
                               mmhid=256, name="mm")(h_path, h_omic2,
                                                     deterministic=deterministic)
        else:
            h = jnp.concatenate([h_path, h_omic2], axis=1)
            h = nn.relu(nn.Dense(size[2], name="mm_0")(h))
            h = nn.relu(nn.Dense(size[2], name="mm_1")(h))

        logits = nn.Dense(self.label_dim, name="classifier")(h)
        hazards = jax.nn.sigmoid(logits)
        S = jnp.cumprod(1.0 - hazards, axis=1)
        return logits, hazards, S
