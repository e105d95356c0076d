"""Disentangled deformable cross-attention fusion models.

- DeformCrossTransLayer / DeformCrossTransMIL -> reference
  models/DeformCrossTransMIL.py:40-203
- DeformPathomicNet -> reference models/model.py:471-568
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .deform_attention import DeformCrossAttention1D, DeformCrossAttention2D
from .layers import FusionNet, Pooler
from .maxnet import MaxNet


class DeformCrossTransLayer(nn.Module):
    """Residual deformable cross-attn block, 1-D or 2-D flavor
    (reference models/DeformCrossTransMIL.py:40-77)."""

    dim: int = 128
    degenerate_1d_sampling: bool = False

    @nn.compact
    def __call__(self, x1, x2, attn_dim: int, return_vgrid: bool = False,
                 deterministic: bool = True):
        norm = nn.LayerNorm(name="norm")
        if attn_dim == 1:
            attn1d = DeformCrossAttention1D(
                dim=self.dim, downsample_factor=4, offset_scale=2,
                offset_kernel_size=6, degenerate_sampling=self.degenerate_1d_sampling,
                name="attn1d")
            x = attn1d(norm(x1), norm(x2), deterministic=deterministic)
            return x1 + x
        attn2d = DeformCrossAttention2D(
            dim=self.dim, dim_head=64, heads=8, dropout=0.1, downsample_factor=4,
            offset_scale=4, offset_groups=8, offset_kernel_size=6, name="attn2d")
        if return_vgrid:
            x, vgrid = attn2d(norm(x1), norm(x2), return_vgrid=True,
                              deterministic=deterministic)
            return x1 + x, vgrid
        x, _ = attn2d(norm(x1), norm(x2), deterministic=deterministic)
        return x1 + x


class DeformCrossTransMIL(nn.Module):
    """Path 1024->128 fc, omic broadcast + FusionNet, deformable cross layer
    (cls-token + 1-D, or 2-D + Pooler), classifier + projection
    (reference models/DeformCrossTransMIL.py:79-161)."""

    label_dim: int = 4
    path_dim: int = 128
    attn_dim: int = 2
    return_vgrid: bool = False
    degenerate_1d_sampling: bool = False

    @nn.compact
    def __call__(self, path: jnp.ndarray, omic: jnp.ndarray, deterministic: bool = True):
        B = path.shape[0]
        path = nn.relu(nn.Dense(self.path_dim, name="_fc1")(path))  # [B,N,C]
        N = path.shape[1]
        omic_b = jnp.broadcast_to(omic[:, None, :], (B, N, self.path_dim))
        h = FusionNet(self.path_dim, name="fusion_layer")(path, omic_b)

        layer3 = DeformCrossTransLayer(
            self.path_dim, degenerate_1d_sampling=self.degenerate_1d_sampling,
            name="layer3")
        vgrid = None
        if self.attn_dim == 1:
            cls = self.param("cls_token", nn.initializers.normal(1.0),
                             (1, 1, self.path_dim))
            cls_b = jnp.broadcast_to(cls, (B, 1, self.path_dim))
            h = jnp.concatenate([cls_b, h], axis=1)
            path_c = jnp.concatenate([cls_b, path], axis=1)
            h = layer3(h, path_c, 1, deterministic=deterministic)
            h = nn.LayerNorm(name="norm")(h)[:, 0]
        else:
            if self.return_vgrid:
                h, vgrid = layer3(h, path, 2, return_vgrid=True,
                                  deterministic=deterministic)
            else:
                h = layer3(h, path, 2, deterministic=deterministic)
            h = Pooler(self.path_dim, name="pooler")(nn.LayerNorm(name="norm")(h))

        logits = nn.Dense(self.label_dim, name="_fc2")(h)
        encoded = nn.Dense(self.path_dim, name="multimodal_projection")(h)
        if self.return_vgrid:
            return encoded, logits, None, omic_b, vgrid
        return encoded, logits, None


class DeformPathomicNet(nn.Module):
    """Disentangled tumor/immune fusion model (reference models/model.py:471-568):
    two MaxNet omic encoders + two DeformCrossTransMIL branches, concat (or
    gated-bilinear) fusion, three classifiers; sigmoid on survival."""

    label_dim: int
    input_size_omic_tumor: int
    input_size_omic_immune: int
    path_dim: int = 128
    omic_dim: int = 128
    mmhid: int = 128
    dropout_rate: float = 0.1
    attn_dim: int = 2
    return_vgrid: bool = False
    fusion_type: str = "concat"
    task_type: str = "diag2021"
    # bit-exact emulation of the reference's degenerate pad-to-2D 1-D
    # grid_sample trick (reference models/DeformableAttention1D.py:36-43);
    # only meaningful with attn_dim=1
    degenerate_1d_sampling: bool = False

    @nn.compact
    def __call__(self, x_path, x_omic, x_omic_tumor, x_omic_immune,
                 deterministic: bool = True):
        omic_t, _, _ = MaxNet(self.input_size_omic_tumor, self.omic_dim,
                              dropout_rate=self.dropout_rate, label_dim=self.label_dim,
                              name="omic_net_tumor")(x_omic_tumor, deterministic)
        omic_i, _, _ = MaxNet(self.input_size_omic_immune, self.omic_dim,
                              dropout_rate=self.dropout_rate, label_dim=self.label_dim,
                              name="omic_net_immune")(x_omic_immune, deterministic)

        mil = lambda name: DeformCrossTransMIL(
            self.label_dim, self.path_dim, self.attn_dim, self.return_vgrid,
            degenerate_1d_sampling=self.degenerate_1d_sampling, name=name)
        out_t = mil("pathomic_net_tumor")(x_path, omic_t, deterministic)
        out_i = mil("pathomic_net_immune")(x_path, omic_i, deterministic)
        vec_t, vec_i = out_t[0], out_i[0]

        if self.fusion_type == "concat":
            features = jnp.concatenate([vec_t, vec_i], axis=1)
        else:
            from .fusion import BilinearFusion

            features = BilinearFusion(dim1=self.path_dim, dim2=self.omic_dim,
                                      mmhid=self.mmhid, name="fusion")(
                vec_t, vec_i, deterministic=deterministic)

        hazard = nn.Dense(self.label_dim, name="classifier")(features)
        hazard_t = nn.Dense(self.label_dim, name="classifier_tumor")(vec_t)
        hazard_i = nn.Dense(self.label_dim, name="classifier_immune")(vec_i)

        if self.task_type == "survival":
            hazard = jax.nn.sigmoid(hazard)
            hazard_t = jax.nn.sigmoid(hazard_t)
            hazard_i = jax.nn.sigmoid(hazard_i)

        if self.return_vgrid:
            # logits layout: [tumor, immune, fused, omic_t, vgrid_t, omic_i, vgrid_i]
            # (reference models/model.py:563-564)
            logits = [hazard_t, hazard_i, hazard, out_t[3], out_t[4], out_i[3], out_i[4]]
        else:
            logits = [hazard_t, hazard_i, hazard]
        return features, vec_t, vec_i, logits, None, None, None
