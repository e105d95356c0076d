"""Late-fusion and missing-modality pathomic baselines.

- PathomicNet          -> reference models/model.py:384-469
- PathomicNet_Original -> reference models/model.py:281-382
- PathomicNet_FG       -> reference models/model.py:1324-1395 (AE generates a
  pseudo-omic vector from the path feature; used at train AND test)
- PathomicNet_Ensemble -> reference models/model.py:1401-1450 (logit average
  at train, path-only logits at test)
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .fusion import BilinearFusion
from .maxnet import MaxNet
from .mil import ABMIL


class _FusionMixin:
    def _fuse(self, path_vec, omic_vec, deterministic):
        if self.fusion_type == "concat":
            return jnp.concatenate([path_vec, omic_vec], axis=1)
        if self.fusion_type == "add":
            return path_vec + omic_vec
        return BilinearFusion(
            skip=self.skip, use_bilinear=self.use_bilinear, gate1=self.path_gate,
            gate2=self.omic_gate, dim1=self.path_dim, dim2=self.omic_dim,
            scale_dim1=self.path_scale, scale_dim2=self.omic_scale,
            mmhid=self.mmhid, dropout_rate=self.dropout_rate, name="fusion",
        )(path_vec, omic_vec, deterministic=deterministic)


class PathomicNet(nn.Module, _FusionMixin):
    label_dim: int
    input_size_omic: int
    path_dim: int = 128
    omic_dim: int = 128
    mmhid: int = 128
    dropout_rate: float = 0.25
    fusion_type: str = "concat"
    skip: int = 0
    use_bilinear: int = 1
    path_gate: int = 1
    omic_gate: int = 1
    path_scale: int = 1
    omic_scale: int = 1

    @nn.compact
    def __call__(self, x_path, x_omic, deterministic: bool = True, **_):
        path_vec, logits_path, _ = ABMIL(self.label_dim, self.path_dim,
                                         name="path_net")(x_path, deterministic)
        omic_vec, logits_omic, _ = MaxNet(self.input_size_omic, self.omic_dim,
                                          dropout_rate=self.dropout_rate,
                                          label_dim=self.label_dim,
                                          name="omic_net")(x_omic, deterministic)
        features = self._fuse(path_vec, omic_vec, deterministic)
        logits_final = nn.Dense(self.label_dim, name="classifier")(features)
        logits = [logits_path, logits_omic, logits_final]
        return features, path_vec, omic_vec, logits, None, None, None


class PathomicNet_Original(nn.Module, _FusionMixin):
    """Mean-pooled path branch variant (reference models/model.py:281-382):
    path feature = Linear(mean over patches); per-patch path classifier."""

    label_dim: int
    input_size_omic: int
    path_dim: int = 128
    omic_dim: int = 128
    mmhid: int = 128
    dropout_rate: float = 0.25
    fusion_type: str = "concat"
    skip: int = 0
    use_bilinear: int = 1
    path_gate: int = 1
    omic_gate: int = 1
    path_scale: int = 1
    omic_scale: int = 1

    @nn.compact
    def __call__(self, x_path, x_omic, deterministic: bool = True, **_):
        path_vec = nn.Dense(self.path_dim, name="path_net")(jnp.mean(x_path, axis=1))
        hazard_path = nn.Dense(self.label_dim, name="path_classifier")(x_path)
        omic_vec, hazard_omic, _ = MaxNet(self.input_size_omic, self.omic_dim,
                                          dropout_rate=self.dropout_rate,
                                          label_dim=self.label_dim,
                                          name="omic_net")(x_omic, deterministic)
        features = self._fuse(path_vec, omic_vec, deterministic)
        hazard = nn.Dense(self.label_dim, name="classifier")(features)
        logits = [hazard_path, hazard_omic, hazard]
        return 0, 0, 0, logits, 0, 0, 0


class PathomicNet_FG(nn.Module):
    """Missing-modality: a small AE generates a pseudo-omic vector from the
    path feature; fused logits always use the generated vector
    (reference models/model.py:1353-1374)."""

    label_dim: int
    input_size_omic: int
    path_dim: int = 128
    omic_dim: int = 128
    mmhid: int = 128
    dropout_rate: float = 0.25

    @nn.compact
    def __call__(self, x_path, x_omic, is_training: bool = True,
                 deterministic: bool = True, **_):
        path_vec, logits_path, _ = ABMIL(self.label_dim, self.path_dim,
                                         name="path_net")(x_path, deterministic)
        omic_vec, logits_omic, _ = MaxNet(self.input_size_omic, self.omic_dim,
                                          dropout_rate=self.dropout_rate,
                                          label_dim=self.label_dim,
                                          name="omic_net")(x_omic, deterministic)
        h = nn.Dense(64, name="ae_down")(path_vec)
        h = nn.LayerNorm(name="ae_norm")(h)
        path2omic = nn.Dense(self.mmhid, name="ae_up")(h)
        features = jnp.concatenate([path_vec, path2omic], axis=1)
        logits_final = nn.Dense(self.label_dim, name="classifier")(features)
        logits = [logits_path, logits_omic, logits_final]
        return features, path2omic, omic_vec, logits, None, None, None


class PathomicNet_Ensemble(nn.Module):
    """Missing-modality: average path/omic logits at train, path-only at test
    (reference models/model.py:1418-1435)."""

    label_dim: int
    input_size_omic: int
    path_dim: int = 128
    omic_dim: int = 128
    mmhid: int = 128
    dropout_rate: float = 0.25

    @nn.compact
    def __call__(self, x_path, x_omic, is_training: bool = True,
                 deterministic: bool = True, **_):
        path_vec, logits_path, _ = ABMIL(self.label_dim, self.path_dim,
                                         name="path_net")(x_path, deterministic)
        omic_vec, logits_omic, _ = MaxNet(self.input_size_omic, self.omic_dim,
                                          dropout_rate=self.dropout_rate,
                                          label_dim=self.label_dim,
                                          name="omic_net")(x_omic, deterministic)
        features = jnp.concatenate([path_vec, omic_vec], axis=1)
        if is_training:
            logits_final = (logits_path + logits_omic) / 2
        else:
            logits_final = logits_path
        logits = [logits_path, logits_omic, logits_final]
        return features, path_vec, omic_vec, logits, None, None, None
