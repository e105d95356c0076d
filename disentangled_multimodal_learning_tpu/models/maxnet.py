"""Self-normalizing genomics encoder (SNN / "MaxNet").

Reference models/model.py:173-270: four [Linear -> ELU -> AlphaDropout]
blocks (hidden 64/48/32/32 -> omic_dim), ReLU head, linear classifier,
self-normalizing N(0, 1/fan_in) init.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import AlphaDropout, max_init


class MaxNet(nn.Module):
    input_dim: int = 59
    omic_dim: int = 32
    dropout_rate: float = 0.25
    label_dim: int = 1
    init_max: bool = True
    with_classifier: bool = True

    @nn.compact
    def __call__(self, x_omic: jnp.ndarray, deterministic: bool = True):
        hidden = [64, 48, 32, 32]
        kinit = max_init() if self.init_max else nn.initializers.lecun_normal()
        h = x_omic
        dims = hidden[:3] + [self.omic_dim]
        for i, d in enumerate(dims):
            h = nn.Dense(d, kernel_init=kinit, name=f"encoder_{i}")(h)
            h = nn.elu(h)
            h = AlphaDropout(self.dropout_rate, name=f"adrop_{i}")(h, deterministic)
        features = nn.relu(h)
        if not self.with_classifier:
            # MaxNet_noclassifier returns (features, features, None)
            # (reference models/model.py:260-270)
            return features, features, None
        logits = nn.Dense(self.label_dim, kernel_init=kinit, name="classifier")(features)
        return features, logits, None
