"""Gated (bi/tri)linear Kronecker fusion (reference models/fusion.py:6-201).

The reference vendors FOUR copies of BilinearFusion (models/fusion.py,
mcat_utils.py:14-78, cmta_utils.py:31-113 — two with a broken super() call);
this is the single canonical implementation.

BatchNorm note: the encoders here hold the ONLY BatchNorm in the main model
path (reference models/fusion.py:29-32) — the reason the reference vendors a
800-line SyncBatchNorm package.  Under jit with a batch sharded over the
``data`` mesh axis, flax BatchNorm stats are computed over the GLOBAL batch
automatically; the thread/queue SyncBN machinery disappears.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import max_init


class BilinearFusion(nn.Module):
    skip: int = 1
    use_bilinear: int = 1
    gate1: int = 1
    gate2: int = 1
    dim1: int = 32
    dim2: int = 32
    scale_dim1: int = 1
    scale_dim2: int = 1
    mmhid: int = 64
    dropout_rate: float = 0.25
    use_batchnorm: bool = True

    @nn.compact
    def __call__(self, vec1: jnp.ndarray, vec2: jnp.ndarray, deterministic: bool = True):
        kinit = max_init()
        d1og, d2og = self.dim1, self.dim2
        d1, d2 = self.dim1 // self.scale_dim1, self.dim2 // self.scale_dim2
        dense = lambda f, name: nn.Dense(f, kernel_init=kinit, name=name)
        drop = lambda x: nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)

        vec1 = nn.relu(vec1)
        vec2 = nn.relu(vec2)

        def gated(vec_self, gate_on, dd, tag):
            h = nn.relu(dense(dd, f"linear_h{tag}")(vec_self))
            if gate_on:
                if self.use_bilinear:
                    # nn.Bilinear(d1og, d2og, dd): z_k = v1 W_k v2 + b_k
                    w = self.param(f"bilinear_w{tag}", nn.initializers.normal(0.02),
                                   (dd, d1og, d2og))
                    b = self.param(f"bilinear_b{tag}", nn.initializers.zeros, (dd,))
                    z = jnp.einsum("bi,kij,bj->bk", vec1, w, vec2) + b
                else:
                    z = dense(dd, f"linear_z{tag}")(jnp.concatenate([vec1, vec2], 1))
                h = jax.nn.sigmoid(z) * h
            o = drop(nn.relu(dense(dd, f"linear_o{tag}")(h)))
            return o

        o1 = gated(vec1, self.gate1, d1, "1")
        o2 = gated(vec2, self.gate2, d2, "2")

        ones = jnp.ones((o1.shape[0], 1), dtype=o1.dtype)
        o1 = jnp.concatenate([o1, ones], axis=1)
        o2 = jnp.concatenate([o2, ones], axis=1)
        o12 = jnp.einsum("bi,bj->bij", o1, o2).reshape(o1.shape[0], -1)
        out = drop(o12)

        def encoder(x, in_to, name):
            x = dense(in_to, name)(x)
            if self.use_batchnorm:
                x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                                 name=name + "_bn")(x)
            return drop(nn.relu(x))

        out = encoder(out, self.mmhid, "encoder1")
        if self.skip:
            out = jnp.concatenate([out, o1, o2], axis=1)
        out = encoder(out, self.mmhid, "encoder2")
        return out


class TrilinearFusion(nn.Module):
    """Trilinear gated Kronecker fusion (reference models/fusion.py:66-201).
    ``variant`` 'A' or 'B' selects which pairs gate each other."""

    variant: str = "A"
    skip: int = 1
    use_bilinear: int = 1
    gate1: int = 1
    gate2: int = 1
    gate3: int = 1
    dim1: int = 32
    dim2: int = 32
    dim3: int = 32
    scale_dim1: int = 1
    scale_dim2: int = 1
    scale_dim3: int = 1
    mmhid: int = 96
    dropout_rate: float = 0.25

    @nn.compact
    def __call__(self, vec1, vec2, vec3, deterministic: bool = True):
        kinit = max_init()
        dims_og = (self.dim1, self.dim2, self.dim3)
        dims = (self.dim1 // self.scale_dim1, self.dim2 // self.scale_dim2,
                self.dim3 // self.scale_dim3)
        dense = lambda f, name: nn.Dense(f, kernel_init=kinit, name=name)
        drop = lambda x: nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        vecs = (vec1, vec2, vec3)

        # gating pairs per variant (reference fusion.py:99-120 / 168-189)
        pair = {
            "A": {1: (0, 2), 2: (1, 2), 3: (0, 2)},
            "B": {1: (0, 2), 2: (1, 0), 3: (0, 2)},
        }[self.variant]
        gates = (self.gate1, self.gate2, self.gate3)

        outs = []
        for tag in (1, 2, 3):
            vs = vecs[tag - 1]
            dd = dims[tag - 1]
            h = nn.relu(dense(dd, f"linear_h{tag}")(vs))
            if gates[tag - 1]:
                a_ix, b_ix = pair[tag]
                va, vb = vecs[a_ix], vecs[b_ix]
                if self.use_bilinear:
                    w = self.param(f"bilinear_w{tag}", nn.initializers.normal(0.02),
                                   (dd, dims_og[a_ix], dims_og[b_ix]))
                    b = self.param(f"bilinear_b{tag}", nn.initializers.zeros, (dd,))
                    z = jnp.einsum("bi,kij,bj->bk", va, w, vb) + b
                else:
                    z = dense(dd, f"linear_z{tag}")(jnp.concatenate([va, vb], 1))
                h = jax.nn.sigmoid(z) * h
            outs.append(drop(nn.relu(dense(dd, f"linear_o{tag}")(h))))

        B = outs[0].shape[0]
        ones = jnp.ones((B, 1), dtype=outs[0].dtype)
        o1, o2, o3 = [jnp.concatenate([o, ones], axis=1) for o in outs]
        o12 = jnp.einsum("bi,bj->bij", o1, o2).reshape(B, -1)
        o123 = jnp.einsum("bi,bj->bij", o12, o3).reshape(B, -1)
        out = drop(o123)
        out = drop(nn.relu(dense(self.mmhid, "encoder1")(out)))
        if self.skip:
            out = jnp.concatenate([out, o1, o2, o3], axis=1)
        out = drop(nn.relu(dense(self.mmhid, "encoder2")(out)))
        return out
