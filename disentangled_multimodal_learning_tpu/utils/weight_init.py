"""Post-init weight re-initialization — the reference's ``init_net`` /
``init_weights`` (reference utils/utils.py:180-242), rebuilt as a pure
transform over a flax variables tree.

The reference applies, module-by-module via ``net.apply``:
  - Conv*/Linear weights: normal(0, gain) | xavier_normal(gain) |
    kaiming_normal(a=0, fan_in) | orthogonal(gain); biases -> 0
  - BatchNorm2d: weight ~ normal(1.0, gain), bias -> 0
  - everything else (raw nn.Parameters, LayerNorm, embeddings) untouched
``init_type='max'`` means "self-normalizing init inside MaxNet only" and
``'none'`` means "leave framework defaults" — both are no-ops here (MaxNet
handles 'max' itself via its ``init_max`` flag, models/maxnet.py).

Flax mapping: Dense/Conv kernels are the leaves named ``kernel`` with
ndim >= 2 (their sibling ``bias`` is zeroed); BatchNorm modules are
identified EXACTLY as the module paths present in the ``batch_stats``
collection (LayerNorm has no batch_stats, so its ``scale``/``bias`` stay
untouched, matching the reference's classname filter).  Fan computation
follows flax kernel layout ([..., in, out]; torch's is [out, in, ...]) —
same fan values, so xavier/kaiming std match the torch semantics.
Orthogonal fills the 2-D reshape (prod(leading), out) orthonormally where
torch uses (out, prod(rest)); both deliver a gain-scaled semi-orthogonal
matrix, which is the property the init provides.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

VALID_INIT_TYPES = ("max", "none", "normal", "xavier", "kaiming", "orthogonal")


def _initializer(init_type: str, init_gain: float):
    ini = jax.nn.initializers
    if init_type == "normal":
        return ini.normal(stddev=init_gain)
    if init_type == "xavier":
        # torch xavier_normal_: std = gain * sqrt(2 / (fan_in + fan_out))
        return ini.variance_scaling(init_gain ** 2, "fan_avg", "normal")
    if init_type == "kaiming":
        # torch kaiming_normal_(a=0, mode='fan_in'): std = sqrt(2 / fan_in);
        # gain unused, as in the reference (utils/utils.py:197)
        return ini.variance_scaling(2.0, "fan_in", "normal")
    if init_type == "orthogonal":
        return ini.orthogonal(scale=init_gain, column_axis=-1)
    raise NotImplementedError(
        f"initialization method [{init_type}] is not implemented")


def apply_init_type(variables: dict, init_type: str, init_gain: float = 0.02,
                    seed: int = 0) -> dict:
    """Return ``variables`` with params re-initialized per ``init_type``.

    No-op for 'max'/'none'.  Only the 'params' collection changes;
    batch_stats (and any other collection) pass through untouched.
    """
    if init_type in ("max", "none"):
        return variables
    init_fn = _initializer(init_type, init_gain)

    params = variables.get("params", variables)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)

    # module paths (tuples of name strings, leaf name excluded) that own
    # batch_stats == the BatchNorm modules, exactly
    bn_paths = set()
    for path, _ in jax.tree_util.tree_flatten_with_path(
            variables.get("batch_stats", {}))[0]:
        bn_paths.add(tuple(getattr(k, "key", k) for k in path[:-1]))

    # module paths owning a >=2-D 'kernel' leaf == the Dense/Conv modules
    # (their sibling 'bias' is zeroed, other modules' biases untouched)
    kernel_paths = set()
    for path, leaf in flat:
        names = tuple(getattr(k, "key", k) for k in path)
        if names[-1] == "kernel" and getattr(leaf, "ndim", 0) >= 2:
            kernel_paths.add(names[:-1])

    key = jax.random.PRNGKey(seed)
    new_leaves = []
    for i, (path, leaf) in enumerate(flat):
        names = tuple(getattr(k, "key", k) for k in path)
        owner, leaf_name = names[:-1], names[-1]
        if owner in bn_paths:
            if leaf_name == "scale":  # BN weight ~ normal(1.0, gain)
                leaf = 1.0 + init_gain * jax.random.normal(
                    jax.random.fold_in(key, i), leaf.shape, leaf.dtype)
            elif leaf_name == "bias":
                leaf = jnp.zeros_like(leaf)
        elif leaf_name == "kernel" and getattr(leaf, "ndim", 0) >= 2:
            leaf = init_fn(jax.random.fold_in(key, i), leaf.shape, leaf.dtype)
        elif leaf_name == "bias" and owner in kernel_paths:
            leaf = jnp.zeros_like(leaf)
        new_leaves.append(leaf)
    new_params = jax.tree_util.tree_unflatten(treedef, new_leaves)

    if "params" in variables:
        out = dict(variables)
        out["params"] = new_params
        return out
    return new_params
