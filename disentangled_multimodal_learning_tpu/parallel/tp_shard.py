"""Tensor parallelism over deformable-attention heads / offset groups.

The teacher's hot path is the four ``DeformCrossAttention2D`` modules
(reference models/Modules.py:206-207 x two scales), whose cost is dominated
by the per-group CPB bias MLP (PERF.md) — and whose math is block-diagonal
over the 8 offset groups / heads: to_q/to_k/to_v are grouped 1x1 convs, the
offset conv and CPB rows are per-group, and the heads only meet again in the
``to_out`` projection.  That makes the group axis an ideal tensor-parallel
axis: shard the group dim of the q/k/v kernels and the row dim of ``to_out``
over a ``'model'`` mesh axis and the ONLY communication XLA must insert is
one psum of the tiny ``[B, N, dim=128]`` output per attention (Megatron-MLP
pattern, expressed as GSPMD sharding annotations instead of explicit
collectives).

``models/deform_attention.py`` keeps the group axis UNFUSED from the batch
dim precisely so these annotations propagate: every internal reshape
splits/merges with G (or heads) as the major factor, which GSPMD partitions
without resharding.  Everything outside the attention modules is replicated
over 'model' (redundant compute on tiny MLPs — the Megatron trade).

Composition: the mesh is 2-D ``('data', 'model')`` — batch rows split over
'data' exactly like parallel/mesh.py, each data group splitting attention
heads 'model'-ways.  Validated sharded==unsharded on the virtual CPU mesh
(tests/test_parallel.py) and by the ``teacher_dp_tp`` multichip dryrun mode.

Note: the Pallas CPB kernels are single-chip; under a tp mesh the CPB falls
back to the partition-friendly XLA MLP path (models/deform_attention.py
re-fuses grids only at the Pallas boundary, which GSPMD would have to
all-gather — on a real tp mesh set CPB_USE_PALLAS=False, as the tp trainers
do via :func:`engage_tp`).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_dp_tp_mesh(dp: int, tp: int) -> Mesh:
    """2-D ``('data', 'model')`` mesh: dp-way batch sharding x tp-way
    attention-head sharding."""
    devices = jax.devices()
    if dp * tp > len(devices):
        raise ValueError(f"need {dp * tp} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[: dp * tp]).reshape(dp, tp),
                axis_names=("data", "model"))


def head_partition_specs(params, axis: str = "model"):
    """PartitionSpec pytree matching ``params``: head/group-sharded specs for
    every 2-D deformable attention, replicated (``P()``) elsewhere.

    A module is recognized structurally: a dict holding a ``to_q`` whose
    kernel is rank-3 ``(G, cin, cout)`` (the GroupedPointwise signature —
    the 1-D module's ungrouped Dense projections stay replicated).  Within
    it: to_q/to_k/to_v kernels shard on the group axis, ``to_out``'s kernel
    on its row (input-channel) axis — its contraction over sharded rows is
    what makes XLA insert the output psum.
    """

    def is_tp_module(d) -> bool:
        qk = isinstance(d, dict) and isinstance(d.get("to_q"), dict) \
            and getattr(d["to_q"].get("kernel"), "ndim", 0) == 3
        return qk and isinstance(d.get("to_out"), dict)

    def walk(node, inside: bool = False):
        if not isinstance(node, dict):
            return P()
        out = {}
        for name, child in node.items():
            if is_tp_module(child):
                spec = {}
                for sub, leaf_d in child.items():
                    if sub in ("to_q", "to_k", "to_v"):
                        spec[sub] = {k: P(axis, None, None) if k == "kernel"
                                     else P() for k in leaf_d}
                    elif sub == "to_out":
                        spec[sub] = {k: P(axis, None) if k == "kernel"
                                     else P() for k in leaf_d}
                    else:  # offset conv / offset_out / rel_pos_bias: shared
                        spec[sub] = walk(leaf_d)
                out[name] = spec
            elif isinstance(child, dict):
                out[name] = walk(child)
            else:
                out[name] = P()
        return out

    return walk(params)


def shard_params_tp(params, mesh: Mesh):
    """device_put ``params`` with head-sharded NamedShardings on ``mesh``
    (which must carry a 'model' axis)."""
    specs = head_partition_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: isinstance(x, P))


def count_tp_modules(params) -> int:
    """Number of head-sharded attention modules found (diagnostics)."""
    specs = head_partition_specs(params)
    n = 0

    def visit(node):
        nonlocal n
        if isinstance(node, dict):
            if isinstance(node.get("to_q"), dict) \
                    and node["to_q"].get("kernel") == P("model", None, None):
                n += 1
            for v in node.values():
                visit(v)

    visit(specs)
    return n


def engage_tp():
    """Disable the (single-chip) Pallas CPB kernels so the attention takes
    the GSPMD-partitionable XLA path under a tp mesh."""
    from ..models import deform_attention

    deform_attention.CPB_USE_PALLAS = False
