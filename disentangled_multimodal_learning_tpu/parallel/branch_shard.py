"""Scale-branch parallelism: the two magnification branches on disjoint devices.

Every two-scale family in the reference runs an ARCHITECTURALLY IDENTICAL
subnetwork per magnification — TeacherNet x2 (reference models/model.py:
839-845), StudentNet x2 (:933-941), TeacherStudentNet x2 (:659-663) — whose
only interactions are the tiny logit combine and the cross-scale consistency
losses, which contract each scale's big attention maps down to small Gram
matrices BEFORE any cross-scale comparison (train/losses.py).  That makes the
scale axis a natural parallelism axis — the expert-parallel analogue for this
architecture (two "experts" = two magnifications, dense routing):

- the per-scale subnetworks' parameters are STACKED along a new leading axis
  of size 2 (``nn.vmap`` in models/teacher_student.py, ``stacked_scales``)
  and that axis is sharded over a ``'scale'`` mesh axis, so each device group
  holds and computes ONE magnification's branch;
- everything crossing scales (logits ``[B, C]``, Gram matrices ``[B, B]``,
  pooled features ``[B, 128]``) is boundary-sized, so the collectives GSPMD
  inserts at the seam are KB-scale regardless of fixdim — provided the
  Gram contractions run BEFORE the per-scale slice (the model exposes the
  scale-leading ``att_stu_stacked`` view and steps.py uses
  ``path_batch_loss_stacked`` on it).  The one exception is the teacher's
  cross-scale cross-Gram (``omic_domain_scale_loss``), an inner product
  between the two scales' maps: moving one map per compartment across the
  seam is mathematically inherent, and GSPMD emits it as the
  minimum-traffic point-to-point permute (audit:
  tools/exp_branch_partition.py).

Composition: the mesh is 2-D ``('data', 'scale')`` — batch rows split over
'data' exactly like parallel/mesh.py, each data group splitting the two
magnification branches over 'scale'.  Reachable via ``cfg.branch_devices = 2``
through ``run_training``; validated stacked==unstacked and sharded==unsharded
on the virtual CPU mesh (tests/test_parallel.py) and by the
``teacher_dp_branch`` multichip dryrun mode.

Unlike data parallelism this also cuts per-device peak MEMORY (each group
materializes only its own scale's ``[B, 8, N, K]`` attention maps and CPB
hiddens) and — unlike dp — it speeds up the B=1 latency path, where the batch
axis cannot be split further.

Note: the Pallas CPB kernels are single-chip; under a branch mesh the CPB
falls back to the partition-friendly XLA MLP path (``engage_branch``), same
as tensor parallelism (parallel/tp_shard.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# stacked-module name -> the unstacked per-scale module names it replaces
STACKED_NAMES = {
    "teacher_nets": ("teacher10_net", "teacher20_net"),
    "student_nets": ("student10_net", "student20_net"),
    "scale_nets": ("scale10_net", "scale20_net"),
}


def make_dp_scale_mesh(dp: int) -> Mesh:
    """2-D ``('data', 'scale')`` mesh: dp-way batch sharding x the two
    magnification branches."""
    devices = jax.devices()
    if dp * 2 > len(devices):
        raise ValueError(f"need {dp * 2} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[: dp * 2]).reshape(dp, 2),
                axis_names=("data", "scale"))


def scale_partition_specs(params, axis: str = "scale"):
    """PartitionSpec pytree matching ``params``: leading-axis sharding for
    every leaf under a stacked scale module, replicated elsewhere."""

    def leaf_spec(x):
        return P(axis, *([None] * (getattr(x, "ndim", 1) - 1)))

    def walk(node, inside: bool):
        if not isinstance(node, dict):
            return leaf_spec(node) if inside else P()
        return {k: walk(v, inside or k in STACKED_NAMES)
                for k, v in node.items()}

    return walk(params, False)


def shard_params_branch(params, mesh: Mesh):
    """device_put ``params`` with scale-sharded NamedShardings on ``mesh``
    (which must carry a 'scale' axis)."""
    specs = scale_partition_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: isinstance(x, P))


def stack_scale_params(params):
    """Convert an UNSTACKED param tree (separate ``teacher10_net`` /
    ``teacher20_net`` subtrees) to the STACKED layout (one ``teacher_nets``
    subtree with leading axis 2) — e.g. to load a checkpoint trained without
    branch parallelism into a ``stacked_scales`` model.  Non-scale subtrees
    pass through unchanged."""
    out = {}
    consumed = set()
    for stacked, (n10, n20) in STACKED_NAMES.items():
        if n10 in params and n20 in params:
            out[stacked] = jax.tree_util.tree_map(
                lambda a, b: jnp.stack([jnp.asarray(a), jnp.asarray(b)]),
                params[n10], params[n20])
            consumed.update((n10, n20))
    for k, v in params.items():
        if k not in consumed:
            out[k] = v
    return out


def unstack_scale_params(params):
    """Inverse of :func:`stack_scale_params` — e.g. to export a
    branch-parallel checkpoint for single-chip inference."""
    out = {}
    for k, v in params.items():
        if k in STACKED_NAMES:
            n10, n20 = STACKED_NAMES[k]
            out[n10] = jax.tree_util.tree_map(lambda a: a[0], v)
            out[n20] = jax.tree_util.tree_map(lambda a: a[1], v)
        else:
            out[k] = v
    return out


def engage_branch():
    """Disable the (single-chip) Pallas CPB kernels so the attention takes
    the GSPMD-partitionable XLA path under a branch mesh."""
    from ..models import deform_attention

    deform_attention.CPB_USE_PALLAS = False
