"""Inspect the GSPMD partitioning of the scale-branch-parallel train step.

Compiles the full train step on a (data=1, scale=2) virtual CPU mesh with
the two magnification branches stacked and sharded (parallel/branch_shard.py)
and reports every collective in the compiled module with its byte size.  The
design claims (branch_shard.py docstring), per mode:

- student: the consistency loss (path_batch_loss) contracts each scale's
  attention maps to per-head [B,B] Grams LOCALLY before comparing, so NO
  map-sized tensor crosses the scale seam at all — every collective must be
  boundary-sized (logits, Grams, grad psums).
- teacher: the cross-scale similarity (omic_domain_scale_loss) is a
  CROSS-Gram — an inner product between the two scales' maps
  (einsum 'bhij,chij->bc') — so moving one [B,8,N,K] map per compartment
  across the seam is mathematically inherent (an inner product of vectors
  living on different devices requires transferring one of them).  GSPMD
  expresses these as point-to-point collective-permutes over ICI, which is
  the minimum-traffic form; there must still be NO all-gather of per-scale
  tensors (an all-gather would mean the branch compute itself leaked).

Measured (r3, fixdim=1600): student — zero map-sized collectives of any
kind (requires path_batch_loss_stacked: slicing the stacked maps BEFORE the
Gram contraction forced GSPMD to replicate both full maps across the seam;
contracting with the scale axis still leading keeps it partitioned);
teacher and multiscale — exactly 4 map-sized collective-permutes (att1/att2
forward + their cotangents), zero map-sized all-gathers.  At production
shapes each permute is a 46 MB ICI transfer (~0.5 ms at v5e ICI bandwidth),
overlapped by XLA with the branch compute.

Usage: python tools/exp_branch_partition.py [fixdim] [batch] [mode]
"""

from __future__ import annotations

import os
import re
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from disentangled_multimodal_learning_tpu.config import Config  # noqa: E402
from disentangled_multimodal_learning_tpu.data import (  # noqa: E402
    BagLoader, SyntheticBagDataset)
from disentangled_multimodal_learning_tpu.models.factory import (  # noqa: E402
    define_net)
from disentangled_multimodal_learning_tpu.parallel.branch_shard import (  # noqa: E402
    make_dp_scale_mesh, shard_params_branch)
from disentangled_multimodal_learning_tpu.parallel.mesh import (  # noqa: E402
    shard_batch)
from disentangled_multimodal_learning_tpu.train.optim import (  # noqa: E402
    make_optimizer)
from disentangled_multimodal_learning_tpu.train.steps import (  # noqa: E402
    batch_to_arrays, make_train_step)
from disentangled_multimodal_learning_tpu.train.trainers import (  # noqa: E402
    init_model_state)
from exp_tp_partition import shape_bytes  # noqa: E402


def main():
    fixdim = int(sys.argv[1]) if len(sys.argv) > 1 else 1600
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    mode = sys.argv[3] if len(sys.argv) > 3 else "teacher"

    cfg = Config(mode=mode, task_type="diag2021", label_dim=4,
                 fixdim=fixdim, batch_size=batch, checkpoints="#", debug=True,
                 multiscale_attention=True,
                 gradient_modulate=(mode == "teacher"),
                 branch_devices=2).validate()
    ds = SyntheticBagDataset(size=batch, fixdim=fixdim, label_dim=4, seed=0,
                             args=cfg)
    b = next(iter(BagLoader(ds, batch, shuffle=False)))
    tx = make_optimizer(cfg, 1)
    model = define_net(cfg)
    state = init_model_state(model, cfg, b, tx)
    step = make_train_step(model, cfg, tx, None)

    mesh = make_dp_scale_mesh(1)
    state = state.replace(params=shard_params_branch(state.params, mesh))
    arrays = shard_batch(batch_to_arrays(b), mesh)

    lowered = jax.jit(step).lower(state, arrays, jax.random.PRNGKey(0), None)
    txt = lowered.compile().as_text()

    colls: dict[str, list[int]] = {}
    for line in txt.splitlines():
        m = re.search(r"=\s*(\S+\[[\d,]*\][^ ]*)\s+(all-gather|all-reduce|"
                      r"reduce-scatter|collective-permute|all-to-all)\(",
                      line)
        if m:
            colls.setdefault(m.group(2), []).append(shape_bytes(m.group(1)))

    side = int(fixdim ** 0.5)
    kk = (side // 4) ** 2
    attn_bytes = batch * 8 * fixdim * kk * 4  # one scale's [B,8,N,K] f32 map
    print(f"{mode} fixdim={fixdim} B={batch} on (data=1, scale=2); "
          f"per-scale attention map = {attn_bytes/1e6:.1f} MB")
    ok = True
    big_permutes = 0
    for kind, sizes in sorted(colls.items()):
        sizes.sort(reverse=True)
        big = [s for s in sizes if s >= attn_bytes / 2]
        print(f"  {kind:20s} x{len(sizes):3d}  largest {sizes[0]/1e6:8.2f} MB"
              f"  >=half-attn-map: {len(big)}")
        if kind == "all-gather" and big:
            ok = False
        if kind == "collective-permute":
            big_permutes = len(big)
    if mode == "student" and big_permutes:
        # the student's Grams contract locally; a map-sized permute would
        # mean the per-scale contraction leaked across the seam
        ok = False
    print(("PARTITION OK: no all-gather of per-scale tensors; "
           f"{big_permutes} map-sized permutes "
           + ("(the teacher cross-Gram's inherent transfers)"
              if mode != "student" else "")) if ok
          else "PARTITION LEAK: per-scale tensor crosses the seam")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
