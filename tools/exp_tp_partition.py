"""Inspect the GSPMD partitioning of the tensor-parallel teacher step.

Compiles the full teacher train step on a (data=1, model=8) virtual CPU mesh
with the attention heads sharded (parallel/tp_shard.py) and reports every
collective in the compiled module with its byte size.  The design claim
(tp_shard.py docstring) is that head sharding needs only the Megatron-style
seam collectives — the [B, N, 128] psum/gather at each attention's to_out
and the replicated consumers right after it ([B, N, 256] fusion concat,
transfusion q/k/v projections) plus grad all-reduces of replicated params:
there must be NO all-gather of the big PER-HEAD tensors (attention maps
[B, H, N, K], CPB hiddens [B, G, N, K, 32], q/k/v [B, N, 512]).

Measured (r3, fixdim=1600): every all-gather is a [B,N,<=256] boundary
tensor; the per-head compute (CPB MLP, grid-sample, sim/softmax/PV) stays
fully partitioned.  The pass criterion compares against half the attention
map, so run with fixdim large enough that the map dwarfs the boundary
tensors (>= 1600; at production 2500 the ratio is ~9x).

Usage: python tools/exp_tp_partition.py [fixdim] [batch]
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
from disentangled_multimodal_learning_tpu.parallel.mesh import (  # noqa: E402
    shard_batch)
from disentangled_multimodal_learning_tpu.parallel.tp_shard import (  # noqa: E402
    make_dp_tp_mesh, shard_params_tp)
from disentangled_multimodal_learning_tpu.train.optim import (  # noqa: E402
    make_optimizer)
from disentangled_multimodal_learning_tpu.train.steps import (  # noqa: E402
    batch_to_arrays, make_train_step)
from disentangled_multimodal_learning_tpu.train.trainers import (  # noqa: E402
    init_model_state)

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "f64": 8,
               "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8}


def shape_bytes(shape_str: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dt, 4)


def main():
    fixdim = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    cfg = Config(mode="teacher", task_type="diag2021", label_dim=4,
                 fixdim=fixdim, batch_size=batch, checkpoints="#", debug=True,
                 multiscale_attention=True).validate()
    ds = SyntheticBagDataset(size=batch, fixdim=fixdim, label_dim=4, seed=0,
                             args=cfg)
    b = next(iter(BagLoader(ds, batch, shuffle=False)))
    tx = make_optimizer(cfg, 1)
    model = define_net(cfg)
    state = init_model_state(model, cfg, b, tx)
    step = make_train_step(model, cfg, tx, None)

    mesh = make_dp_tp_mesh(1, 8)
    state = state.replace(params=shard_params_tp(state.params, mesh))
    arrays = shard_batch(batch_to_arrays(b), mesh)

    lowered = jax.jit(step).lower(state, arrays, jax.random.PRNGKey(0), None)
    compiled = lowered.compile()
    txt = compiled.as_text()

    # collect collectives with their result shapes
    colls: dict[str, list[int]] = {}
    for line in txt.splitlines():
        m = re.search(r"=\s*(\S+\[[\d,]*\][^ ]*)\s+(all-gather|all-reduce|"
                      r"reduce-scatter|collective-permute|all-to-all)\(",
                      line)
        if m:
            colls.setdefault(m.group(2), []).append(shape_bytes(m.group(1)))

    # the big per-head tensors that must NOT be gathered: attention maps
    # [B, H, N, K] and CPB hiddens [B, G, N, K, 32]
    side = int(fixdim ** 0.5)
    kk = (side // 4) ** 2
    attn_bytes = batch * 8 * fixdim * kk * 4
    print(f"teacher fixdim={fixdim} B={batch} on (data=1, model=8); "
          f"attention map = {attn_bytes/1e6:.1f} MB")
    ok = True
    for kind, sizes in sorted(colls.items()):
        sizes.sort(reverse=True)
        big = [s for s in sizes if s >= attn_bytes / 2]
        print(f"  {kind:20s} x{len(sizes):3d}  largest {sizes[0]/1e6:8.2f} MB"
              f"  >=half-attn-map: {len(big)}")
        if kind == "all-gather" and big:
            ok = False
    print("PARTITION OK: no all-gather of per-head-sized tensors" if ok
          else "PARTITION LEAK: big all-gather present")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
