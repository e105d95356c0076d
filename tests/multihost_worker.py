"""Worker process for the simulated 2-process CPU cluster test
(tests/test_parallel.py::test_multihost_two_process_cpu_cluster).

Run as:  python tests/multihost_worker.py <coordinator> <num_procs> <pid>

Exercises the REAL multi-host code path main.py uses on a TPU pod
(``_maybe_init_distributed`` -> ``jax.distributed.initialize`` -> a global
'data' mesh spanning all processes' devices), the TPU-native analogue of the
reference's multi-node NCCL rendezvous (reference main.py:27-29,451-452).
Each process holds 4 virtual CPU devices and feeds its local quarter of the
global batch; the jitted train step's collectives then run cross-process.
Prints one JSON line with the (globally reduced, replicated) loss.
"""

import json
import os
import sys

# must be set before jax initializes its backends; drop any inherited
# device-count flag (the pytest parent sets 8) before pinning 4
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if not f.startswith("--xla_force_host_platform_device_count")]
os.environ["XLA_FLAGS"] = " ".join(
    _flags + ["--xla_force_host_platform_device_count=4"])

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # axon plugin rewrites jax_platforms

import numpy as np  # noqa: E402


def main_worker(coordinator: str, num_procs: int, pid: int):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.environ["DMLT_COORDINATOR"] = coordinator
    os.environ["DMLT_NUM_PROCESSES"] = str(num_procs)
    os.environ["DMLT_PROCESS_ID"] = str(pid)

    from disentangled_multimodal_learning_tpu.config import Config
    from disentangled_multimodal_learning_tpu.data import (BagLoader,
                                                           SyntheticBagDataset)
    from disentangled_multimodal_learning_tpu.models.factory import define_net
    from disentangled_multimodal_learning_tpu.parallel.mesh import (
        batch_sharding, get_mesh)
    from disentangled_multimodal_learning_tpu.train.optim import make_optimizer
    from disentangled_multimodal_learning_tpu.train.steps import (
        batch_to_arrays, make_train_step)
    from disentangled_multimodal_learning_tpu.train.trainers import (
        init_model_state)
    from main import _maybe_init_distributed

    cfg = Config(mode="teacher", task_type="diag2021", label_dim=4, fixdim=16,
                 batch_size=8, nodes=num_procs, checkpoints="#", debug=True,
                 seed=0).validate()
    _maybe_init_distributed(cfg)
    assert jax.process_count() == num_procs
    assert jax.device_count() == 4 * num_procs

    # identical global batch + identical init on every process (seeded)
    ds = SyntheticBagDataset(size=8, fixdim=16, label_dim=4, seed=0, args=cfg)
    batch = next(iter(BagLoader(ds, 8, shuffle=False)))
    arrays = batch_to_arrays(batch)
    tx = make_optimizer(cfg, 1)
    model = define_net(cfg)
    state = init_model_state(model, cfg, batch, tx)

    mesh = get_mesh()  # global: all processes' devices
    sh = batch_sharding(mesh)
    n_local = 8 // num_procs

    def to_global(x):
        local = np.asarray(x)[pid * n_local:(pid + 1) * n_local]
        return jax.make_array_from_process_local_data(sh, local)

    arrays = {k: to_global(v) for k, v in arrays.items()}

    step = jax.jit(make_train_step(model, cfg, tx))
    new_state, metrics = step(state, arrays, jax.random.PRNGKey(0), None)
    loss = float(jax.device_get(metrics["loss"]))
    p0 = float(np.asarray(
        jax.tree_util.tree_leaves(new_state.params)[0]).ravel()[0])
    print(json.dumps({"pid": pid, "loss": loss, "param0": p0,
                      "processes": jax.process_count(),
                      "devices": jax.device_count()}), flush=True)


if __name__ == "__main__":
    main_worker(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
