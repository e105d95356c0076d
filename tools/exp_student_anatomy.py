"""Anatomy of the student train step on chip (r4).

The student step (StudentsNet: 2 scales x [deform self-attn + DPC-KNN
cluster merge], PathBatchLoss x1000) was never decomposed like the teacher
(tools/exp_attn_anatomy.py, tools/bench_breakdown.py).  Times each stage
interleaved min-of-REPS in one process, chained-scan amortized dispatch
(~1 ms/iter overhead identical across rows — deltas are honest, absolute
ms carry the overhead):

  pdist        pairwise_dist(x, x) on [B, 2500, 128] -> [B, 2500, 2500]
  ksmall       _k_smallest(dist, 5) given a precomputed dist
  parent       the higher-density-parent min pass given dist + density
  dpc          dpc_knn_cluster end to end
  merge        merge_tokens fwd+bwd (the differentiable half)
  encoder      StudentEncoder fwd / fwd+bwd (attention + cluster merge)
  step         full student train step (make_train_step)

Decides whether the DPC-KNN [B,N,N] passes are worth a kernel/fusion pass.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

B, N, C = 4, 2500, 128
K = 5
ITERS = 20
REPS = 5


def _timed(fn, *args, iters=ITERS):
    """Chained scan x iters, one readback; dispatch+readback overhead
    amortized /iters (identical across rows — deltas are honest)."""
    @jax.jit
    def chained(x0, *rest):
        def body(c, _):
            outs = fn(c, *rest)
            d = outs[0] if isinstance(outs, (tuple, list)) else outs
            d = d[0] if isinstance(d, (tuple, list)) else d
            probe = jnp.asarray(d).reshape(-1)[:1].astype(jnp.float32) * 1e-30
            return c + probe[0].astype(c.dtype), jnp.float32(0.0)

        c, _ = jax.lax.scan(body, x0, None, length=iters)
        return c.reshape(-1)[0]

    float(chained(*args))
    t0 = time.perf_counter()
    float(chained(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    if jax.default_backend() == "cpu":
        print("needs the TPU; aborting")
        return
    jax.config.update("jax_default_prng_impl", "rbg")
    rng = np.random.default_rng(0)

    from disentangled_multimodal_learning_tpu.config import Config
    from disentangled_multimodal_learning_tpu.data import (BagLoader,
                                                           SyntheticBagDataset)
    from disentangled_multimodal_learning_tpu.models import teacher_student as TS
    from disentangled_multimodal_learning_tpu.models.factory import define_net
    from disentangled_multimodal_learning_tpu.ops import cluster as CL
    from disentangled_multimodal_learning_tpu.train.optim import make_optimizer
    from disentangled_multimodal_learning_tpu.train.steps import (
        batch_to_arrays, make_train_step)
    from disentangled_multimodal_learning_tpu.train.trainers import (
        init_model_state)
    from disentangled_multimodal_learning_tpu.models import deform_attention as DA

    DA.CPB_TABLE_DIVISOR = 1
    DA.ATTN_BF16_STREAMS = True  # r5 production operating point
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    noise = jnp.asarray(rng.uniform(size=(B, N)), jnp.float32)
    dist0 = CL.pairwise_dist(x, x) / (C ** 0.5)
    dens0 = jnp.exp(-jnp.mean(CL._k_smallest(dist0, K) ** 2, axis=-1))
    cluster_num = 2  # ceil(2500 * 0.0008), the production student ratio

    def f_pdist(a):
        return CL.pairwise_dist(a, a)

    def f_ksmall(d):
        return CL._k_smallest(d, K)

    def f_parent(d, dens):
        higher = (dens[:, None, :] > dens[:, :, None]).astype(d.dtype)
        dist_max = jnp.max(d.reshape(B, -1), axis=-1)[:, None, None]
        return jnp.min(d * higher + dist_max * (1.0 - higher), axis=-1)

    def f_dpc(a, nz):
        idx, down = CL.dpc_knn_cluster(a, cluster_num, k=K, density_noise=nz)
        return idx.astype(jnp.float32)

    def f_merge_fb(a, nz):
        idx, _ = CL.dpc_knn_cluster(jax.lax.stop_gradient(a), cluster_num,
                                    k=K, density_noise=nz)

        def loss(xx):
            return jnp.sum(CL.merge_tokens(xx, idx, cluster_num) ** 2)

        return jax.grad(loss)(a)

    enc = TS.StudentEncoder(dim=C)
    ev = enc.init({"params": jax.random.PRNGKey(0),
                   "dpc_noise": jax.random.PRNGKey(1)}, x, x,
                  deterministic=True)

    def f_enc(a):
        m, attn = enc.apply(ev, a, a, deterministic=True,
                            rngs={"dpc_noise": jax.random.PRNGKey(1)})
        return m.sum() + attn.sum()

    def f_enc_fb(a):
        return jax.grad(lambda z: f_enc(z))(a)

    # r5 finer rows: the attention pair alone (encoder minus DPC/merge),
    # and the 1000x PathBatchLoss on the [B,8,N,144] maps the step feeds it
    attn_mod = TS._deform2d("attn2d", C)
    av = attn_mod.init(jax.random.PRNGKey(0), x, x, deterministic=True)

    def f_attn(a):
        o, at = attn_mod.apply(av, a, a, deterministic=True)
        return o.sum() + at.sum()

    def f_attn_fb(a):
        return jax.grad(lambda z: f_attn(z))(a)

    from disentangled_multimodal_learning_tpu.train import losses as L
    att10 = jnp.asarray(rng.standard_normal((B, 8, N, 144)), jnp.bfloat16)
    att20 = jnp.asarray(rng.standard_normal((B, 8, N, 144)), jnp.bfloat16)

    def f_pbl_fb(a10, a20):
        return jax.grad(
            lambda z: 1000.0 * L.path_batch_loss(z, a20).astype(jnp.float32)
        )(a10)

    # full production student train step
    cfg = Config(mode="student", task_type="diag2021", label_dim=4,
                 fixdim=N, batch_size=B, cpb_table_divisor=1,
                 attn_bf16_streams=True,
                 checkpoints="#", debug=True).validate()
    ds = SyntheticBagDataset(size=B, fixdim=N, label_dim=4, seed=0, args=cfg)
    batch = next(iter(BagLoader(ds, B, shuffle=False)))
    arrays = batch_to_arrays(batch)
    model = define_net(cfg)
    tx = make_optimizer(cfg, 100)
    state = init_model_state(model, cfg, batch, tx)
    raw_step = make_train_step(model, cfg, tx)

    # r5: device-side scan chain, same method as tools/bench_modes.py —
    # one dispatch + one readback per rep (immune to tunnel dispatch
    # overhead/degradation); arrays as jit args (remote-compile 413)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state, rng, arrays):
        def body(carry, _):
            st, key = carry
            key, k2 = jax.random.split(key)
            st, m = raw_step(st, arrays, k2, None)
            return (st, key), m["loss"]
        (state, _), losses = jax.lax.scan(body, (state, rng), None,
                                          length=ITERS)
        return state, losses

    def fence(s):
        return float(jax.tree_util.tree_leaves(s.params)[0].sum())

    kr = jax.random.PRNGKey(0)
    state, _ = multi_step(state, kr, arrays)
    fence(state)
    t0 = time.perf_counter()
    fence(state)
    roundtrip = time.perf_counter() - t0

    rows_fns = [
        ("pdist_fwd   ", f_pdist, (x,)),
        ("ksmall_fwd  ", f_ksmall, (dist0,)),
        ("parent_fwd  ", f_parent, (dist0, dens0)),
        ("dpc_fwd     ", f_dpc, (x, noise)),
        ("merge_fwdbwd", f_merge_fb, (x, noise)),
        ("enc_fwd     ", f_enc, (x,)),
        ("enc_fwdbwd  ", f_enc_fb, (x,)),
        ("attn_fwd    ", f_attn, (x,)),
        ("attn_fwdbwd ", f_attn_fb, (x,)),
        ("pbl_fwdbwd  ", f_pbl_fb, (att10, att20)),
    ]
    best = {name: float("inf") for name, _, _ in rows_fns}
    best_step = None
    for rep in range(REPS):
        for name, fn, args in rows_fns:
            best[name] = min(best[name], _timed(fn, *args))
        t0 = time.perf_counter()
        state, _ = multi_step(state, kr, arrays)
        fence(state)
        dt = (time.perf_counter() - t0 - roundtrip) / ITERS * 1e3
        best_step = dt if best_step is None else min(best_step, dt)
        print(f"rep {rep} done (step {dt:.2f} ms)", flush=True)
    print("RESULT (ms/iter; rows carry ~1 ms amortized dispatch, step row is "
          "chained-honest):")
    for name, _, _ in rows_fns:
        print(f"  {name} {best[name]:7.3f}")
    print(f"  step        {best_step:7.3f}  "
          f"({B / best_step * 1e3:.1f} bags/s)")


if __name__ == "__main__":
    main()
