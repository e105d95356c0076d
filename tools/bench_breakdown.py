"""Perf breakdown on the real chip: where do the 57 ms/step go?

Times (a) the full teacher train step, (b) forward only, (c) one isolated
DeformCrossAttention2D fwd+bwd at production shapes under several kernel
configs, (d) the model with attention stubbed.  Uses the chained-readback
fencing method from bench.py (block_until_ready does not fence on the
tunneled axon backend)."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, fence, iters=20, warmup=3):
    for _ in range(warmup):
        carry = fn()
    fence(carry)
    t0 = time.perf_counter()
    fence(carry)
    roundtrip = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = fn()
    fence(carry)
    dt = max(time.perf_counter() - t0 - roundtrip, 1e-9)
    return dt / iters * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")

    from disentangled_multimodal_learning_tpu.config import Config
    from disentangled_multimodal_learning_tpu.data import (BagLoader,
                                                           SyntheticBagDataset)
    from disentangled_multimodal_learning_tpu.models.factory import define_net
    from disentangled_multimodal_learning_tpu.models import deform_attention as DA
    from disentangled_multimodal_learning_tpu.train.optim import make_optimizer
    from disentangled_multimodal_learning_tpu.train.steps import (
        batch_to_arrays, make_train_step)
    from disentangled_multimodal_learning_tpu.train.trainers import init_model_state

    B, FIX = 4, 2500
    divisor = int(os.environ.get("DMLT_BREAKDOWN_DIVISOR", "1"))
    cfg = Config(mode="teacher", task_type="diag2021", label_dim=4,
                 fixdim=FIX, batch_size=B, gradient_modulate=True,
                 multiscale_attention=True, remat=False, checkpoints="#",
                 cpb_table_divisor=divisor, debug=True).validate()
    DA.CPB_TABLE_DIVISOR = divisor  # isolated-module sections follow suit
    ds = SyntheticBagDataset(size=B, fixdim=FIX, label_dim=4, seed=0, args=cfg)
    batch = next(iter(BagLoader(ds, B, shuffle=False)))
    arrays = batch_to_arrays(batch)

    model = define_net(cfg)
    tx = make_optimizer(cfg, 100)
    state = init_model_state(model, cfg, batch, tx)

    def fence_state(s):
        return float(jax.tree_util.tree_leaves(s if not hasattr(s, "params")
                                               else s.params)[0].sum())

    # (a) full train step
    step = jax.jit(make_train_step(model, cfg, tx), donate_argnums=(0,))
    rng = jax.random.PRNGKey(0)
    st = [state]

    def run_step():
        st[0], _ = step(st[0], arrays, rng, None)
        return st[0]

    ms = timed(run_step, fence_state)
    print(f"full_step_ms          {ms:8.2f}  ({B / ms * 1e3:.1f} bags/s)")

    # (b) forward only (loss value, no grad)
    from disentangled_multimodal_learning_tpu.train import losses as L

    def fwd_only(params, arrays):
        out = model.apply({"params": params}, x_path10=arrays["x_path10"],
                          x_path20=arrays["x_path20"],
                          x_omic_tumor=arrays["x_omic_tumor"],
                          x_omic_immune=arrays["x_omic_immune"],
                          deterministic=True)
        return out[2]["logits_teas"].sum()

    params_live = st[0].params  # original state was donated into run_step
    fwd = jax.jit(fwd_only)
    ms = timed(lambda: fwd(params_live, arrays), lambda c: float(c))
    print(f"fwd_only_ms           {ms:8.2f}")

    # (c) isolated attention module at production shapes
    rngk = np.random.default_rng(0)
    x1 = jnp.asarray(rngk.normal(size=(B, FIX, 128)).astype(np.float32))
    x2 = jnp.asarray(rngk.normal(size=(B, FIX, 128)).astype(np.float32))
    attn_mod = DA.DeformCrossAttention2D(dim=128, dropout=0.0)
    avars = attn_mod.init({"params": jax.random.PRNGKey(0)}, x1, x2,
                          deterministic=True)

    def attn_loss(p, a, b):
        out, attn = attn_mod.apply({"params": p}, a, b, deterministic=True)
        return out.sum() + attn.sum()

    for label, pallas_flag in [("attn_fwdbwd_pallasCPB", True),
                               ("attn_fwdbwd_xlaCPB  ", False)]:
        DA.CPB_USE_PALLAS = pallas_flag
        g = jax.jit(jax.grad(attn_loss, argnums=(0, 1, 2)))
        ms = timed(lambda: g(avars["params"], x1, x2),
                   lambda c: float(jax.tree_util.tree_leaves(c)[0].sum()))
        print(f"{label}  {ms:8.2f}  (x4 = {4 * ms:.1f})")
        f = jax.jit(attn_loss)
        ms = timed(lambda: f(avars["params"], x1, x2), lambda c: float(c))
        print(f"{label.replace('fwdbwd', 'fwd   ')}  {ms:8.2f}")
    DA.CPB_USE_PALLAS = True

    # attention without returning/summing the attn map (out only)
    def attn_loss_noattn(p, a, b):
        out, _ = attn_mod.apply({"params": p}, a, b, deterministic=True)
        return out.sum()

    g = jax.jit(jax.grad(attn_loss_noattn, argnums=(0, 1, 2)))
    ms = timed(lambda: g(avars["params"], x1, x2),
               lambda c: float(jax.tree_util.tree_leaves(c)[0].sum()))
    print(f"attn_fwdbwd_outonly    {ms:8.2f}")

    # (d) fully-fused Pallas attention kernel at the same shapes
    from disentangled_multimodal_learning_tpu.ops.pallas import deform_attn as K

    BH, N, Kk, D = B * 8, FIX, 144, 64
    q = jnp.asarray(rngk.normal(size=(BH, N, D)).astype(np.float32))
    k = jnp.asarray(rngk.normal(size=(BH, Kk, D)).astype(np.float32))
    v = jnp.asarray(rngk.normal(size=(BH, Kk, D)).astype(np.float32))
    gq = jnp.asarray(rngk.uniform(-1, 1, size=(N, 2)).astype(np.float32))
    gkv = jnp.asarray(rngk.uniform(-1, 1, size=(BH, Kk, 2)).astype(np.float32))
    w1 = jnp.asarray(rngk.normal(size=(2, 32)).astype(np.float32))
    b1 = jnp.zeros(32)
    w2 = jnp.asarray(rngk.normal(size=(32, 32)).astype(np.float32))
    b2 = jnp.zeros(32)
    w3 = jnp.asarray(rngk.normal(size=(32, 1)).astype(np.float32))
    b3 = jnp.zeros(1)

    def fused_loss(q, k, v, gkv, w1, b1, w2, b2, w3, b3):
        out, attn = K.fused_deform_attention(q, k, v, gq, gkv, w1, b1, w2, b2,
                                             w3, b3, jnp.zeros(()), 0.0, 128)
        return out.sum() + attn.sum()

    g = jax.jit(jax.grad(fused_loss, argnums=(0, 1, 2, 3)))
    ms = timed(lambda: g(q, k, v, gkv, w1, b1, w2, b2, w3, b3),
               lambda c: float(c[0].sum()))
    print(f"fusedkernel_fwdbwd     {ms:8.2f}  (x4 = {4 * ms:.1f})")
    f = jax.jit(fused_loss)
    ms = timed(lambda: f(q, k, v, gkv, w1, b1, w2, b2, w3, b3),
               lambda c: float(c))
    print(f"fusedkernel_fwd        {ms:8.2f}")




def micro():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")
    import numpy as np

    from disentangled_multimodal_learning_tpu.models import deform_attention as DA
    from disentangled_multimodal_learning_tpu.ops.pallas import deform_attn as K
    from disentangled_multimodal_learning_tpu.ops.grid_sample import grid_sample_2d_matmul

    B, FIX = 4, 2500
    BH, N, Kk, D = B * 8, FIX, 144, 64
    r = np.random.default_rng(0)
    f32 = np.float32

    # wide CPB alone at production M
    gq = jnp.asarray(r.uniform(-1, 1, size=(N, 2)).astype(f32))
    gkv = jnp.asarray(r.uniform(-1, 1, size=(BH, Kk, 2)).astype(f32))
    w1 = jnp.asarray(r.normal(size=(2, 32)).astype(f32)); b1 = jnp.zeros(32)
    w2 = jnp.asarray(r.normal(size=(32, 32)).astype(f32)); b2 = jnp.zeros(32)
    w3 = jnp.asarray(r.normal(size=(32, 1)).astype(f32)); b3 = jnp.zeros(1)

    def cpb_loss(gkv, w1, b1, w2, b2, w3, b3):
        return K.cpb_bias_from_grids(gq, gkv, w1, b1, w2, b2, w3, b3).sum()

    g = jax.jit(jax.grad(cpb_loss, argnums=(0, 1, 2, 3, 4, 5, 6)))
    ms = timed(lambda: g(gkv, w1, b1, w2, b2, w3, b3),
               lambda c: float(c[0].sum()))
    print(f"cpb_wide_fwdbwd        {ms:8.2f}  (x4 = {4*ms:.1f})")
    f = jax.jit(cpb_loss)
    ms = timed(lambda: f(gkv, w1, b1, w2, b2, w3, b3), lambda c: float(c))
    print(f"cpb_wide_fwd           {ms:8.2f}")

    # attention module with CPB stubbed to zero bias
    x1 = jnp.asarray(r.normal(size=(B, FIX, 128)).astype(f32))
    x2 = jnp.asarray(r.normal(size=(B, FIX, 128)).astype(f32))
    attn_mod = DA.DeformCrossAttention2D(dim=128, dropout=0.0)
    avars = attn_mod.init({"params": jax.random.PRNGKey(0)}, x1, x2,
                          deterministic=True)

    orig_call = DA.CPB.__call__

    def zero_cpb(self, grid_q, grid_kv, *, transposed=False):
        if grid_kv.ndim == 4:          # unfused [B, G, Nk, P]
            b, nk = grid_kv.shape[0], grid_kv.shape[2]
        else:                          # fused [B*G, Nk, P]
            b, nk = grid_kv.shape[0] // self.offset_groups, grid_kv.shape[1]
        nq = grid_q.shape[0]
        if transposed:
            nq, nk = nk, nq
        return jnp.zeros((b, self.heads, nq, nk), jnp.float32)

    DA.CPB.__call__ = zero_cpb

    def attn_loss(p, a, bb):
        out, attn = attn_mod.apply({"params": p}, a, bb, deterministic=True)
        return out.sum() + attn.sum()

    g = jax.jit(jax.grad(attn_loss, argnums=(0, 1, 2)))
    ms = timed(lambda: g(avars["params"], x1, x2),
               lambda c: float(jax.tree_util.tree_leaves(c)[0].sum()))
    print(f"attn_fwdbwd_zeroCPB    {ms:8.2f}  (x4 = {4*ms:.1f})")
    DA.CPB.__call__ = orig_call

    # grid_sample matmul alone
    x2g = jnp.asarray(r.normal(size=(32, 50, 50, 16)).astype(f32))
    pts = jnp.asarray(r.uniform(-1, 1, size=(32, 144, 2)).astype(f32))

    def gs_loss(x2g, pts):
        return grid_sample_2d_matmul(x2g, pts).sum()

    g = jax.jit(jax.grad(gs_loss, argnums=(0, 1)))
    ms = timed(lambda: g(x2g, pts), lambda c: float(c[0].sum()))
    print(f"gridsample_fwdbwd      {ms:8.2f}  (x4 = {4*ms:.1f})")

    # bare attention math alone: sim(bf16)+softmax+PV fwd+bwd at [32,2500,144]
    q = jnp.asarray(r.normal(size=(BH, N, D)).astype(f32))
    kk = jnp.asarray(r.normal(size=(BH, Kk, D)).astype(f32))
    vv = jnp.asarray(r.normal(size=(BH, Kk, D)).astype(f32))
    bias = jnp.asarray(r.normal(size=(BH, N, Kk)).astype(f32))

    def bare(q, kk, vv, bias):
        sim = jnp.einsum("bnd,bkd->bnk", q.astype(jnp.bfloat16),
                         kk.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32) + bias
        sim = sim - jax.lax.stop_gradient(sim.max(-1, keepdims=True))
        p = jax.nn.softmax(sim, -1)
        out = jnp.einsum("bnk,bkd->bnd", p.astype(jnp.bfloat16),
                         vv.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return out.sum() + p.sum()

    g = jax.jit(jax.grad(bare, argnums=(0, 1, 2, 3)))
    ms = timed(lambda: g(q, kk, vv, bias), lambda c: float(c[0].sum()))
    print(f"bare_attn_fwdbwd       {ms:8.2f}  (x4 = {4*ms:.1f})")




def stubbed():
    """Full train step with DeformCrossAttention2D stubbed -> the non-attention
    residual of the 57 ms."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    jax.config.update("jax_default_prng_impl", "rbg")

    from disentangled_multimodal_learning_tpu.config import Config
    from disentangled_multimodal_learning_tpu.data import (BagLoader,
                                                           SyntheticBagDataset)
    from disentangled_multimodal_learning_tpu.models.factory import define_net
    from disentangled_multimodal_learning_tpu.models import deform_attention as DA
    from disentangled_multimodal_learning_tpu.train.optim import make_optimizer
    from disentangled_multimodal_learning_tpu.train.steps import (
        batch_to_arrays, make_train_step)
    from disentangled_multimodal_learning_tpu.train.trainers import init_model_state

    def stub_call(self, x1, x2, *, return_vgrid=False, deterministic=True):
        B, N, C = x1.shape
        out = x1 * 0.99 + x2 * 0.01  # param-free passthrough
        if return_vgrid:
            g = int(N ** 0.5) // self.downsample_factor
            return out, jnp.zeros((B * self.offset_groups, 2, g, g))
        attn = jnp.broadcast_to(out[:, None, :, :1] * 0 + 1.0 / 144,
                                (B, self.heads, N, 144))
        return out, attn

    DA.DeformCrossAttention2D.__call__ = stub_call

    B, FIX = 4, 2500
    cfg = Config(mode="teacher", task_type="diag2021", label_dim=4,
                 fixdim=FIX, batch_size=B, gradient_modulate=True,
                 multiscale_attention=True, remat=False, checkpoints="#",
                 debug=True).validate()
    ds = SyntheticBagDataset(size=B, fixdim=FIX, label_dim=4, seed=0, args=cfg)
    batch = next(iter(BagLoader(ds, B, shuffle=False)))
    arrays = batch_to_arrays(batch)
    model = define_net(cfg)
    tx = make_optimizer(cfg, 100)
    state = init_model_state(model, cfg, batch, tx)
    step = jax.jit(make_train_step(model, cfg, tx), donate_argnums=(0,))
    rng = jax.random.PRNGKey(0)
    st = [state]

    def run_step():
        st[0], _ = step(st[0], arrays, rng, None)
        return st[0]

    ms = timed(run_step,
               lambda s: float(jax.tree_util.tree_leaves(s.params)[0].sum()))
    print(f"full_step_attnstub_ms  {ms:8.2f}")

if __name__ == "__main__":
    {"main": main, "micro": micro, "stub": stubbed}[sys.argv[1] if len(sys.argv) > 1 else "main"]()
