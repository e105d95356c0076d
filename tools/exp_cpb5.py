"""Compare production CPB path (v1 wide + XLA pos transform) against the
self-contained v5 kernel (cpb_bias_grids_fused), isolated and in-module.

Run on the real chip: python tools/exp_cpb5.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from disentangled_multimodal_learning_tpu.ops.pallas import deform_attn as K


def timed(fn, fence, iters=30, warmup=3):
    for _ in range(warmup):
        c = fn()
    fence(c)
    t0 = time.perf_counter()
    fence(c)
    rt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        c = fn()
    fence(c)
    return max(time.perf_counter() - t0 - rt, 1e-9) / iters * 1e3


def main():
    jax.config.update("jax_default_prng_impl", "rbg")
    r = np.random.default_rng(0)
    BH, N, Kk = 32, 2500, 144
    f32 = np.float32
    gq = jnp.asarray(r.uniform(-1, 1, size=(N, 2)).astype(f32))
    gkv = jnp.asarray(r.uniform(-1, 1, size=(BH, Kk, 2)).astype(f32))
    w1 = jnp.asarray(r.normal(size=(2, 32)).astype(f32))
    b1 = jnp.asarray(r.normal(size=(32,)).astype(f32))
    w2 = jnp.asarray(r.normal(size=(32, 32)).astype(f32) * 0.3)
    b2 = jnp.asarray(r.normal(size=(32,)).astype(f32))
    w3 = jnp.asarray(r.normal(size=(32, 1)).astype(f32) * 0.3)
    b3 = jnp.asarray(r.normal(size=(1,)).astype(f32))
    args = (gkv, w1, b1, w2, b2, w3, b3)

    def loss_v1(gkv, w1, b1, w2, b2, w3, b3):
        return K.cpb_bias_from_grids(gq, gkv, w1, b1, w2, b2, w3, b3).sum()

    def loss_v5(gkv, w1, b1, w2, b2, w3, b3):
        return K.cpb_bias_grids_fused(gq, gkv, w1, b1, w2, b2, w3, b3).sum()

    # numerical check first
    bv1 = K.cpb_bias_from_grids(gq, *args)
    bv5 = K.cpb_bias_grids_fused(gq, *args)
    print("max|v5-v1| bias:", float(jnp.max(jnp.abs(bv1 - bv5))))
    g1 = jax.jit(jax.grad(loss_v1, argnums=(0, 1, 2, 3, 4, 5, 6)))(*args)
    g5 = jax.jit(jax.grad(loss_v5, argnums=(0, 1, 2, 3, 4, 5, 6)))(*args)
    for i, (a, b) in enumerate(zip(g1, g5)):
        d = float(jnp.max(jnp.abs(a - b)))
        rel = d / (float(jnp.max(jnp.abs(a))) + 1e-9)
        print(f"  grad[{i}] max|diff| {d:.3e} rel {rel:.3e}")

    for name, loss in [("v1_prod", loss_v1), ("v5_fused", loss_v5)]:
        f = jax.jit(loss)
        ms = timed(lambda: f(*args), lambda c: float(c))
        print(f"{name}_fwd      {ms:8.3f} ms")
        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5, 6)))
        ms = timed(lambda: g(*args), lambda c: float(c[0].sum()))
        print(f"{name}_fwdbwd   {ms:8.3f} ms   (x4 = {4 * ms:.1f})")

    # in-module comparison
    from disentangled_multimodal_learning_tpu.models import deform_attention as DA

    x1 = jnp.asarray(r.normal(size=(4, N, 128)).astype(f32))
    x2 = jnp.asarray(r.normal(size=(4, N, 128)).astype(f32))
    mod = DA.DeformCrossAttention2D(dim=128, dropout=0.0)
    avars = mod.init({"params": jax.random.PRNGKey(0)}, x1, x2,
                     deterministic=True)

    def attn_loss(p, a, b):
        out, attn = mod.apply({"params": p}, a, b, deterministic=True)
        return out.sum() + attn.sum()

    for name, flag in [("module_v1", "v1"), ("module_v5", "v5")]:
        DA.CPB_KERNEL_VERSION = flag
        g = jax.jit(jax.grad(attn_loss, argnums=(0, 1, 2)))
        ms = timed(lambda: g(avars["params"], x1, x2),
                   lambda c: float(jax.tree_util.tree_leaves(c)[0].sum()))
        print(f"{name}_fwdbwd  {ms:8.3f} ms   (x4 = {4 * ms:.1f})")


if __name__ == "__main__":
    main()
