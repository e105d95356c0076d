"""v7 transposed CPB kernel: correctness vs the v1 path and isolated timing.

Run on the real chip: python tools/exp_cpb_t.py
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

    bv1 = K.cpb_bias_from_grids(gq, *args)                 # [BH, N, K]
    bv7 = K.cpb_bias_transposed(gq, *args)                 # [BH, K, N]
    print("max|v7^T - v1|:", float(jnp.max(jnp.abs(
        jnp.swapaxes(bv7, 1, 2) - bv1))))

    # cotangent in the transposed layout == transposed cotangent
    db = jnp.asarray(r.normal(size=(BH, N, Kk)).astype(f32))

    def loss_v1(gkv, w1, b1, w2, b2, w3, b3):
        return (K.cpb_bias_from_grids(gq, gkv, w1, b1, w2, b2, w3, b3)
                * db).sum()

    def loss_v7(gkv, w1, b1, w2, b2, w3, b3):
        return (K.cpb_bias_transposed(gq, gkv, w1, b1, w2, b2, w3, b3)
                * jnp.swapaxes(db, 1, 2)).sum()

    g1 = jax.jit(jax.grad(loss_v1, argnums=tuple(range(7))))(*args)
    g7 = jax.jit(jax.grad(loss_v7, argnums=tuple(range(7))))(*args)
    for i, (a, b) in enumerate(zip(g1, g7)):
        d = float(jnp.max(jnp.abs(a - b)))
        rel = d / (float(jnp.max(jnp.abs(a))) + 1e-9)
        print(f"  grad[{i}] max|diff| {d:.3e} rel {rel:.3e}")

    # timing: natural consumption in each kernel's own layout
    def tloss_v1(gkv, w1, b1, w2, b2, w3, b3):
        return K.cpb_bias_from_grids(gq, gkv, w1, b1, w2, b2, w3, b3).sum()

    def tloss_v7(gkv, w1, b1, w2, b2, w3, b3):
        return K.cpb_bias_transposed(gq, gkv, w1, b1, w2, b2, w3, b3).sum()

    for name, loss in [("v1_prod", tloss_v1), ("v7_transposed", tloss_v7)]:
        f = jax.jit(loss)
        ms = timed(lambda: f(*args), lambda c: float(c))
        print(f"{name}_fwd      {ms:8.3f} ms")
        g = jax.jit(jax.grad(loss, argnums=tuple(range(7))))
        ms = timed(lambda: g(*args), lambda c: float(c[0].sum()))
        print(f"{name}_fwdbwd   {ms:8.3f} ms   (x4 = {4 * ms:.1f})")


if __name__ == "__main__":
    main()
