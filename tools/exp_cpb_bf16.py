"""bf16-stream variant of the wide CPB kernel: fx/fy and bias cross the
HBM boundary in bf16 (half the stream traffic), compute stays f32 in VMEM.
16-row blocks align with the bf16 (16, 128) physical tile.

Run on the real chip: python tools/exp_cpb_bf16.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from disentangled_multimodal_learning_tpu.ops.pallas import deform_attn as K

HID = K.HID
CH = K._WIDE_CHUNK
ROWS = 16


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


def _wide16_fwd_kernel(fx_ref, fy_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                       w3_ref, b3_ref, bias_ref):
    fx = fx_ref[...].astype(jnp.float32)                # [ROWS, CH]
    fy = fy_ref[...].astype(jnp.float32)
    w1 = w1_ref[...]
    b1c = b1_ref[...][:, None]
    b2c = b2_ref[...][:, None]
    w2 = w2_ref[...]
    w3 = w3_ref[...]
    b3 = b3_ref[...]
    rows = []
    for g in range(ROWS):
        h1 = (w1[0][:, None] * fx[g:g + 1, :]
              + w1[1][:, None] * fy[g:g + 1, :] + b1c)
        h1 = jnp.maximum(h1, 0.0)
        h2 = jax.lax.dot_general(w2, h1, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        h2 = jnp.maximum(h2 + b2c, 0.0)
        rows.append(jax.lax.dot_general(
            w3, h2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b3[0])
    bias_ref[...] = jnp.concatenate(rows, axis=0).astype(bias_ref.dtype)


def wide16_fwd(fx, fy, w1, b1, w2, b2, w3, b3, out_dtype):
    M = fx.shape[0]
    assert M % (ROWS * CH) == 0
    R = M // CH
    return pl.pallas_call(
        _wide16_fwd_kernel,
        grid=(R // ROWS,),
        in_specs=([pl.BlockSpec((ROWS, CH), lambda i: (i, 0))] * 2
                  + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6),
        out_specs=pl.BlockSpec((ROWS, CH), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((R, CH), out_dtype),
    )(fx.reshape(R, CH), fy.reshape(R, CH), w1, b1, w2, b2, w3, b3)


def main():
    r = np.random.default_rng(0)
    BH, N, Kk = 32, 2500, 144
    M = BH * N * Kk
    f32 = np.float32
    fx32 = jnp.asarray(r.uniform(-1, 1, size=(M,)).astype(f32))
    fy32 = jnp.asarray(r.uniform(-1, 1, size=(M,)).astype(f32))
    w1 = jnp.asarray(r.normal(size=(2, HID)).astype(f32))
    b1 = jnp.asarray(r.normal(size=(HID,)).astype(f32))
    w2 = jnp.asarray(r.normal(size=(HID, HID)).astype(f32) * 0.3)
    b2 = jnp.asarray(r.normal(size=(HID,)).astype(f32))
    w3 = jnp.asarray(r.normal(size=(HID, 1)).astype(f32) * 0.3)
    b3 = jnp.asarray(r.normal(size=(1,)).astype(f32))

    base = jax.jit(lambda a, b: K.cpb_bias_wide(a, b, w1, b1, w2, b2, w3, b3))
    ms = timed(lambda: base(fx32, fy32), lambda c: float(c.sum()))
    print(f"{'prod_wide8_f32':24s} {ms:8.3f} ms")
    ref = base(fx32, fy32)

    # 16-row f32 (block-size effect alone)
    f = jax.jit(lambda a, b: wide16_fwd(a, b, w1, b1, w2, b2, w3, b3,
                                        jnp.float32))
    ms = timed(lambda: f(fx32, fy32), lambda c: float(c.sum()))
    out = f(fx32, fy32)
    print(f"{'wide16_f32':24s} {ms:8.3f} ms   maxerr "
          f"{float(jnp.max(jnp.abs(out.reshape(-1) - ref))):.2e}")

    # 16-row bf16 streams
    fx16 = fx32.astype(jnp.bfloat16)
    fy16 = fy32.astype(jnp.bfloat16)
    f = jax.jit(lambda a, b: wide16_fwd(a, b, w1, b1, w2, b2, w3, b3,
                                        jnp.bfloat16))
    ms = timed(lambda: f(fx16, fy16), lambda c: float(c.astype(jnp.float32).sum()))
    out = f(fx16, fy16).astype(jnp.float32)
    print(f"{'wide16_bf16':24s} {ms:8.3f} ms   maxerr "
          f"{float(jnp.max(jnp.abs(out.reshape(-1) - ref))):.2e}")

    # end-to-end including the XLA pos transform producing bf16 streams
    gq = jnp.asarray(r.uniform(-1, 1, size=(N, 2)).astype(f32))
    gkv = jnp.asarray(r.uniform(-1, 1, size=(BH, Kk, 2)).astype(f32))

    def from_grids_bf16(gkv):
        d0 = gq[None, :, None, 0] - gkv[:, None, :, 0]
        d1 = gq[None, :, None, 1] - gkv[:, None, :, 1]
        fx = (jnp.sign(d0) * jnp.log1p(jnp.abs(d0))).reshape(-1).astype(jnp.bfloat16)
        fy = (jnp.sign(d1) * jnp.log1p(jnp.abs(d1))).reshape(-1).astype(jnp.bfloat16)
        return wide16_fwd(fx, fy, w1, b1, w2, b2, w3, b3,
                          jnp.bfloat16).reshape(BH, N, Kk)

    def from_grids_f32(gkv):
        return K.cpb_bias_from_grids(gq, gkv, w1, b1, w2, b2, w3, b3)

    for name, fn in [("grids_f32_prod", from_grids_f32),
                     ("grids_bf16", from_grids_bf16)]:
        f = jax.jit(lambda g, fn=fn: fn(g).astype(jnp.float32).sum())
        ms = timed(lambda: f(gkv), lambda c: float(c))
        print(f"{name:24s} {ms:8.3f} ms (fwd only, incl pos transform)")


if __name__ == "__main__":
    main()
