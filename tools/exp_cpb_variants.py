"""CPB wide-kernel forward variants: bf16 operands and block-diagonal
4-group packing (full-width MXU), benchmarked against the production kernel.

Run on the real chip: python tools/exp_cpb_variants.py
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


def timed(fn, iters=30, warmup=3):
    for _ in range(warmup):
        c = fn()
    float(c.sum() if hasattr(c, "sum") else c)
    t0 = time.perf_counter()
    float(fn().sum())
    rt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        c = fn()
    float(c.sum())
    dt = max(time.perf_counter() - t0 - rt, 1e-9)
    return dt / iters * 1e3


# --------------------------------------------------------- variant A: bf16

def _wide_bf16_kernel(fx_ref, fy_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                      w3_ref, b3_ref, bias_ref):
    fx = fx_ref[...]
    fy = fy_ref[...]
    w1 = w1_ref[...]
    b1c = b1_ref[...][:, None]
    b2c = b2_ref[...][:, None]
    w2 = w2_ref[...].astype(jnp.bfloat16)
    w3 = w3_ref[...].astype(jnp.bfloat16)
    b3 = b3_ref[...]
    rows = []
    for g in range(8):
        h1 = (w1[0][:, None] * fx[g:g + 1, :]
              + w1[1][:, None] * fy[g:g + 1, :] + b1c)
        h1 = jnp.maximum(h1, 0.0).astype(jnp.bfloat16)
        h2 = jax.lax.dot_general(w2, h1, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        h2 = jnp.maximum(h2 + b2c, 0.0).astype(jnp.bfloat16)
        rows.append(jax.lax.dot_general(
            w3, h2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b3[0])
    bias_ref[...] = jnp.concatenate(rows, axis=0)


# ------------------------------------------- variant B: block-diag packing

def _wide_bd_kernel(fx_ref, fy_ref, a_ref, w2bd_ref, b2t_ref, bsel_ref,
                    b3_ref, bias_ref, *, bf16):
    """Per 8-row block: two passes of 4 groups packed on 128 sublanes.

    a_ref    [128, 9]   first layer:  h1_cat = relu(A @ [fx4; fy4; 1])
    w2bd_ref [128, 128] kron(I4, W2^T): h2_cat = relu(W2bd @ h1_cat + b2t)
    bsel_ref [8, 128]   rows 2g..: w3 in block g -> bias4 = Bsel_half @ h2_cat
    """
    fx = fx_ref[...]
    fy = fy_ref[...]
    a = a_ref[...]
    w2bd = w2bd_ref[...]
    b2t = b2t_ref[...]
    bsel = bsel_ref[...]
    b3 = b3_ref[...]
    if bf16:
        a = a.astype(jnp.bfloat16)
        w2bd = w2bd.astype(jnp.bfloat16)
        bsel = bsel.astype(jnp.bfloat16)
    ones = jnp.ones((1, fx.shape[1]), jnp.float32)
    halves = []
    for h in range(2):
        xin = jnp.concatenate([fx[4 * h:4 * h + 4], fy[4 * h:4 * h + 4],
                               ones], axis=0)              # [9, CH]
        if bf16:
            xin = xin.astype(jnp.bfloat16)
        h1 = jnp.maximum(jax.lax.dot_general(
            a, xin, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), 0.0)      # [128, CH]
        if bf16:
            h1 = h1.astype(jnp.bfloat16)
        h2 = jnp.maximum(jax.lax.dot_general(
            w2bd, h1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b2t, 0.0)
        if bf16:
            h2 = h2.astype(jnp.bfloat16)
        halves.append(jax.lax.dot_general(
            bsel[4 * h:4 * h + 4], h2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b3[0])   # [4, CH]
    bias_ref[...] = jnp.concatenate(halves, axis=0)


def run_variant(kernel, extra_args, fx, fy, name):
    M = fx.shape[0]
    R = M // CH
    f = jax.jit(lambda fx2, fy2: pl.pallas_call(
        kernel,
        grid=(R // 8,),
        in_specs=([pl.BlockSpec((8, CH), lambda i: (i, 0))] * 2
                  + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(extra_args)),
        out_specs=pl.BlockSpec((8, CH), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((R, CH), jnp.float32),
    )(fx2, fy2, *extra_args))
    ms = timed(lambda: f(fx.reshape(R, CH), fy.reshape(R, CH)))
    print(f"{name:28s} {ms:8.3f} ms")
    return f(fx.reshape(R, CH), fy.reshape(R, CH))


def main():
    r = np.random.default_rng(0)
    BH, N, Kk = 32, 2500, 144
    M = BH * N * Kk
    fx = jnp.asarray(r.uniform(-1, 1, size=(M,)).astype(np.float32))
    fy = jnp.asarray(r.uniform(-1, 1, size=(M,)).astype(np.float32))
    w1 = jnp.asarray(r.normal(size=(2, HID)).astype(np.float32))
    b1 = jnp.asarray(r.normal(size=(HID,)).astype(np.float32))
    w2 = jnp.asarray(r.normal(size=(HID, HID)).astype(np.float32) * 0.3)
    b2 = jnp.asarray(r.normal(size=(HID,)).astype(np.float32))
    w3 = jnp.asarray(r.normal(size=(HID, 1)).astype(np.float32) * 0.3)
    b3 = jnp.asarray(r.normal(size=(1,)).astype(np.float32))

    # production baseline
    base = jax.jit(lambda fx2, fy2: K.cpb_bias_wide(fx2, fy2, w1, b1, w2, b2,
                                                    w3, b3))
    ms = timed(lambda: base(fx, fy))
    print(f"{'prod_wide_f32':28s} {ms:8.3f} ms")
    ref = base(fx, fy)

    outA = run_variant(_wide_bf16_kernel, (w1, b1, w2, b2, w3, b3), fx, fy,
                       "bf16_matmuls")
    print("  max|err| vs f32:", float(jnp.max(jnp.abs(outA.reshape(-1) - ref))))

    # block-diag packing matrices (XLA-side, tiny)
    eye4 = jnp.eye(4, dtype=jnp.float32)
    a_mat = jnp.concatenate([jnp.kron(eye4, w1[0][:, None]),
                             jnp.kron(eye4, w1[1][:, None]),
                             jnp.tile(b1[:, None], (4, 1))], axis=1)  # [128,9]
    w2bd = jnp.kron(eye4, w2.T)                                       # [128,128]
    b2t = jnp.tile(b2, 4)[:, None]                                    # [128,1]
    bsel = jnp.kron(jnp.eye(8, 4, dtype=jnp.float32)[:, :4] * 0, jnp.zeros(32))
    # bsel rows: for half h, row g selects block g of h2_cat -> [8, 128] where
    # rows 0..3 used in half 0, rows 4..7 in half 1; both halves share layout
    bsel = jnp.concatenate([jnp.kron(eye4, w3[:, 0][None, :]),
                            jnp.kron(eye4, w3[:, 0][None, :])], axis=0)  # [8,128]

    outB = run_variant(functools.partial(_wide_bd_kernel, bf16=False),
                       (a_mat, w2bd, b2t, bsel, b3), fx, fy, "blockdiag_f32")
    print("  max|err| vs f32:", float(jnp.max(jnp.abs(outB.reshape(-1) - ref))))

    outC = run_variant(functools.partial(_wide_bd_kernel, bf16=True),
                       (a_mat, w2bd, b2t, bsel, b3), fx, fy, "blockdiag_bf16")
    print("  max|err| vs f32:", float(jnp.max(jnp.abs(outC.reshape(-1) - ref))))


if __name__ == "__main__":
    main()
