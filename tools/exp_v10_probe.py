"""Mosaic lowering probe for the v10 fused table-attention primitives (r4).

Validates on the real chip (and in interpret mode on CPU) that:
  1. a 3-D VMEM scratch supports STATIC middle-axis reads  W[:, qy, :]
  2. dynamic leading-index stores  W[pl.ds(i*8+g, 1)] = ...  (fori index)
  3. static middle-axis read-modify-writes  dW[:, qy, :] += piece
  4. lane pad via concat + static pltpu.roll + iota masks compose
  5. lane-offset stores at 128-multiples  out[:, 256*g : 256*g+w]
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, SUB, CN, N = 16, 16, 128, 512
W_G = 256


def _kernel(x_ref, out_ref, w_scratch, acc_scratch):
    # (2) dynamic leading stores from a fori loop
    def body(i, _):
        w_scratch[pl.ds(i, 1)] = x_ref[pl.ds(i, 1)] * 2.0
        return 0

    jax.lax.fori_loop(0, K, body, 0)

    acc_scratch[...] = jnp.zeros_like(acc_scratch)
    n_groups = N // W_G
    for g in range(n_groups):
        bias = jnp.zeros((K, W_G), jnp.float32)
        for qy in range(SUB):
            # (1) static middle-axis read
            piece = w_scratch[:, qy, :]                      # [K, CN]
            # (4) pad to group width, static roll, static mask
            piece = jnp.concatenate(
                [piece, jnp.zeros((K, W_G - CN), jnp.float32)], axis=1)
            dst = (qy * 50 - g * W_G) % W_G
            piece = pltpu.roll(piece, dst, axis=1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (K, W_G), 1)
            lo = max(qy * 50 - g * W_G, 0)
            hi = min(qy * 50 - g * W_G + 50, W_G)
            if hi <= 0 or lo >= W_G:
                continue
            mask = ((lane >= lo) & (lane < hi)).astype(jnp.float32)
            bias = bias + piece * mask
            # (3) static middle-axis RMW
            acc_scratch[:, qy, :] = acc_scratch[:, qy, :] + piece[:, :CN]
        # (5) aligned lane-offset store
        out_ref[:, g * W_G:(g + 1) * W_G] = bias + jnp.sum(
            acc_scratch[:, 0, :]) * 0.0


def main():
    interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((K, SUB, CN)), jnp.float32)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((K, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((K, SUB, CN), jnp.float32),
                        pltpu.VMEM((K, SUB, CN), jnp.float32)],
        interpret=interpret,
    )(x)
    out = np.asarray(out)

    # reference
    want = np.zeros((K, N), np.float32)
    for g in range(N // W_G):
        for qy in range(SUB):
            lo = max(qy * 50 - g * W_G, 0)
            hi = min(qy * 50 - g * W_G + 50, W_G)
            if hi <= 0 or lo >= W_G:
                continue
            src_lo = lo - (qy * 50 - g * W_G)
            want[:, g * W_G + lo:g * W_G + hi] += (
                2.0 * np.asarray(x)[:, qy, src_lo:src_lo + (hi - lo)])
    err = np.max(np.abs(out - want))
    print(f"probe max err {err:.2e} (backend {jax.default_backend()})")
    assert err < 1e-5
    print("V10 PRIMITIVES OK")


if __name__ == "__main__":
    main()
