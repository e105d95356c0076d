"""Isolated on-chip timing of the DPC pieces: XLA path vs streamed kernels.

Rows (chained scan x ITERS, one readback; ~1 ms/iter amortized dispatch —
deltas are honest):

  dpc_xla       full dpc_knn_cluster, use_kernel=False
  dpc_stream    full dpc_knn_cluster_streamed
  knn_kernel    kernel 1 alone (k-smallest + rowmax)
  parent_only   kernel 2 alone (kernel 1's outputs are unused in this row,
                so XLA DCEs it — pallas_call is pure)

Usage: python tools/exp_dpc_iso.py [--tile 256]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

B, N, C, K, KNN = 4, 2500, 128, 2, 5
ITERS = 20
REPS = 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        print("needs the TPU; aborting")
        return

    from disentangled_multimodal_learning_tpu.ops import cluster as CL
    from disentangled_multimodal_learning_tpu.ops.pallas import dpc_knn as DK

    if args.tile:
        DK._TILE = args.tile

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    nz = jnp.asarray(rng.uniform(size=(B, N)), jnp.float32)
    dens = jnp.asarray(rng.uniform(size=(B, N)), jnp.float32)

    def _timed(fn, *fargs, iters=ITERS):
        @jax.jit
        def chained(x0, *rest):
            def body(c, _):
                outs = fn(c, *rest)
                d = outs[0] if isinstance(outs, (tuple, list)) else outs
                probe = jnp.asarray(d).reshape(-1)[:1].astype(jnp.float32) * 1e-30
                return c + probe[0].astype(c.dtype), jnp.float32(0.0)

            c, _ = jax.lax.scan(body, x0, None, length=iters)
            return c.reshape(-1)[0]

        float(chained(*fargs))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(chained(*fargs))
            best = min(best, (time.perf_counter() - t0) / iters * 1e3)
        return best

    def f_xla(a, z):
        i, _ = CL.dpc_knn_cluster(a, K, k=KNN, density_noise=z,
                                  use_kernel=False)
        return i.astype(jnp.float32)

    def f_stream(a, z):
        i, _ = DK.dpc_knn_cluster_streamed(a, K, k=KNN, density_noise=z)
        return i.astype(jnp.float32)

    def f_knn(a):
        knn2, rmax2, _ = DK._stream_calls(a, KNN, False)
        return knn2

    def f_parent(a, d):
        _, _, pf = DK._stream_calls(a, KNN, False)
        return pf(d)

    rows = [
        ("dpc_xla      ", f_xla, (x, nz)),
        ("dpc_stream   ", f_stream, (x, nz)),
        ("knn_kernel   ", f_knn, (x,)),
        ("parent_only  ", f_parent, (x, dens)),
    ]
    print(f"RESULT tile={DK._TILE} (ms/iter, ~1 ms amortized dispatch):")
    for name, fn, fargs in rows:
        print(f"  {name} {_timed(fn, *fargs):7.3f}", flush=True)


if __name__ == "__main__":
    main()
