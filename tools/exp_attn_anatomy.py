"""Anatomy of the divisor-1 deform attention on chip (r4).

Times each stage of the production kn-layout attention in ONE process with
interleaved min-of-REPS (tunnel drift defense), chained-scan amortized
dispatch (overhead ~1 ms/iter at ITERS=20 is identical across rows, so the
RANKING and the deltas between rows are trustworthy; absolute ms carry the
overhead):

  interp        table-interp Pallas kernel alone -> [R, 50, 50] windows
  interp+resh   + the XLA reshape to the [BH, K, N] bias layout
  attn|bias     sim+softmax+PV+attn given a precomputed bias (XLA)
  attn|bias-NA  same but out-only (no attn map materialized)
  module        full DeformCrossAttention2D forward
  gram          OmicDomainScaleLoss on 4 attention maps
  (each also timed as fwd+bwd where differentiable)

Decides where the next kernel goes: fuse interp->bias-layout, fuse
softmax/PV, or attack the Gram losses.
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

from disentangled_multimodal_learning_tpu.models import deform_attention as DA
from disentangled_multimodal_learning_tpu.ops.pallas import deform_attn as PK
from disentangled_multimodal_learning_tpu.train import losses as L

B, SIDE, K, D, H = 4, 50, 144, 64, 8
N = SIDE * SIDE
BH = B * H
KV_BOUND = 1.0 + 2.0 * 4.0 / 11.0
ITERS = 20
REPS = 5


def _timed(fn, *args, iters=ITERS):
    """Chained scan x iters, one readback; ~1 ms/iter dispatch+readback
    overhead amortized (identical across rows — deltas are honest)."""
    @jax.jit
    def chained(x0, *rest):
        def body(c, _):
            outs = fn(c, *rest)
            d = outs[0] if isinstance(outs, (tuple, list)) else outs
            d = d[0] if isinstance(d, (tuple, list)) else d
            probe = jnp.asarray(d).reshape(-1)[:1] * 1e-30
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
    rng = np.random.default_rng(0)
    h, t0g, rn, tn = PK._tbl_consts(SIDE, 1, KV_BOUND)
    split = rn - 128
    rows = 2 * PK._tbl_split_rows(SIDE, rn)
    R = BH * K

    tablep = jnp.asarray(rng.standard_normal((rows, 128)), jnp.float32)
    hi = float((rn - SIDE) - 1)
    shifts = jnp.asarray(rng.uniform(0, hi, size=(R, 2)), jnp.float32)
    qh = jnp.asarray(rng.standard_normal((BH, N, D)), jnp.float32)
    kh = jnp.asarray(rng.standard_normal((BH, K, D)), jnp.float32)
    vh = jnp.asarray(rng.standard_normal((BH, K, D)), jnp.float32)
    bias0 = jnp.asarray(rng.standard_normal((BH, K, N)), jnp.float32)
    att4 = [jnp.asarray(rng.standard_normal((B, H, K, N)), jnp.float32)
            for _ in range(4)]
    x1 = jnp.asarray(rng.standard_normal((B, N, 128)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((B, N, 128)), jnp.float32)

    interp = functools.partial(PK._table_interp, side=SIDE, divisor=1,
                               rn=rn, split=split)

    def f_interp(tab, sh):
        return interp(tab, sh)

    def f_interp_resh(tab, sh):
        w = interp(tab, sh)
        return w.reshape(BH, K, N) * 1.0000001  # force the relayout output

    def f_interp_bwd(tab, sh):
        return jax.grad(lambda t: jnp.sum(interp(t, sh) ** 2))(tab)

    def f_interp_resh_bwd(tab, sh):
        return jax.grad(
            lambda t: jnp.sum(interp(t, sh).reshape(BH, K, N) ** 2))(tab)

    cdt = jnp.bfloat16

    def attn_given_bias(q, k, v, bias, need_attn):
        sim = jnp.einsum("bjd,bid->bji", k.astype(cdt), q.astype(cdt),
                         preferred_element_type=jnp.float32)
        sim = sim + bias
        sim = sim - jax.lax.stop_gradient(jnp.max(sim, axis=-2, keepdims=True))
        attn = jax.nn.softmax(sim, axis=-2)
        out = jnp.einsum("bji,bjd->bid", attn.astype(cdt), v.astype(cdt),
                         preferred_element_type=jnp.float32)
        if need_attn:
            return out.sum() + attn.sum()
        return out.sum()

    def f_attn(q, k, v, bias):
        return attn_given_bias(q, k, v, bias, True)

    def f_attn_na(q, k, v, bias):
        return attn_given_bias(q, k, v, bias, False)

    def f_attn_bwd(q, k, v, bias):
        return jax.grad(attn_given_bias, argnums=3)(q, k, v, bias, True)

    def f_attn_na_bwd(q, k, v, bias):
        return jax.grad(attn_given_bias, argnums=3)(q, k, v, bias, False)

    DA.CPB_TABLE_DIVISOR = 1
    DA.ATTN_BF16_STREAMS = True  # r5 production operating point
    mod = DA.DeformCrossAttention2D(dim=128, dropout=0.0)
    mvars = mod.init({"params": jax.random.PRNGKey(0)}, x1, x2,
                     deterministic=True)

    def f_module(a, b):
        out, attn = mod.apply(mvars, a, b, deterministic=True)
        return out.sum() + attn.sum()

    def f_module_na(a, b):
        out, _ = mod.apply(mvars, a, b, deterministic=True)
        return out.sum()

    def f_module_bwd(a, b):
        return jax.grad(f_module, argnums=0)(a, b)

    def f_module_na_bwd(a, b):
        return jax.grad(f_module_na, argnums=0)(a, b)

    def f_gram(a1, a2, a3, a4):
        return L.omic_domain_scale_loss(a1, a2, a3, a4)

    def f_gram_bwd(a1, a2, a3, a4):
        return jax.grad(lambda x: L.omic_domain_scale_loss(x, a2, a3, a4))(a1)

    rows_fns = [
        ("interp_fwd       ", f_interp, (tablep, shifts)),
        ("interp_fwdbwd    ", f_interp_bwd, (tablep, shifts)),
        ("interp+resh_fwd  ", f_interp_resh, (tablep, shifts)),
        ("interp+resh_fb   ", f_interp_resh_bwd, (tablep, shifts)),
        ("attn|bias_fwd    ", f_attn, (qh, kh, vh, bias0)),
        ("attn|bias_fwdbwd ", f_attn_bwd, (qh, kh, vh, bias0)),
        ("attn|bias_na_fwd ", f_attn_na, (qh, kh, vh, bias0)),
        ("attn|bias_na_fb  ", f_attn_na_bwd, (qh, kh, vh, bias0)),
        ("module_fwd       ", f_module, (x1, x2)),
        ("module_fwdbwd    ", f_module_bwd, (x1, x2)),
        ("module_na_fwd    ", f_module_na, (x1, x2)),
        ("module_na_fwdbwd ", f_module_na_bwd, (x1, x2)),
        ("gram4_fwd        ", f_gram, tuple(att4)),
        ("gram4_fwdbwd     ", f_gram_bwd, tuple(att4)),
    ]
    best = {name: float("inf") for name, _, _ in rows_fns}
    for rep in range(REPS):
        for name, fn, args in rows_fns:
            best[name] = min(best[name], _timed(fn, *args))
        print(f"rep {rep} done", flush=True)
    print("RESULT (ms/iter, ~1 ms dispatch overhead included in each):")
    for name, _, _ in rows_fns:
        print(f"  {name} {best[name]:7.3f}")


if __name__ == "__main__":
    main()
