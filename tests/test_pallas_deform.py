"""Golden tests for the fused deformable-attention Pallas kernel
(interpret mode on CPU) against the jnp reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disentangled_multimodal_learning_tpu.ops.pallas.deform_attn import (
    HID,
    deform_attention_reference,
    fused_deform_attention,
)


def make_inputs(rng, BH=4, N=40, K=12, D=16):
    q = rng.normal(size=(BH, N, D)).astype(np.float32) * D ** -0.5
    k = rng.normal(size=(BH, K, D)).astype(np.float32)
    v = rng.normal(size=(BH, K, D)).astype(np.float32)
    gq = rng.uniform(-1, 1, size=(N, 2)).astype(np.float32)
    gkv = rng.uniform(-1.2, 1.2, size=(BH, K, 2)).astype(np.float32)
    w1 = rng.normal(size=(2, HID)).astype(np.float32) * 0.5
    b1 = rng.normal(size=(HID,)).astype(np.float32) * 0.1
    w2 = rng.normal(size=(HID, HID)).astype(np.float32) * 0.2
    b2 = rng.normal(size=(HID,)).astype(np.float32) * 0.1
    w3 = rng.normal(size=(HID, 1)).astype(np.float32) * 0.3
    b3 = rng.normal(size=(1,)).astype(np.float32) * 0.1
    return tuple(map(jnp.asarray, (q, k, v, gq, gkv, w1, b1, w2, b2, w3, b3)))


def test_fused_forward_matches_reference(rng):
    args = make_inputs(rng)
    out, attn = fused_deform_attention(*args, 0.0, 0.0, 16, True)
    ref_out, ref_attn = deform_attention_reference(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(attn), np.asarray(ref_attn),
                               atol=1e-5, rtol=1e-4)


def test_fused_forward_nondivisible_tile(rng):
    # N=40 with tile=16 -> padded to 48; outputs must crop correctly
    args = make_inputs(rng, N=40)
    out, attn = fused_deform_attention(*args, 0.0, 0.0, 16, True)
    assert out.shape == (4, 40, 16)
    assert attn.shape == (4, 40, 12)
    rows = np.asarray(attn.sum(-1))
    np.testing.assert_allclose(rows, 1.0, atol=1e-5)


def test_fused_gradients_match_reference(rng):
    args = make_inputs(rng, BH=2, N=24, K=8, D=8)

    def loss_fused(q, k, v, gkv, w1, b1, w2, b2, w3, b3):
        out, attn = fused_deform_attention(q, k, v, args[3], gkv, w1, b1, w2,
                                           b2, w3, b3, 0.0, 0.0, 8, True)
        return jnp.sum(out ** 2) + jnp.sum(jnp.sin(attn))

    def loss_ref(q, k, v, gkv, w1, b1, w2, b2, w3, b3):
        out, attn = deform_attention_reference(q, k, v, args[3], gkv, w1, b1,
                                               w2, b2, w3, b3)
        return jnp.sum(out ** 2) + jnp.sum(jnp.sin(attn))

    diff_args = args[:3] + args[4:]
    g_fused = jax.grad(loss_fused, argnums=tuple(range(10)))(*diff_args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(10)))(*diff_args)
    names = ["q", "k", "v", "gkv", "w1", "b1", "w2", "b2", "w3", "b3"]
    for n, a, b in zip(names, g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=1e-3, err_msg=f"grad mismatch: {n}")


def test_fused_gradients_nondivisible_tile(rng):
    """Padded query rows must not leak into dk/dv/dW/dgkv."""
    args = make_inputs(rng, BH=2, N=20, K=8, D=8)

    def loss(tile):
        def f(q, k, v, gkv, w1, b1, w2, b2, w3, b3):
            out, attn = fused_deform_attention(q, k, v, args[3], gkv, w1, b1,
                                               w2, b2, w3, b3, 0.0, 0.0, tile,
                                               True)
            return jnp.sum(out ** 2) + jnp.sum(attn ** 2)
        return f

    diff_args = args[:3] + args[4:]
    g_pad = jax.grad(loss(8), argnums=tuple(range(10)))(*diff_args)   # 20->24
    g_exact = jax.grad(loss(4), argnums=tuple(range(10)))(*diff_args)  # 20=5x4
    for a, b in zip(g_pad, g_exact):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=1e-3)


# ------------------------------------------------------- flat CPB bias kernel
def _cpb_ref(grid_q, grid_kv, w1, b1, w2, b2, w3, b3):
    import jax
    pos = grid_q[None, :, None, :] - grid_kv[:, None, :, :]
    pos = jnp.sign(pos) * jnp.log1p(jnp.abs(pos))
    h1 = jax.nn.relu(pos @ w1 + b1)
    h2 = jax.nn.relu(h1 @ w2 + b2)
    return (h2 @ w3 + b3)[..., 0]


def test_cpb_bias_flat_forward_matches_reference(rng):
    from disentangled_multimodal_learning_tpu.ops.pallas.deform_attn import cpb_bias

    q, k, v, gq, gkv, w1, b1, w2, b2, w3, b3 = make_inputs(rng, BH=3, N=40, K=12)
    got = cpb_bias(gq, gkv, w1, b1, w2, b2, w3, b3, chunk_t=16, interpret=True)
    want = _cpb_ref(gq, gkv, w1, b1, w2, b2, w3, b3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5,
                               rtol=1e-4)


def test_cpb_bias_flat_grads_match_reference(rng):
    from disentangled_multimodal_learning_tpu.ops.pallas.deform_attn import cpb_bias

    q, k, v, gq, gkv, w1, b1, w2, b2, w3, b3 = make_inputs(rng, BH=2, N=24, K=8)

    def loss_fused(gkv, w1, b1, w2, b2, w3, b3):
        b = cpb_bias(gq, gkv, w1, b1, w2, b2, w3, b3, chunk_t=8, interpret=True)
        return jnp.sum(jnp.sin(b) * b)

    def loss_ref(gkv, w1, b1, w2, b2, w3, b3):
        b = _cpb_ref(gq, gkv, w1, b1, w2, b2, w3, b3)
        return jnp.sum(jnp.sin(b) * b)

    args = (gkv, w1, b1, w2, b2, w3, b3)
    gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for n, a, b in zip(["gkv", "w1", "b1", "w2", "b2", "w3", "b3"], gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=1e-3, err_msg=f"cpb grad {n}")


def test_cpb_bias_wide_forward_and_grads(rng):
    from disentangled_multimodal_learning_tpu.ops.pallas import deform_attn as da

    q, k, v, gq, gkv, w1, b1, w2, b2, w3, b3 = make_inputs(rng, BH=2, N=24, K=8)
    old_chunk = da._WIDE_CHUNK
    da._WIDE_CHUNK = 64
    try:
        got = da.cpb_bias_from_grids(gq, gkv, w1, b1, w2, b2, w3, b3,
                                        interpret=True)
        want = _cpb_ref(gq, gkv, w1, b1, w2, b2, w3, b3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-4)

        def loss_fused(gkv, w1, b1, w2, b2, w3, b3):
            b = da.cpb_bias_from_grids(gq, gkv, w1, b1, w2, b2, w3, b3,
                                          interpret=True)
            return jnp.sum(jnp.sin(b) * b)

        def loss_ref(gkv, w1, b1, w2, b2, w3, b3):
            b = _cpb_ref(gq, gkv, w1, b1, w2, b2, w3, b3)
            return jnp.sum(jnp.sin(b) * b)

        args = (gkv, w1, b1, w2, b2, w3, b3)
        gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
        gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
        for n, a, b_ in zip(["gkv", "w1", "b1", "w2", "b2", "w3", "b3"], gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-4, rtol=1e-3,
                                       err_msg=f"wide cpb grad {n}")
    finally:
        da._WIDE_CHUNK = old_chunk


def test_cpb_bias_wide4_forward_and_grads(rng):
    """The wide4 kernel (kept as a measured negative result): forward and
    every gradient vs the jnp reference."""
    from disentangled_multimodal_learning_tpu.ops.pallas import deform_attn as da

    q, k, v, gq, gkv, w1, b1, w2, b2, w3, b3 = make_inputs(rng, BH=2, N=24, K=8)
    old_chunk = da._W4_CHUNK
    da._W4_CHUNK = 64
    try:
        got = da.cpb_bias_from_grids_w4(gq, gkv, w1, b1, w2, b2, w3, b3,
                                     interpret=True)
        want = _cpb_ref(gq, gkv, w1, b1, w2, b2, w3, b3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-4)

        def loss_fused(gkv, w1, b1, w2, b2, w3, b3):
            b = da.cpb_bias_from_grids_w4(gq, gkv, w1, b1, w2, b2, w3, b3,
                                       interpret=True)
            return jnp.sum(jnp.sin(b) * b)

        def loss_ref(gkv, w1, b1, w2, b2, w3, b3):
            b = _cpb_ref(gq, gkv, w1, b1, w2, b2, w3, b3)
            return jnp.sum(jnp.sin(b) * b)

        args = (gkv, w1, b1, w2, b2, w3, b3)
        gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
        gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
        for n, a, b_ in zip(["gkv", "w1", "b1", "w2", "b2", "w3", "b3"], gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-4, rtol=1e-3,
                                       err_msg=f"wide4 cpb grad {n}")
    finally:
        da._W4_CHUNK = old_chunk


def test_cpb_bias_transposed_forward_and_grads(rng):
    """v7 transposed kernel ([BH,K,N] kv-major output, in-kernel position
    diffs + dgkv): forward and every gradient vs the jnp reference."""
    from disentangled_multimodal_learning_tpu.ops.pallas import deform_attn as da

    q, k, v, gq, gkv, w1, b1, w2, b2, w3, b3 = make_inputs(rng, BH=2, N=24, K=8)
    got = da.cpb_bias_transposed(gq, gkv, w1, b1, w2, b2, w3, b3,
                                 interpret=True)
    want = jnp.swapaxes(_cpb_ref(gq, gkv, w1, b1, w2, b2, w3, b3), 1, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-4)

    def loss_fused(gkv, w1, b1, w2, b2, w3, b3):
        b = da.cpb_bias_transposed(gq, gkv, w1, b1, w2, b2, w3, b3,
                                   interpret=True)
        return jnp.sum(jnp.sin(b) * b)

    def loss_ref(gkv, w1, b1, w2, b2, w3, b3):
        b = jnp.swapaxes(_cpb_ref(gq, gkv, w1, b1, w2, b2, w3, b3), 1, 2)
        return jnp.sum(jnp.sin(b) * b)

    args = (gkv, w1, b1, w2, b2, w3, b3)
    gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for n, a, b_ in zip(["gkv", "w1", "b1", "w2", "b2", "w3", "b3"], gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=1e-3,
                                   err_msg=f"transposed cpb grad {n}")


def test_cpb_bias_transposed_row_padding(rng):
    """BH*K not a multiple of the row-block: padded rows must not leak into
    weight gradients."""
    from disentangled_multimodal_learning_tpu.ops.pallas import deform_attn as da

    q, k, v, gq, gkv, w1, b1, w2, b2, w3, b3 = make_inputs(rng, BH=3, N=16, K=5)
    assert (3 * 5) % da._T_ROWS != 0
    got = da.cpb_bias_transposed(gq, gkv, w1, b1, w2, b2, w3, b3,
                                 interpret=True)
    want = jnp.swapaxes(_cpb_ref(gq, gkv, w1, b1, w2, b2, w3, b3), 1, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-4)

    def loss_fused(w2):
        b = da.cpb_bias_transposed(gq, gkv, w1, b1, w2, b2, w3, b3,
                                   interpret=True)
        return jnp.sum(b ** 2)

    def loss_ref(w2):
        return jnp.sum(_cpb_ref(gq, gkv, w1, b1, w2, b2, w3, b3) ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(loss_fused)(w2)),
                               np.asarray(jax.grad(loss_ref)(w2)),
                               atol=2e-4, rtol=1e-3)


def test_attn_layout_kn_matches_nk(rng):
    """The TPU-native "kn" attention layout matches the reference "nk"
    layout: same out, transposed attn, grads equal up to f32 reassociation
    (the factored grid-sample backward contracts its per-axis weight
    matmuls in layout-dependent order, so grads are no longer bit-equal)."""
    from disentangled_multimodal_learning_tpu.models.deform_attention import (
        DeformCrossAttention2D)

    x1 = jnp.asarray(rng.normal(size=(2, 64, 128)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(2, 64, 128)).astype(np.float32))
    m_nk = DeformCrossAttention2D(dim=128, dropout=0.0, attn_layout="nk")
    m_kn = DeformCrossAttention2D(dim=128, dropout=0.0, attn_layout="kn")
    v = m_nk.init({"params": jax.random.PRNGKey(0)}, x1, x2,
                  deterministic=True)
    o1, a1 = m_nk.apply(v, x1, x2, deterministic=True)
    o2, a2 = m_kn.apply(v, x1, x2, deterministic=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a1),
                               np.asarray(jnp.swapaxes(a2, -1, -2)),
                               atol=1e-6)

    def loss(mod):
        def f(p):
            out, attn = mod.apply({"params": p}, x1, x2, deterministic=True)
            return jnp.sum(out ** 2) + jnp.sum(attn ** 2)
        return f

    g1 = jax.grad(loss(m_nk))(v["params"])
    g2 = jax.grad(loss(m_kn))(v["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        # rtol covers layout-dependent f32 dot reassociation in the factored
        # grid-sample backward (observed max ~1.5e-4 relative on grad values
        # of O(200)); 5e-4 keeps ~3x margin while still catching systematic
        # grad bugs an order of magnitude above the reassociation noise
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=5e-4)


def test_attn_bf16_streams_matches_f32(rng):
    """cfg.attn_bf16_streams (kn layout): storing the materialized [B,H,K,N]
    sim/attn streams in bf16 perturbs the attention only at bf16-mantissa
    scale — out/attn within ~1e-2 relative of the f32-stream path, all grads
    finite and within a few percent.  Measured +15% teacher train on chip
    (tools/exp_attn_bf16_streams.py, r5); this pins the numerics contract
    of the adopted production flag."""
    from disentangled_multimodal_learning_tpu.models import (
        deform_attention as dam)

    x1 = jnp.asarray(rng.normal(size=(2, 64, 128)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(2, 64, 128)).astype(np.float32))
    m = dam.DeformCrossAttention2D(dim=128, dropout=0.0, attn_layout="kn")
    v = m.init({"params": jax.random.PRNGKey(0)}, x1, x2, deterministic=True)

    def run():
        out, attn = m.apply(v, x1, x2, deterministic=True)

        def f(p):
            o, a = m.apply({"params": p}, x1, x2, deterministic=True)
            return jnp.sum(o ** 2) + jnp.sum(a.astype(jnp.float32) ** 2)

        g = jax.grad(f)(v["params"])
        return out, attn, g

    assert dam.ATTN_BF16_STREAMS is False  # module default stays exact
    o1, a1, g1 = run()
    try:
        dam.ATTN_BF16_STREAMS = True
        o2, a2, g2 = run()
    finally:
        dam.ATTN_BF16_STREAMS = False
    assert a2.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2, np.float32),
                               atol=2e-2, rtol=2e-2)
    # attn rows sum to 1; bf16 storage perturbs each weight by <= 2^-8 rel
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2, np.float32),
                               atol=5e-3)
    for (n1, l1), (n2, l2) in zip(
            jax.tree_util.tree_leaves_with_path(g1),
            jax.tree_util.tree_leaves_with_path(g2)):
        arr1, arr2 = np.asarray(l1, np.float32), np.asarray(l2, np.float32)
        assert np.isfinite(arr2).all(), n2
        # per-leaf relative bound, floored at 1 absolute: leaves whose
        # analytic gradient is ~0 (e.g. mlp_out_bias — a uniform pre-softmax
        # shift the softmax Jacobian annihilates; f32 gives 1.5e-6) pick up
        # O(1e-2) ABSOLUTE bf16 cancellation noise, which is benign because
        # the true gradient is zero in that direction.
        scale = max(np.abs(arr1).max(), 1.0)
        np.testing.assert_allclose(arr1 / scale, arr2 / scale, atol=3e-2,
                                   err_msg=str(n1))


def test_attn1d_bf16_streams_matches_f32(rng):
    """cfg.attn_bf16_streams on the 1-D module (kn layout): same numerics
    contract as the 2-D test above — out within ~1e-2 relative, all grads
    finite and within a few percent after zero-gradient-leaf flooring.
    The 1-D mode's [B,H,K,N] streams (K ~= N/4) set its ~20 ms floor
    (PERF.md), so this is the lever that matters there."""
    from disentangled_multimodal_learning_tpu.models import (
        deform_attention as dam)

    x1 = jnp.asarray(rng.normal(size=(2, 64, 128)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(2, 64, 128)).astype(np.float32))
    m = dam.DeformCrossAttention1D(dim=128, dropout=0.0, attn_layout="kn")
    v = m.init({"params": jax.random.PRNGKey(0)}, x1, x2, deterministic=True)

    def run():
        out = m.apply(v, x1, x2, deterministic=True)

        def f(p):
            o = m.apply({"params": p}, x1, x2, deterministic=True)
            return jnp.sum(o ** 2)

        return out, jax.grad(f)(v["params"])

    assert dam.ATTN_BF16_STREAMS is False  # module default stays exact
    o1, g1 = run()
    try:
        dam.ATTN_BF16_STREAMS = True
        o2, g2 = run()
    finally:
        dam.ATTN_BF16_STREAMS = False
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2, np.float32),
                               atol=2e-2, rtol=2e-2)
    for (n1, l1), (n2, l2) in zip(
            jax.tree_util.tree_leaves_with_path(g1),
            jax.tree_util.tree_leaves_with_path(g2)):
        arr1, arr2 = np.asarray(l1, np.float32), np.asarray(l2, np.float32)
        assert np.isfinite(arr2).all(), n2
        if np.abs(arr1).max() < 1e-4:
            # analytically-zero leaf (mlp_out_bias: a uniform pre-softmax
            # shift the softmax Jacobian annihilates; f32 gives ~1e-5).
            # bf16 cancellation noise is O(5e-2) ABSOLUTE here and benign —
            # the true gradient is zero in that direction.
            assert np.abs(arr2).max() < 0.2, n2
            continue
        scale = max(np.abs(arr1).max(), 1.0)
        np.testing.assert_allclose(arr1 / scale, arr2 / scale, atol=3e-2,
                                   err_msg=str(n1))


def test_attn_kv_axis_helper():
    from disentangled_multimodal_learning_tpu.models.deform_attention import (
        attn_kv_axis)

    assert attn_kv_axis("nk") == -1
    assert attn_kv_axis("kn") == -2
    # on the CPU test backend "auto" resolves to the reference layout
    assert attn_kv_axis("auto") == -1


def test_fused_kn_forward_and_grads(rng):
    """v8 fused kn-layout attention (CPB+sim+softmax+PV in one kernel;
    measured negative result at production scale, kept correct): forward and
    every gradient vs the jnp reference."""
    from disentangled_multimodal_learning_tpu.ops.pallas.deform_attn import (
        deform_attention_reference, fused_deform_attention_kn)

    q, k, v, gq, gkv, w1, b1, w2, b2, w3, b3 = make_inputs(rng, BH=3, N=40,
                                                           K=16, D=8)
    out, attn = fused_deform_attention_kn(q, k, v, gq, gkv, w1, b1, w2, b2,
                                          w3, b3, 0, 0.0, True)
    ref_out, ref_attn = deform_attention_reference(q, k, v, gq, gkv, w1, b1,
                                                   w2, b2, w3, b3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(attn, 1, 2)),
                               np.asarray(ref_attn), atol=1e-5, rtol=1e-4)

    def loss_k(q, k, v, gkv, w1, b1, w2, b2, w3, b3):
        o, a = fused_deform_attention_kn(q, k, v, gq, gkv, w1, b1, w2, b2,
                                         w3, b3, 0, 0.0, True)
        return jnp.sum(o ** 2) + jnp.sum(jnp.sin(a))

    def loss_r(q, k, v, gkv, w1, b1, w2, b2, w3, b3):
        o, a = deform_attention_reference(q, k, v, gq, gkv, w1, b1, w2, b2,
                                          w3, b3)
        return jnp.sum(o ** 2) + jnp.sum(jnp.sin(jnp.swapaxes(a, 1, 2)))

    args = (q, k, v, gkv, w1, b1, w2, b2, w3, b3)
    gk = jax.grad(loss_k, argnums=tuple(range(10)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(10)))(*args)
    # b3 excluded: softmax is invariant to the constant bias shift, so its
    # true gradient is 0 and both sides return float noise around it
    for n, a, b in list(zip(["q", "k", "v", "gkv", "w1", "b1", "w2", "b2",
                             "w3"], gk, gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=1e-3, err_msg=f"fused-kn grad {n}")


def test_fused_kn_row_padding_na(rng):
    """K not a multiple of 8 but <= 8: the KB=K fallback path."""
    from disentangled_multimodal_learning_tpu.ops.pallas.deform_attn import (
        deform_attention_reference, fused_deform_attention_kn)

    q, k, v, gq, gkv, w1, b1, w2, b2, w3, b3 = make_inputs(rng, BH=2, N=24,
                                                           K=5, D=8)
    out, attn = fused_deform_attention_kn(q, k, v, gq, gkv, w1, b1, w2, b2,
                                          w3, b3, 0, 0.0, True)
    ref_out, ref_attn = deform_attention_reference(q, k, v, gq, gkv, w1, b1,
                                                   w2, b2, w3, b3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(attn, 1, 2)),
                               np.asarray(ref_attn), atol=1e-5, rtol=1e-4)


def test_cpb_bias_transposed_multichannel(rng):
    """w3 [HID, 2] (the 1-D CPB's heads/offset_groups = 2): both output
    head-channels from one shared MLP evaluation, forward and grads."""
    from disentangled_multimodal_learning_tpu.ops.pallas import deform_attn as da

    q, k, v, gq, gkv, w1, b1, w2, b2, _, _ = make_inputs(rng, BH=2, N=24, K=8)
    w3 = jnp.asarray(np.random.default_rng(5).normal(size=(32, 2)).astype(np.float32) * 0.3)
    b3 = jnp.asarray(np.random.default_rng(6).normal(size=(2,)).astype(np.float32) * 0.1)

    def ref(gkv, w1, b1, w2, b2, w3, b3):
        pos = gq[None, :, None, :] - gkv[:, None, :, :]
        pos = jnp.sign(pos) * jnp.log1p(jnp.abs(pos))
        h1 = jax.nn.relu(pos @ w1 + b1)
        h2 = jax.nn.relu(h1 @ w2 + b2)
        out = h2 @ w3 + b3                       # [BH, N, K, 2]
        return jnp.moveaxis(out, 3, 1).swapaxes(2, 3)  # [BH, 2, K, N]

    got = da.cpb_bias_transposed(gq, gkv, w1, b1, w2, b2, w3, b3,
                                 interpret=True)
    want = ref(gkv, w1, b1, w2, b2, w3, b3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-4)

    def loss_k(gkv, w1, b1, w2, b2, w3, b3):
        bt = da.cpb_bias_transposed(gq, gkv, w1, b1, w2, b2, w3, b3,
                                    interpret=True)
        return jnp.sum(jnp.sin(bt) * bt)

    def loss_r(gkv, w1, b1, w2, b2, w3, b3):
        bt = ref(gkv, w1, b1, w2, b2, w3, b3)
        return jnp.sum(jnp.sin(bt) * bt)

    args = (gkv, w1, b1, w2, b2, w3, b3)
    gf = jax.grad(loss_k, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(7)))(*args)
    for n, a, b_ in zip(["gkv", "w1", "b1", "w2", "b2", "w3", "b3"], gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=1e-3,
                                   err_msg=f"multichannel cpb grad {n}")


def test_attn1d_layout_kn_matches_nk(rng):
    """The 1-D module's internal "kn" layout (never caller-visible — it
    returns no attention maps) matches "nk" out and grads."""
    from disentangled_multimodal_learning_tpu.models.deform_attention import (
        DeformCrossAttention1D)

    x1 = jnp.asarray(rng.normal(size=(2, 40, 128)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(2, 40, 128)).astype(np.float32))
    m_nk = DeformCrossAttention1D(dim=128, attn_layout="nk")
    m_kn = DeformCrossAttention1D(dim=128, attn_layout="kn")
    v = m_nk.init({"params": jax.random.PRNGKey(0)}, x1, x2,
                  deterministic=True)
    o1 = m_nk.apply(v, x1, x2, deterministic=True)
    o2 = m_kn.apply(v, x1, x2, deterministic=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)

    def loss(mod):
        return lambda p: jnp.sum(
            mod.apply({"params": p}, x1, x2, deterministic=True) ** 2)

    g1 = jax.grad(loss(m_nk))(v["params"])
    g2 = jax.grad(loss(m_kn))(v["params"])
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g1),
                            jax.tree_util.tree_leaves(g2)):
        if "mlp_out_bias" in jax.tree_util.keystr(path):
            continue  # softmax-invariant: true grad is 0, both sides noise
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-3,
                                   err_msg=jax.tree_util.keystr(path))


# ---------------------------------------------------------------------------
# v9: table-interpolated CPB (approximate; opt-in via cfg.cpb_table_divisor)
# ---------------------------------------------------------------------------

def _std_grid(side):
    lin = 2.0 * np.arange(side) / (side - 1) - 1.0
    gx, gy = np.meshgrid(lin, lin)
    return jnp.asarray(np.stack([gx.reshape(-1), gy.reshape(-1)], -1),
                       jnp.float32)


def _cpb_params(rng, scale=1.0):
    return (jnp.asarray(rng.normal(size=(2, HID)) / np.sqrt(2) * scale,
                        jnp.float32),
            jnp.zeros(HID, jnp.float32),
            jnp.asarray(rng.normal(size=(HID, HID)) / np.sqrt(HID) * scale,
                        jnp.float32),
            jnp.zeros(HID, jnp.float32),
            jnp.asarray(rng.normal(size=(HID, 1)) / np.sqrt(HID) * scale,
                        jnp.float32),
            jnp.zeros(1, jnp.float32))


def test_cpb_table_kernel_matches_jnp_interp(rng):
    """interpret-mode kernel == the jnp reference of the SAME approximation
    (fwd to f32 precision), for divisor 1 (overlapping scatter windows in
    the bwd) and 4 (phase decomposition)."""
    from disentangled_multimodal_learning_tpu.ops.pallas.deform_attn import (
        cpb_bias_table)

    side, K, BH = 12, 10, 3
    kv_bound = 1.4
    gkv = jnp.asarray(rng.uniform(-kv_bound, kv_bound, size=(BH, K, 2)),
                      jnp.float32)
    params = _cpb_params(rng)
    for div in (1, 4):
        ref = cpb_bias_table(gkv, *params, side=side, divisor=div,
                             kv_bound=kv_bound, use_kernel=False)
        kern = cpb_bias_table(gkv, *params, side=side, divisor=div,
                              kv_bound=kv_bound, use_kernel=True,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(kern), np.asarray(ref),
                                   atol=2e-6, rtol=1e-5)


@pytest.mark.parametrize("divisor", [1, 2])
def test_cpb_table_kernel_grads_match_jnp_interp(rng, divisor):
    """custom-VJP kernel gradients (table scatter + shift cotangents, then
    chained through the XLA table build) == autodiff of the jnp reference,
    for params AND grid_kv.  divisor 1 exercises the specialized
    single-RMW d1 backward kernel, divisor 2 the phase-decomposed one."""
    from disentangled_multimodal_learning_tpu.ops.pallas.deform_attn import (
        cpb_bias_table)

    side, K, BH = 10, 6, 2
    kv_bound = 1.3
    gkv = jnp.asarray(rng.uniform(-kv_bound, kv_bound, size=(BH, K, 2)),
                      jnp.float32)
    params = _cpb_params(rng)

    def loss(use_kernel):
        def f(gkv_, w1, b1, w2, b2, w3, b3):
            b = cpb_bias_table(gkv_, w1, b1, w2, b2, w3, b3, side=side,
                               divisor=divisor, kv_bound=kv_bound,
                               use_kernel=use_kernel, interpret=use_kernel)
            return jnp.sum(jnp.sin(3.0 * b))
        return f

    gk = jax.grad(loss(True), argnums=(0, 1, 2, 3, 4, 5, 6))(gkv, *params)
    gr = jax.grad(loss(False), argnums=(0, 1, 2, 3, 4, 5, 6))(gkv, *params)
    for a, b in zip(gk, gr):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=3e-5)


def test_cpb_table_bf16_out_kernel_and_grads(rng):
    """cfg.cpb_table_bf16 (TBL_BF16_OUT): the interp arithmetic stays f32
    in-kernel and only the window STORE quantizes to bf16, so the kernel
    must equal the jnp reference of the same quantization almost bitwise,
    and grads (bf16 window cotangents upcast in-kernel, f32 accumulation)
    must track the full-f32 path within bf16-mantissa noise."""
    from disentangled_multimodal_learning_tpu.ops.pallas import (
        deform_attn as pda)

    side, K, BH = 10, 6, 2
    kv_bound = 1.3
    gkv = jnp.asarray(rng.uniform(-kv_bound, kv_bound, size=(BH, K, 2)),
                      jnp.float32)
    params = _cpb_params(rng)

    def loss(use_kernel):
        def f(gkv_, *ps):
            b = pda.cpb_bias_table(gkv_, *ps, side=side, divisor=1,
                                   kv_bound=kv_bound, use_kernel=use_kernel,
                                   interpret=use_kernel)
            return jnp.sum(jnp.sin(3.0 * b.astype(jnp.float32)))
        return f

    g32 = jax.grad(loss(True), argnums=(0, 1, 2, 3, 4, 5, 6))(gkv, *params)
    assert pda.TBL_BF16_OUT is False  # module default stays f32
    try:
        pda.TBL_BF16_OUT = True
        ref = pda.cpb_bias_table(gkv, *params, side=side, divisor=1,
                                 kv_bound=kv_bound, use_kernel=False)
        kern = pda.cpb_bias_table(gkv, *params, side=side, divisor=1,
                                  kv_bound=kv_bound, use_kernel=True,
                                  interpret=True)
        assert kern.dtype == jnp.bfloat16
        # same f32 value rounded to bf16 on both paths -> one-ulp agreement
        np.testing.assert_allclose(np.asarray(kern, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=1e-4, rtol=1e-5)
        gb = jax.grad(loss(True), argnums=(0, 1, 2, 3, 4, 5, 6))(
            gkv, *params)
    finally:
        pda.TBL_BF16_OUT = False
    for a, b in zip(gb, g32):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=2e-2)


def test_cpb_table_lane_split_kernel_and_grads(rng):
    """The divisor-1 lane-split layout (rn > 128: table stored as two
    stacked 128-lane copies, per-row copy selection in _tbl_idx): kernel
    == jnp reference of the same approximation, and custom-VJP grads ==
    autodiff of the reference, for params AND grid_kv."""
    from disentangled_multimodal_learning_tpu.ops.pallas.deform_attn import (
        _tbl_consts, cpb_bias_table)

    side, K, BH = 12, 6, 2
    kv_bound = 12.0                      # forces rn > 128 at divisor 1
    _, _, rn, _ = _tbl_consts(side, 1, kv_bound)
    assert rn > 128, "geometry no longer exercises the split path"
    gkv = jnp.asarray(rng.uniform(-kv_bound, kv_bound, size=(BH, K, 2)),
                      jnp.float32)
    params = _cpb_params(rng)

    ref = cpb_bias_table(gkv, *params, side=side, divisor=1,
                         kv_bound=kv_bound, use_kernel=False)
    kern = cpb_bias_table(gkv, *params, side=side, divisor=1,
                          kv_bound=kv_bound, use_kernel=True, interpret=True)
    np.testing.assert_allclose(np.asarray(kern), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)

    def loss(use_kernel):
        def f(gkv_, w1, b1, w2, b2, w3, b3):
            b = cpb_bias_table(gkv_, w1, b1, w2, b2, w3, b3, side=side,
                               divisor=1, kv_bound=kv_bound,
                               use_kernel=use_kernel, interpret=use_kernel)
            return jnp.sum(jnp.sin(3.0 * b))
        return f

    gk = jax.grad(loss(True), argnums=(0, 1, 2, 3, 4, 5, 6))(gkv, *params)
    gr = jax.grad(loss(False), argnums=(0, 1, 2, 3, 4, 5, 6))(gkv, *params)
    for a, b in zip(gk, gr):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=3e-5)


def test_cpb_table_approximates_exact_bias(rng):
    """The table bias converges to the exact CPB MLP bias as the divisor
    grows, and is already close at divisor 4 (the production opt-in)."""
    from disentangled_multimodal_learning_tpu.ops.pallas.deform_attn import (
        cpb_bias_table)

    side, K, BH = 14, 12, 3
    kv_bound = 1.0 + 8.0 / 11.0      # production bound (gh=12, scale=4)
    gq = _std_grid(side)
    gkv = jnp.asarray(rng.uniform(-kv_bound, kv_bound, size=(BH, K, 2)),
                      jnp.float32)
    w1, b1, w2, b2, w3, b3 = _cpb_params(rng)
    d = gq[None, None, :, :] - gkv[:, :, None, :]
    p = jnp.sign(d) * jnp.log1p(jnp.abs(d))
    h = jnp.maximum(p @ w1 + b1, 0.0)
    h = jnp.maximum(h @ w2 + b2, 0.0)
    exact = (h @ w3 + b3)[..., 0]
    ptp = float(exact.max() - exact.min())
    prev = None
    for div in (1, 2, 4):
        approx = cpb_bias_table(gkv, w1, b1, w2, b2, w3, b3, side=side,
                                divisor=div, kv_bound=kv_bound,
                                use_kernel=False)
        err = float(jnp.abs(approx - exact).max())
        assert err < 0.05 * ptp, (div, err, ptp)
        if prev is not None:
            assert err < prev * 0.75, "finer lattice must reduce error"
        prev = err
    assert prev < 0.01 * ptp  # divisor 4: <1% of the bias dynamic range


def test_cpb_table_through_attention_module(rng):
    """DeformCrossAttention2D with cpb_table_divisor=4 stays close to the
    exact path (outputs + attention maps), CPU jnp paths end to end."""
    from disentangled_multimodal_learning_tpu.models.deform_attention import (
        DeformCrossAttention2D)

    B, N, C = 2, 64, 32
    x1 = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    # "kn" forced so the transposed CPB call (the table's gate) runs on CPU
    kw = dict(dim=C, dim_head=8, heads=4, offset_groups=4, dropout=0.0,
              downsample_factor=2, offset_scale=2.0, offset_kernel_size=4,
              attn_layout="kn")
    exact = DeformCrossAttention2D(**kw)
    table = DeformCrossAttention2D(**kw, cpb_table_divisor=4)
    variables = exact.init(jax.random.PRNGKey(0), x1, x2, deterministic=True)
    o1, a1 = exact.apply(variables, x1, x2, deterministic=True)
    o2, a2 = table.apply(variables, x1, x2, deterministic=True)
    assert not np.array_equal(np.asarray(a1), np.asarray(a2)), \
        "table path did not engage"
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=5e-3)


def test_cpb_table_divisor_threads_from_config():
    """cfg.cpb_table_divisor reaches the deformable attentions via the
    factory's module-level knob (the production presets set 2)."""
    from disentangled_multimodal_learning_tpu.config import Config
    from disentangled_multimodal_learning_tpu.models import (
        deform_attention as da)
    from disentangled_multimodal_learning_tpu.models.factory import define_net

    old = da.CPB_TABLE_DIVISOR
    try:
        cfg = Config(mode="teacher", fixdim=64, batch_size=1,
                     cpb_table_divisor=2).validate()
        define_net(cfg)
        assert da.CPB_TABLE_DIVISOR == 2
        cfg = Config(mode="teacher", fixdim=64, batch_size=1).validate()
        define_net(cfg)
        assert da.CPB_TABLE_DIVISOR == 0  # default stays exact
    finally:
        da.CPB_TABLE_DIVISOR = old


@pytest.mark.parametrize("w128", [True, False])
def test_cpb_table_1d_kernel_and_accuracy(rng, w128):
    """1-D table CPB: interpret-mode kernel == jnp reference (fwd + grads),
    and both are close to the exact 1-D CPB MLP bias (multi-channel).
    Covers BOTH kernel layouts: the r5 w128 [rows, 128] flat-roll windows
    (the TPU default — full sublane utilization) and the original [1, cn]
    lane-rotate kernels (kept for A/B)."""
    from disentangled_multimodal_learning_tpu.ops.pallas import (
        deform_attn as DA)
    from disentangled_multimodal_learning_tpu.ops.pallas.deform_attn import (
        cpb_bias_table_1d)

    old_w128 = DA.TBL1_W128
    DA.TBL1_W128 = w128
    try:
        _check_cpb_table_1d(rng)
    finally:
        DA.TBL1_W128 = old_w128


def _check_cpb_table_1d(rng):
    from disentangled_multimodal_learning_tpu.ops.pallas.deform_attn import (
        cpb_bias_table_1d)

    n_q, K, BH, O = 64, 10, 4, 2
    kv_bound = 1.2
    gkv = jnp.asarray(rng.uniform(-kv_bound, kv_bound, size=(BH, K)),
                      jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(1, HID)) / np.sqrt(1), jnp.float32)
    b1 = jnp.zeros(HID)
    w2 = jnp.asarray(rng.normal(size=(HID, HID)) / np.sqrt(HID), jnp.float32)
    b2 = jnp.zeros(HID)
    w3 = jnp.asarray(rng.normal(size=(HID, O)) / np.sqrt(HID), jnp.float32)
    b3 = jnp.zeros(O)

    ref = cpb_bias_table_1d(gkv, w1, b1, w2, b2, w3, b3, n_q=n_q,
                            kv_bound=kv_bound, use_kernel=False)
    kern = cpb_bias_table_1d(gkv, w1, b1, w2, b2, w3, b3, n_q=n_q,
                             kv_bound=kv_bound, use_kernel=True,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(kern), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)

    # exact MLP bias [BH, O, K, n_q]
    seq = (2.0 * np.arange(n_q) / (n_q - 1) - 1.0).astype(np.float32)
    d = jnp.asarray(seq)[None, None, :] - gkv[:, :, None]  # [BH, K, N]
    p = jnp.sign(d) * jnp.log1p(jnp.abs(d))
    h = jnp.maximum(p[..., None] * w1[0] + b1, 0.0)
    h = jnp.maximum(h @ w2 + b2, 0.0)
    exact = (h @ w3 + b3).transpose(0, 3, 1, 2)           # [BH, O, K, N]
    ptp = float(exact.max() - exact.min())
    err = float(jnp.abs(ref - exact).max())
    assert err < 0.02 * ptp, (err, ptp)

    # gradients: kernel custom-VJP == jnp-reference autodiff
    def loss(use_kernel):
        def f(gkv_, w1_, w2_):
            bias = cpb_bias_table_1d(gkv_, w1_, b1, w2_, b2, w3, b3,
                                     n_q=n_q, kv_bound=kv_bound,
                                     use_kernel=use_kernel,
                                     interpret=use_kernel)
            return jnp.sum(jnp.sin(3.0 * bias))
        return f

    gk = jax.grad(loss(True), argnums=(0, 1, 2))(gkv, w1, w2)
    gr = jax.grad(loss(False), argnums=(0, 1, 2))(gkv, w1, w2)
    for a, b in zip(gk, gr):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=3e-5)


def test_cpb_table_1d_through_attention_module(rng):
    """DeformCrossAttention1D with the table CPB stays close to exact."""
    from disentangled_multimodal_learning_tpu.models.deform_attention import (
        DeformCrossAttention1D)

    B, N, C = 2, 65, 32
    x1 = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    kw = dict(dim=C, dim_head=8, heads=4, offset_groups=2, dropout=0.0,
              downsample_factor=4, offset_scale=2.0, offset_kernel_size=6,
              attn_layout="kn")
    exact = DeformCrossAttention1D(**kw)
    table = DeformCrossAttention1D(**kw, cpb_table_divisor=1)
    variables = exact.init(jax.random.PRNGKey(0), x1, x2, deterministic=True)
    o1 = exact.apply(variables, x1, x2, deterministic=True)
    o2 = table.apply(variables, x1, x2, deterministic=True)
    assert not np.array_equal(np.asarray(o1), np.asarray(o2)), \
        "1-D table path did not engage"
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               atol=5e-3, rtol=1e-2)


# ------------------------------------------------- v10 fused table attention
def _v10_case(rng, side, kv_bound, BH, K, D):
    from disentangled_multimodal_learning_tpu.ops.pallas import (
        deform_attn as da)

    N = side * side
    w1, b1, w2, b2, w3, b3 = _cpb_params(rng)
    gkv = jnp.asarray(rng.uniform(-kv_bound, kv_bound, size=(BH, K, 2)),
                      jnp.float32)
    q = jnp.asarray(rng.normal(size=(BH, N, D)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.normal(size=(BH, K, D)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.normal(size=(BH, K, D)), jnp.float32)
    tablep, shifts, rn, split = da.cpb_bias_table_parts(
        gkv, w1, b1, w2, b2, w3, b3, side=side, kv_bound=kv_bound)
    assert (rn, split) == da.table_geometry(side, kv_bound)
    return da, q, k, v, tablep, shifts, rn, split


@pytest.mark.parametrize("side,kv_bound,split_expected",
                         [(8, 0.5, 0),      # rn < 128: plain layout
                          (50, 2.5, 49)])   # rn = 177: lane-split layout
def test_v10_fused_table_attention_fwd_and_grads(rng, side, kv_bound,
                                                 split_expected):
    """v10 fused divisor-1 table attention (windows + sim + softmax + PV in
    one kernel, interpret mode) vs the jnp reference: forward and all five
    gradients, both table layouts."""
    da, q, k, v, tablep, shifts, rn, split = _v10_case(
        rng, side, kv_bound, BH=2, K=16, D=8)
    assert split == split_expected
    seed = jnp.zeros((), jnp.float32)

    out, attn = da.fused_table_attention(q, k, v, tablep, shifts, seed,
                                         side, rn, split, 0.0, True)
    ref_out, ref_attn = da._v10_ref(q, k, v, tablep, shifts, side, rn, split)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(attn), np.asarray(ref_attn),
                               atol=1e-6, rtol=1e-4)

    go = jnp.asarray(rng.normal(size=out.shape), jnp.float32)
    ga = jnp.asarray(rng.normal(size=attn.shape), jnp.float32)

    def loss_f(q, k, v, tablep, shifts):
        o, a = da.fused_table_attention(q, k, v, tablep, shifts, seed,
                                        side, rn, split, 0.0, True)
        return jnp.sum(o * go) + jnp.sum(a * ga)

    def loss_r(q, k, v, tablep, shifts):
        o, a = da._v10_ref(q, k, v, tablep, shifts, side, rn, split)
        return jnp.sum(o * go) + jnp.sum(a * ga)

    gf = jax.grad(loss_f, argnums=(0, 1, 2, 3, 4))(q, k, v, tablep, shifts)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(q, k, v, tablep, shifts)
    # dsh tolerance: the shift cotangent is a full-window contraction
    # (_tbl_sum2d over [64, 128] f32), whose sum ORDER differs between the
    # kernel and XLA autodiff; at side=50 the fused kernel sits 6e-6 from
    # the f64 truth while the f32 reference itself is 2.5e-5 away, so the
    # 1e-4 relative gate bounds reference noise, not kernel error.
    tols = {"dsh": 1e-4}
    for n, a, b in zip(["dq", "dk", "dv", "dtab", "dsh"], gf, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-8
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err < tols.get(n, 2e-5), f"v10 grad {n}: rel err {err:.2e}"


def test_v10_dropout_determinism_and_consistency(rng):
    """v10 dropout: same seed -> bit-identical out, attn output is the
    PRE-dropout softmax, and the backward regenerates the identical mask
    (dv == p_dropped^T @ g_out).

    On CPU the TPU-semantics interpreter's PRNG emits zero bits, i.e. a
    deterministic ALL-DROPPED mask (u = 0 < rate): out must be exactly 0,
    dv exactly 0, and the remaining grads must match a reference whose
    out-branch is dead.  On a real TPU backend the same test runs the
    stochastic assertions (keep rate ~ 1-rate, kept entries scaled by
    1/(1-rate), dv identity against the observed mask)."""
    from jax.experimental.pallas import tpu as pltpu

    side, kv_bound, BH, K, D = 8, 0.5, 2, 16, 16
    da, q, k, v, tablep, shifts, rn, split = _v10_case(
        rng, side, kv_bound, BH=BH, K=K, D=D)
    rate = 0.25
    on_tpu = jax.default_backend() == "tpu"
    interp = False if on_tpu else pltpu.InterpretParams()
    s1 = jnp.asarray(7.0, jnp.float32)

    out_a, attn_a = da.fused_table_attention(q, k, v, tablep, shifts, s1,
                                             side, rn, split, rate, interp)
    out_b, _ = da.fused_table_attention(q, k, v, tablep, shifts, s1,
                                        side, rn, split, rate, interp)
    out_n, attn_n = da.fused_table_attention(q, k, v, tablep, shifts, s1,
                                             side, rn, split, 0.0, interp)
    assert np.array_equal(np.asarray(out_a), np.asarray(out_b))
    # attn is the pre-dropout residual: identical to the no-dropout attn
    np.testing.assert_array_equal(np.asarray(attn_a), np.asarray(attn_n))

    # read the dropped attention off an identity value matrix (D == K)
    eye = jnp.broadcast_to(jnp.eye(K, dtype=jnp.float32), (BH, K, K))
    p_drop, _ = da.fused_table_attention(q, k, eye, tablep, shifts, s1,
                                         side, rn, split, rate, interp)
    p_drop = jnp.swapaxes(p_drop, 1, 2)               # [BH, K, N]
    kept = np.asarray(p_drop) != 0.0
    if on_tpu:
        s2 = jnp.asarray(8.0, jnp.float32)
        out_c, _ = da.fused_table_attention(q, k, v, tablep, shifts, s2,
                                            side, rn, split, rate, interp)
        assert not np.array_equal(np.asarray(out_a), np.asarray(out_c))
        keep_rate = kept.mean()
        assert 0.70 < keep_rate < 0.80, keep_rate     # ~ 1 - rate
        scaled = np.asarray(attn_a) / (1.0 - rate)
        np.testing.assert_allclose(np.asarray(p_drop)[kept], scaled[kept],
                                   rtol=1e-5, atol=1e-7)
    else:
        assert not kept.any(), "interpret PRNG emits zero bits: all dropped"
        np.testing.assert_array_equal(np.asarray(out_a),
                                      np.zeros_like(np.asarray(out_a)))

    # backward regenerates the same mask: dv == p_dropped^T @ g_out, and
    # with the out-branch dead (CPU) the attn-cotangent grads must still
    # match the reference exactly
    go = jnp.asarray(rng.normal(size=out_a.shape), jnp.float32)
    ga = jnp.asarray(rng.normal(size=attn_a.shape), jnp.float32)

    def loss_f(q, k, v, tablep, shifts):
        o, a = da.fused_table_attention(q, k, v, tablep, shifts, s1,
                                        side, rn, split, rate, interp)
        return jnp.sum(o * go) + jnp.sum(a * ga)

    gf = jax.grad(loss_f, argnums=(0, 1, 2, 3, 4))(q, k, v, tablep, shifts)
    dv_want = jnp.einsum("bkn,bnd->bkd", p_drop, go)
    np.testing.assert_allclose(np.asarray(gf[2]), np.asarray(dv_want),
                               rtol=1e-5, atol=1e-5)
    if not on_tpu:
        def loss_r(q, k, v, tablep, shifts):
            _, a = da._v10_ref(q, k, v, tablep, shifts, side, rn, split)
            return jnp.sum(a * ga)     # out-branch dead under the zero mask

        gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(q, k, v, tablep,
                                                       shifts)
        for n, a, b in zip(["dq", "dk", "dv", "dtab", "dsh"], gf, gr):
            scale = float(jnp.max(jnp.abs(b))) + 1e-8
            err = float(jnp.max(jnp.abs(a - b))) / scale
            assert err < 1e-4, f"v10 dropout grad {n}: rel err {err:.2e}"


def test_v10_through_attention_module(rng):
    """DeformCrossAttention2D fused_table=1 (V10_INTERPRET) is numerically
    the v9 divisor-1 kn path: outputs, attention maps AND parameter
    gradients match the unfused module with identical params."""
    from disentangled_multimodal_learning_tpu.models import (
        deform_attention as dam)

    B, N, C = 2, 64, 32
    x1 = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    kw = dict(dim=C, dim_head=8, heads=4, offset_groups=4, dropout=0.0,
              downsample_factor=2, offset_scale=2.0, offset_kernel_size=4,
              attn_layout="kn", cpb_table_divisor=1)
    unfused = dam.DeformCrossAttention2D(**kw, fused_table=0)
    fused = dam.DeformCrossAttention2D(**kw, fused_table=1)
    variables = unfused.init(jax.random.PRNGKey(0), x1, x2,
                             deterministic=True)
    from jax.experimental.pallas import tpu as pltpu
    old = dam.V10_INTERPRET
    dam.V10_INTERPRET = pltpu.InterpretParams()
    try:
        o1, a1 = unfused.apply(variables, x1, x2, deterministic=True)
        o2, a2 = fused.apply(variables, x1, x2, deterministic=True)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                                   atol=2e-6, rtol=1e-4)

        def loss(mod):
            def f(params):
                o, a = mod.apply({"params": params}, x1, x2,
                                 deterministic=True)
                return jnp.sum(o ** 2) + jnp.sum(jnp.sin(a))
            return f

        g1 = jax.grad(loss(unfused))(variables["params"])
        g2 = jax.grad(loss(fused))(variables["params"])
        flat1 = jax.tree_util.tree_leaves_with_path(g1)
        flat2 = jax.tree_util.tree_leaves_with_path(g2)
        for (p1, l1), (p2, l2) in zip(flat1, flat2):
            assert p1 == p2
            np.testing.assert_allclose(
                np.asarray(l1), np.asarray(l2), atol=5e-4, rtol=2e-3,
                err_msg=f"v10 module grad {jax.tree_util.keystr(p1)}")

        # dropout smoke: the fused PRNG path runs and emits finite values
        fused_d = dam.DeformCrossAttention2D(**dict(kw, dropout=0.3),
                                             fused_table=1)
        o3, _ = fused_d.apply(variables, x1, x2, deterministic=False,
                              rngs={"dropout": jax.random.PRNGKey(1)})
        assert np.all(np.isfinite(np.asarray(o3)))
        assert not np.array_equal(np.asarray(o3), np.asarray(o2))
    finally:
        dam.V10_INTERPRET = old


def test_v10_threads_from_config():
    """cfg.fused_table_attention reaches the module-level knob."""
    from disentangled_multimodal_learning_tpu.config import Config
    from disentangled_multimodal_learning_tpu.models import (
        deform_attention as da)
    from disentangled_multimodal_learning_tpu.models.factory import define_net

    old = da.FUSED_TABLE_ATTENTION
    try:
        cfg = Config(mode="teacher", fixdim=64, batch_size=1,
                     fused_table_attention=True).validate()
        define_net(cfg)
        assert da.FUSED_TABLE_ATTENTION is True
        # default: OFF (measured slower than the unfused d1 path, PERF.md)
        cfg = Config(mode="teacher", fixdim=64, batch_size=1).validate()
        define_net(cfg)
        assert da.FUSED_TABLE_ATTENTION is False
    finally:
        da.FUSED_TABLE_ATTENTION = old


def test_explicit_softmax_shift_is_bit_identical(rng):
    """The explicit pre-softmax max shift is redundant with jax.nn.softmax's
    internal stop-gradient shift: outputs, attention maps AND input
    gradients are bit-identical with the toggle on/off (the internal max of
    the shifted tensor is exactly 0.0 and exp(y - 0.0) == exp(y)).  Default
    off: it saves one full [B,H,K,N] reduction pass per attention
    (tools/exp_softmax_shift.py)."""
    from disentangled_multimodal_learning_tpu.models import (
        deform_attention as da)

    B, N, C = 2, 64, 32
    x1 = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    mod = da.DeformCrossAttention2D(
        dim=C, dim_head=8, heads=4, offset_groups=4, dropout=0.0,
        downsample_factor=2, offset_scale=2.0, offset_kernel_size=4)
    variables = mod.init(jax.random.PRNGKey(0), x1, x2, deterministic=True)

    def run():
        out, attn = mod.apply(variables, x1, x2, deterministic=True)
        g = jax.grad(lambda a: jnp.sum(
            mod.apply(variables, a, x2, deterministic=True)[0] ** 2))(x1)
        return np.asarray(out), np.asarray(attn), np.asarray(g)

    old = da.EXPLICIT_SOFTMAX_SHIFT
    try:
        da.EXPLICIT_SOFTMAX_SHIFT = True
        o1, a1, g1 = run()
        da.EXPLICIT_SOFTMAX_SHIFT = False
        o2, a2, g2 = run()
    finally:
        da.EXPLICIT_SOFTMAX_SHIFT = old
    assert np.array_equal(o1, o2)
    assert np.array_equal(a1, a2)
    assert np.array_equal(g1, g2)
