"""Bilinear grid sampling (the ``F.grid_sample`` replacement).

The reference's deformable attention gathers key/value features at learned
offset positions via ``F.grid_sample(mode='bilinear', padding_mode='zeros',
align_corners=False)`` (reference models/DeformableAttention2D.py:274-277 and
the 1-D pad-to-2D trick at models/DeformableAttention1D.py:36-43).  JAX has no
such primitive; this module implements the exact semantics as a gather-4 +
lerp with per-corner edge masking.

TPU-native layout note: the core works channels-last ``[B, H, W, C]`` with a
flat point list ``[B, P, 2]`` — one batched gather over the flattened spatial
axis (lane dimension = C, MXU/VPU friendly) instead of torch's NCHW walk.
Golden tests compare bit-level against torch CPU (tests/test_grid_sample.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather_hw(feats_flat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """feats_flat [B, H*W, C], idx [B, P] -> [B, P, C]."""
    return jnp.take_along_axis(feats_flat, idx[..., None], axis=1)


def grid_sample_2d(feats: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample with zeros padding, align_corners=False.

    Args:
      feats: ``[B, H, W, C]`` feature map (channels last).
      points: ``[B, P, 2]`` normalized coords in [-1, 1]; ``points[..., 0]``
        is x (width axis), ``points[..., 1]`` is y (height axis) — torch
        grid_sample convention.

    Returns:
      ``[B, P, C]`` sampled features; out-of-bounds corners contribute zero.
    """
    B, H, W, C = feats.shape
    x = points[..., 0]
    y = points[..., 1]
    # unnormalize, align_corners=False: ((coord + 1) * size - 1) / 2
    fx = ((x + 1.0) * W - 1.0) * 0.5
    fy = ((y + 1.0) * H - 1.0) * 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0
    wx1 = fx - x0
    wx0 = 1.0 - wx1
    wy1 = fy - y0
    wy0 = 1.0 - wy1

    def corner(cx, cy, wgt):
        ix = cx.astype(jnp.int32)
        iy = cy.astype(jnp.int32)
        valid = (cx >= 0) & (cx <= W - 1) & (cy >= 0) & (cy <= H - 1)
        ixc = jnp.clip(ix, 0, W - 1)
        iyc = jnp.clip(iy, 0, H - 1)
        flat = iyc * W + ixc
        g = _gather_hw(feats.reshape(B, H * W, C), flat)
        w = (wgt * valid.astype(feats.dtype))[..., None]
        return g * w

    out = (
        corner(x0, y0, wx0 * wy0)
        + corner(x1, y0, wx1 * wy0)
        + corner(x0, y1, wx0 * wy1)
        + corner(x1, y1, wx1 * wy1)
    )
    return out


def grid_sample_2d_nchw(feats: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """torch-layout wrapper: feats ``[B, C, H, W]``, grid ``[B, h, w, 2]`` ->
    ``[B, C, h, w]`` (exact F.grid_sample signature used by the reference)."""
    B, C, H, W = feats.shape
    h, w = grid.shape[1:3]
    pts = grid.reshape(B, h * w, 2)
    out = grid_sample_2d(jnp.transpose(feats, (0, 2, 3, 1)), pts)  # [B, hw, C]
    return jnp.transpose(out, (0, 2, 1)).reshape(B, C, h, w)


def grid_sample_1d(feats: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """1-D bilinear sample, zeros padding, align_corners=False.

    Matches the reference's pad-to-2D trick (models/DeformableAttention1D.py:
    36-43): a length-N sequence is treated as a 1 x N image sampled at y=0.

    Args:
      feats: ``[B, N, C]``; points: ``[B, P]`` normalized coords in [-1, 1].
    Returns: ``[B, P, C]``.
    """
    B, N, C = feats.shape
    fx = ((points + 1.0) * N - 1.0) * 0.5
    x0 = jnp.floor(fx)
    x1 = x0 + 1.0
    w1 = fx - x0
    w0 = 1.0 - w1

    def corner(cx, wgt):
        ix = cx.astype(jnp.int32)
        valid = (cx >= 0) & (cx <= N - 1)
        g = _gather_hw(feats, jnp.clip(ix, 0, N - 1))
        return g * (wgt * valid.astype(feats.dtype))[..., None]

    return corner(x0, w0) + corner(x1, w1)


def grid_sample_1d_torchtrick(feats: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Bit-exact equivalent of the reference ``grid_sample_1d`` helper
    (models/DeformableAttention1D.py:36-43).

    That helper pads the 1-D grid with a zero second coordinate and reshapes
    the sequence to an ``[N, 1]`` image -- which puts the DATA coordinate on
    the width axis of size 1 and samples the height axis (the actual
    sequence) at the constant y=0, i.e. at the sequence CENTER.  The result
    (verified against torch CPU, see tests/test_grid_sample.py) is

        out[b, p] = center(feats[b]) * max(1 - |v_p| / 2, 0)

    with ``center`` = middle element (odd N) or mean of the two middle
    elements (even N).  This is a latent bug in the reference -- the learned
    offsets only modulate a scalar gain on one fixed feature -- documented and
    reproduced here exactly for parity; the corrected sampler
    (:func:`grid_sample_1d`) is what the framework uses by default.

    Args: feats ``[B, N, C]``, points ``[B, P]`` in [-1, 1].
    Returns: ``[B, P, C]``.
    """
    B, N, C = feats.shape
    if N % 2 == 1:
        center = feats[:, (N - 1) // 2, :]
    else:
        center = 0.5 * (feats[:, N // 2 - 1, :] + feats[:, N // 2, :])
    gain = jnp.maximum(1.0 - jnp.abs(points) * 0.5, 0.0)
    return center[:, None, :] * gain[..., None]


def grid_sample_2d_matmul(feats: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample expressed as a one-hot interpolation-weight matmul.

    Numerically identical to :func:`grid_sample_2d`, but the sample is
    ``out[b,p,c] = sum_m W[b,p,m] * feats_flat[b,m,c]`` with W the sum of the
    four bilinear corner one-hots.  On TPU this matters for TRAINING: the
    gather formulation's backward is a scatter-add, which XLA lowers to
    serialized while-loops (~10-20 ms/step in the teacher profile); the
    matmul formulation's backward is two einsums on the MXU.

    Memory: W is [B, P, H*W] (e.g. 64 x 144 x 2500 = 92 MB f32 at production
    shapes) — use the gather version when H*W is large and P is not small.

    Accepts arbitrary leading batch dims: ``feats [..., H, W, C]`` with
    ``points [..., P, 2]`` (e.g. an unfused ``[B, G, ...]`` group axis, which
    a tensor-parallel mesh axis can shard — parallel/tp_shard.py).
    """
    import jax

    lead = feats.shape[:-3]
    H, W, C = feats.shape[-3:]
    x = points[..., 0]
    y = points[..., 1]
    fx = ((x + 1.0) * W - 1.0) * 0.5
    fy = ((y + 1.0) * H - 1.0) * 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)

    def corner_w(cx, cy, wgt):
        valid = (cx >= 0) & (cx <= W - 1) & (cy >= 0) & (cy <= H - 1)
        flat = (jnp.clip(cy.astype(jnp.int32), 0, H - 1) * W
                + jnp.clip(cx.astype(jnp.int32), 0, W - 1))
        w = wgt * valid.astype(feats.dtype)
        return jax.nn.one_hot(flat, H * W, dtype=feats.dtype) * w[..., None]

    wx1 = fx - x0
    wy1 = fy - y0
    Wmat = (corner_w(x0, y0, (1 - wx1) * (1 - wy1))
            + corner_w(x0 + 1, y0, wx1 * (1 - wy1))
            + corner_w(x0, y0 + 1, (1 - wx1) * wy1)
            + corner_w(x0 + 1, y0 + 1, wx1 * wy1))  # [..., P, H*W]
    return jnp.einsum("...pm,...mc->...pc", Wmat,
                      feats.reshape(*lead, H * W, C))


def grid_sample_2d_factored(feats: jnp.ndarray,
                            points: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample as two SEPARABLE interpolation matmuls.

    Numerically equivalent to :func:`grid_sample_2d_matmul` (same zeros
    padding / align_corners=False semantics), but exploits that the
    bilinear corner weight factorizes per axis —
    ``W[p, (i,j)] = wy[p, i] * wx[p, j]`` with each factor a masked
    two-tap one-hot over ONE axis — so the sample contracts in two steps:

        t[..., p, i, c] = sum_j wx[..., p, j] * feats[..., i, j, c]
        out[..., p, c]  = sum_i wy[..., p, i] * t[..., p, i, c]

    FLOPs are identical to the one-hot matmul but nothing of size
    ``P x H*W`` is ever materialized: the weights are ``[..., P, W]`` and
    ``[..., P, H]`` (~500 KB at production shapes vs the 46 MB one-hot),
    and both contractions (and their transposes in the backward) are
    MXU matmuls.  Measured 4x faster fwd+bwd at the production
    [32, 144, 50, 50, 16] geometry (tools/bench_breakdown.py micro).

    Accepts arbitrary leading batch dims like the one-hot version."""
    import jax

    lead = feats.shape[:-3]
    H, W, C = feats.shape[-3:]
    x = points[..., 0]
    y = points[..., 1]
    fx = ((x + 1.0) * W - 1.0) * 0.5
    fy = ((y + 1.0) * H - 1.0) * 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx1 = fx - x0
    wy1 = fy - y0

    def axis_w(c0, w1, n):
        """Masked two-tap one-hot over one axis: [..., P, n]."""
        def tap(cc, wgt):
            valid = (cc >= 0) & (cc <= n - 1)
            idx = jnp.clip(cc.astype(jnp.int32), 0, n - 1)
            w = wgt * valid.astype(feats.dtype)
            return jax.nn.one_hot(idx, n, dtype=feats.dtype) * w[..., None]

        return tap(c0, 1.0 - w1) + tap(c0 + 1.0, w1)

    wx = axis_w(x0, wx1, W)                                # [..., P, W]
    wy = axis_w(y0, wy1, H)                                # [..., P, H]
    t = jnp.einsum("...pj,...ijc->...pic", wx, feats)
    return jnp.einsum("...pi,...pic->...pc", wy, t)


def grid_sample_1d_matmul(feats: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """1-D analogue of :func:`grid_sample_2d_matmul` (scatter-free backward)."""
    import jax

    B, N, C = feats.shape
    fx = ((points + 1.0) * N - 1.0) * 0.5
    x0 = jnp.floor(fx)
    w1 = fx - x0

    def corner_w(cx, wgt):
        valid = (cx >= 0) & (cx <= N - 1)
        idx = jnp.clip(cx.astype(jnp.int32), 0, N - 1)
        w = wgt * valid.astype(feats.dtype)
        return jax.nn.one_hot(idx, N, dtype=feats.dtype) * w[..., None]

    Wmat = corner_w(x0, 1.0 - w1) + corner_w(x0 + 1.0, w1)
    return jnp.einsum("bpm,bmc->bpc", Wmat, feats)
