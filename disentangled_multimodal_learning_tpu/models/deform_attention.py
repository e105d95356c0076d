"""Deformable cross-attention (the flagship kernels), 2-D and 1-D.

TPU-native re-design of the reference deformable attention
(models/DeformableAttention2D.py:162-342, models/DeformableAttention1D.py:
106-240, both derived from lucidrains/deformable-attention):

- token tensors are channels-last ``[B, N, C]`` (the reference transposes to
  NCHW for torch convs; here the grouped 1x1 convs are block-diagonal einsums
  that ride the MXU directly);
- ``F.grid_sample`` is replaced by the hand-rolled gather-4+lerp in
  ops/grid_sample.py (bit-matched against torch, see tests/test_grid_sample*);
- the SwinV2 continuous-position-bias MLP (CPB) is wrapped in
  ``jax.checkpoint`` — its ``[B·G, N, K, dim]`` hidden activations dominate
  HBM otherwise and are cheap to recompute in the backward pass;
- the 1-D module supports both the corrected 1-D bilinear sampler and a
  bit-exact emulation of the reference's degenerate pad-to-2D trick
  (``degenerate_sampling=True``; see ops/grid_sample.py for the analysis).

Pipeline (2-D): queries from x1 on a sqrt(N) x sqrt(N) grid -> per-group
offset conv (stride ``downsample_factor``) predicts a small deformed kv grid
(12x12 for N=2500) -> bilinear-gather x2 at those positions -> k/v projections
-> attention [N_q, N_kv] with CPB relative-position bias.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.grid_sample import (grid_sample_1d, grid_sample_1d_matmul,
                               grid_sample_1d_torchtrick, grid_sample_2d,
                               grid_sample_2d_factored, grid_sample_2d_matmul)


def _compute_dtype():
    """bf16 on TPU (halves HBM traffic of the attention tensors; f32
    accumulation); f32 elsewhere — the CPU backend cannot execute mixed
    bf16 x bf16 -> f32 dots."""
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


class Scale(nn.Module):
    scale: float

    def __call__(self, x):
        return x * self.scale


class GroupedPointwise(nn.Module):
    """Grouped 1x1 conv as a block-diagonal einsum: ``[..., G*Ci] -> [..., G*Co]``
    (reference uses nn.Conv2d(dim, inner, 1, groups=G),
    models/DeformableAttention2D.py:219-222).  Computes in ``dtype`` (params
    stay f32), accumulating in f32."""

    groups: int
    features: int  # total output features (G * Co)
    use_bias: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        g = self.groups
        cin = x.shape[-1] // g
        cout = self.features // g
        w = self.param("kernel", nn.initializers.lecun_normal(), (g, cin, cout))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            w = w.astype(self.dtype)
        y = jnp.einsum("...gi,gio->...go", x.reshape(*x.shape[:-1], g, cin), w,
                       preferred_element_type=jnp.float32)
        y = y.reshape(*x.shape[:-1], self.features)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


# module-level remat switch for the CPB bias MLP (static at trace time)
CPB_REMAT = True
# use the fused wide-layout Pallas CPB kernel on TPU (ops/pallas/deform_attn);
# hiddens never touch HBM and the backward is hand-written
CPB_USE_PALLAS = True
# which Pallas CPB kernel: "v1" = wide MLP kernel + XLA position transform,
# "v5" = self-contained (position diffs, log transform and dgkv reduction all
# in-kernel; see ops/pallas/deform_attn.py)
CPB_KERNEL_VERSION = "v1"
# table-interpolated CPB (v9, APPROXIMATE): >0 evaluates the CPB MLP once on
# a lattice of spacing (query spacing / divisor) and bilinearly interpolates
# each kv point's bias window instead of running the MLP at all Nq*Nk
# positions.  0 = exact (default).  cfg.cpb_table_divisor sets this global
# via the model factory; DeformCrossAttention2D.cpb_table_divisor overrides
# per module.  Accuracy: tools/exp_cpb_table_acc.py (divisor 4: bias error
# ~1e-3 of its dynamic range; post-softmax error ~1e-5 at init-scale
# weights — below the accepted bf16 matmul noise).
CPB_TABLE_DIVISOR = 0
# v10 (r4): at divisor 1 on TPU, fuse the window interpolation INTO the
# attention kernel (sim+softmax+dropout+PV in one pallas call, windows
# placed by static lane rolls).  MEASURED SLOWER than the unfused d1 path
# (teacher step -27%, fwd +63%, grad +123% — tools/exp_v10_{e2e,fwdbwd}.py;
# PERF.md "v10") and therefore OFF by default: the d1 interp output already
# streams at HBM bandwidth and XLA's attention pipeline beats the in-kernel
# VPU window placement.  Kept opt-in + golden-tested like the other losing
# variants.  cfg.fused_table_attention sets this via the factory;
# DeformCrossAttention2D.fused_table overrides per module.
FUSED_TABLE_ATTENTION = False
# force the v10 kernel in interpret mode off-TPU (CPU golden tests only)
V10_INTERPRET = False
# Explicit pre-softmax max shift.  jax.nn.softmax ALREADY computes
# exp(x - stop_gradient(max(x))) internally (jax._src.nn.functions), so the
# explicit ``sim - stop_gradient(max(sim))`` pass is bit-identical to
# skipping it (the internal max of the shifted tensor is exactly 0.0 and
# exp(y - 0.0) == exp(y)) while costing one extra full [B,H,K,N] reduction
# per attention.  Default off; togglable for the A/B in
# tools/exp_softmax_shift.py.
EXPLICIT_SOFTMAX_SHIFT = False
# bf16 attention streams (r5 A/B, VERDICT r4 #3): materialize the [B,H,K,N]
# sim and attention-map streams in bf16 (softmax still reduces in f32).  The
# prior bf16 negatives (PERF.md) were measured in the compute-bound exact-CPB
# era; at the divisor-1 table operating point the XLA attention is
# BANDWIDTH-bound on these f32 streams, so the trade may have flipped.
# cfg.attn_bf16_streams sets this via the factory.
ATTN_BF16_STREAMS = False


def _presoftmax(sim: jnp.ndarray, axis: int) -> jnp.ndarray:
    if EXPLICIT_SOFTMAX_SHIFT:
        sim = sim - jax.lax.stop_gradient(
            jnp.max(sim, axis=axis, keepdims=True))
    return sim


def resolve_attn_layout(layout: str) -> str:
    """Resolve the 2-D attention-map layout: "auto" picks the transposed
    "kn" ([B, heads, Nk, Nq]) layout on TPU — it lets the CPB bias come
    straight out of the transposed Pallas kernel with zero relayouts — and
    the reference "nk" ([B, heads, Nq, Nk]) layout elsewhere."""
    if layout == "auto":
        return "kn" if jax.default_backend() == "tpu" else "nk"
    return layout


def attn_kv_axis(layout: str = "auto") -> int:
    """Axis of the KV dimension in a 4-D attention map of ``layout``
    (for consumers that reduce over kv, e.g. attention-map export)."""
    return -2 if resolve_attn_layout(layout) == "kn" else -1


def _cpb_mlp(grid_q, grid_kv, w1, b1, w2, b2, w3, b3, log_distance, cdt):
    """Unfused CPB MLP (XLA path): pos -> sign*log1p -> 2-layer relu MLP.
    Hiddens are [..., Nq, Nk, dim] (~3 GB/layer at production shapes in f32;
    computed in ``cdt``, usually bf16).  ``grid_kv`` may carry any leading
    batch dims (fused ``[B*G]`` or unfused ``[B, G]``)."""
    grid_q = grid_q.astype(cdt)
    grid_kv = grid_kv.astype(cdt)
    pos = grid_q[:, None, :] - grid_kv[..., None, :, :]  # [...,Nq,Nk,P]
    if log_distance:
        pos = jnp.sign(pos) * jnp.log(jnp.abs(pos) + 1.0)
    h = jnp.maximum(pos @ w1.astype(cdt) + b1.astype(cdt), 0)
    h = jnp.maximum(h @ w2.astype(cdt) + b2.astype(cdt), 0)
    out = h @ w3.astype(cdt) + b3.astype(cdt)
    return out.astype(jnp.float32)


class CPB(nn.Module):
    """SwinV2 continuous positional bias MLP (reference
    models/DeformableAttention2D.py:121-158; 1-D flavor at
    models/DeformableAttention1D.py:60-102).

    grid_q: ``[Nq, P]`` static query coords; grid_kv: ``[B*G, Nk, P]`` sampled
    coords, or unfused ``[B, G, Nk, P]`` (P=2 for 2-D, 1 for 1-D).  Returns
    bias ``[B, heads, Nq, Nk]``.  The unfused form keeps the group axis out
    of the batch dim so a tensor-parallel mesh axis can shard it
    (parallel/tp_shard.py); the Pallas kernels re-fuse at the kernel
    boundary (single-chip TPU only).

    Two execution paths over the SAME parameters:
    - fused wide-layout Pallas kernel (TPU, 2-D, depth=2, dim=32,
      heads==offset_groups) — hiddens stay in VMEM;
    - unfused XLA MLP in bf16 under optional nn.remat (CPB_REMAT).
    """

    dim: int
    heads: int
    offset_groups: int
    depth: int = 2
    log_distance: bool = True
    # table-interpolated approximation (v9): >0 enables with that lattice
    # divisor; requires the caller to declare the static query-grid extent
    # (table_side = sqrt(Nq) for the 2-D grid, = Nq for the 1-D sequence)
    # and a static |grid_kv| bound (the deformable offsets are tanh-bounded,
    # so the attention modules derive it exactly).  The 1-D flavor always
    # uses lattice spacing == query spacing (divisor 1 — already 8e-4 at
    # production N).
    table_divisor: int = 0
    table_side: int = 0
    table_kv_bound: float = 0.0

    @nn.compact
    def __call__(self, grid_q: jnp.ndarray, grid_kv: jnp.ndarray, *,
                 transposed: bool = False, table_parts: bool = False):
        if grid_kv.ndim == 4:  # unfused [B, G, Nk, P]
            b = grid_kv.shape[0]
            assert grid_kv.shape[1] == self.offset_groups
        else:
            b = grid_kv.shape[0] // self.offset_groups
        out_per_group = self.heads // self.offset_groups
        P = grid_q.shape[-1]

        lecun = nn.initializers.lecun_normal()
        zeros = nn.initializers.zeros
        w1 = self.param("mlp_0_kernel", lecun, (P, self.dim))
        b1 = self.param("mlp_0_bias", zeros, (self.dim,))
        w2 = self.param("mlp_1_kernel", lecun, (self.dim, self.dim))
        b2 = self.param("mlp_1_bias", zeros, (self.dim,))
        w3 = self.param("mlp_out_kernel", lecun, (self.dim, out_per_group))
        b3 = self.param("mlp_out_bias", zeros, (out_per_group,))

        # table-interpolated approximation (v9) — opt-in, kv-major output
        # straight into the "kn" layout; Pallas kernel on TPU, identical-
        # arithmetic jnp interpolation elsewhere
        use_table = (self.table_divisor > 0 and transposed and P == 2
                     and out_per_group == 1 and self.depth == 2
                     and self.log_distance and self.table_side >= 2
                     and self.table_side ** 2 == grid_q.shape[0])
        if table_parts:
            # v10 fused-attention path: hand back the differentiable table
            # build + shifts; the interpolation happens inside the fused
            # attention kernel (ops/pallas/deform_attn.py v10 section)
            assert use_table and self.table_divisor == 1
            from ..ops.pallas.deform_attn import cpb_bias_table_parts

            gkv = (grid_kv.reshape(-1, *grid_kv.shape[-2:])
                   if grid_kv.ndim == 4 else grid_kv)
            return cpb_bias_table_parts(
                gkv, w1, b1, w2, b2, w3, b3, side=self.table_side,
                kv_bound=self.table_kv_bound)
        if use_table:
            from ..ops.pallas.deform_attn import cpb_bias_table

            gkv = (grid_kv.reshape(-1, *grid_kv.shape[-2:])
                   if grid_kv.ndim == 4 else grid_kv)
            bias_t = cpb_bias_table(
                gkv, w1, b1, w2, b2, w3, b3, side=self.table_side,
                divisor=self.table_divisor, kv_bound=self.table_kv_bound,
                use_kernel=jax.default_backend() == "tpu")
            nk, nq = bias_t.shape[-2], bias_t.shape[-1]
            return bias_t.reshape(b, self.heads, nk, nq)
        use_table_1d = (self.table_divisor > 0 and transposed and P == 1
                        and self.depth == 2 and self.log_distance
                        and self.table_side >= 2
                        and self.table_side == grid_q.shape[0])
        if use_table_1d:
            from ..ops.pallas.deform_attn import cpb_bias_table_1d

            gkv = (grid_kv.reshape(-1, *grid_kv.shape[-2:])
                   if grid_kv.ndim == 4 else grid_kv)
            bias_t = cpb_bias_table_1d(
                gkv[..., 0], w1, b1, w2, b2, w3, b3, n_q=self.table_side,
                kv_bound=self.table_kv_bound,
                use_kernel=jax.default_backend() == "tpu")
            nk, nq = bias_t.shape[-2], bias_t.shape[-1]
            return bias_t.reshape(b, self.heads, nk, nq)

        # the Pallas kernel hardcodes the sign*log1p distance transform
        # (ops/pallas/deform_attn.py), so log_distance=False must take the
        # XLA path
        base_ok = (CPB_USE_PALLAS and self.depth == 2 and self.log_distance
                   and jax.default_backend() == "tpu")
        if base_ok:
            from ..ops.pallas.deform_attn import (HID, cpb_bias_from_grids,
                                                  cpb_bias_grids_fused,
                                                  cpb_bias_transposed)

            base_ok = self.dim == HID
        # transposed kernel handles P in (1, 2) and any out_per_group (one
        # call per channel); the untransposed v1 kernel is 2-coordinate,
        # single-channel only
        use_pallas_t = base_ok and transposed and P in (1, 2)
        use_pallas = base_ok and not transposed and P == 2 and out_per_group == 1
        if (use_pallas_t or use_pallas) and grid_kv.ndim == 4:
            # kernels take the fused [B*G, Nk, P] row layout
            grid_kv = grid_kv.reshape(-1, *grid_kv.shape[-2:])
        if use_pallas_t:
            # transposed kernel emits [B*G, (out,) Nk, Nq] natively (no
            # streams, no relayouts).  The 1-D CPB (P=1, e.g.
            # DeformCrossAttention1D with heads/offset_groups=2) reuses the
            # 2-coordinate kernel by zero-padding the second coordinate
            # (sign*log1p(0)=0 through a zero first-layer row contributes
            # nothing); all output head-channels come from ONE shared MLP
            # evaluation per row.
            gq = grid_q if P == 2 else jnp.pad(grid_q, ((0, 0), (0, 1)))
            gkv = (grid_kv if P == 2
                   else jnp.pad(grid_kv, ((0, 0), (0, 0), (0, 1))))
            w1p = (w1 if P == 2
                   else jnp.concatenate([w1, jnp.zeros_like(w1)], axis=0))
            bias_t = cpb_bias_transposed(gq, gkv, w1p, b1, w2, b2, w3, b3)
            nk, nq = bias_t.shape[-2], bias_t.shape[-1]
            # head index = g * out_per_group + o, matching the untransposed
            # reshape path below
            return bias_t.reshape(b, self.heads, nk, nq)
        if use_pallas:
            kernel = (cpb_bias_grids_fused if CPB_KERNEL_VERSION == "v5"
                      else cpb_bias_from_grids)
            bias = kernel(grid_q, grid_kv, w1, b1, w2, b2, w3,
                          b3)[..., None]  # [B*G, Nq, Nk, 1]
        else:
            cdt = _compute_dtype()
            fn = _cpb_mlp
            if CPB_REMAT:
                fn = jax.checkpoint(
                    _cpb_mlp, static_argnums=(8, 9),
                    policy=jax.checkpoint_policies.nothing_saveable)
            bias = fn(grid_q, grid_kv, w1, b1, w2, b2, w3, b3,
                      self.log_distance, cdt)
        nq, nk = bias.shape[-3], bias.shape[-2]
        # no-op when bias is already unfused [B, G, Nq, Nk, opg] (the
        # TP-friendly XLA path); splits B*G for the fused/Pallas paths
        bias = bias.reshape(b, self.offset_groups, nq, nk, out_per_group)
        bias = bias.transpose(0, 1, 4, 2, 3).reshape(b, self.heads, nq, nk)
        if transposed:
            bias = jnp.swapaxes(bias, -1, -2)  # XLA fallback path
        return bias


def create_grid_2d(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """[2, h, w] with channel 0 = x (width index), 1 = y (height index)
    (reference create_grid_like with indexing='xy',
    models/DeformableAttention2D.py:89-99)."""
    ys = jnp.arange(h, dtype=dtype)
    xs = jnp.arange(w, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    return jnp.stack([gx, gy], axis=0)


def normalize_grid_2d(grid: jnp.ndarray) -> jnp.ndarray:
    """[.., 2, h, w] -> [.., h, w, 2] scaled to [-1, 1].

    NOTE: the reference's normalize_grid (models/DeformableAttention2D.py:
    101-109) unbinds (x, y) but normalizes the first by (h-1) and the second
    by (w-1) — swapped denominators. Harmless there because h == w always; we
    normalize x by (w-1) and y by (h-1), correct for any aspect ratio.
    """
    h, w = grid.shape[-2:]
    gx = grid[..., 0, :, :] * (2.0 / max(w - 1, 1)) - 1.0
    gy = grid[..., 1, :, :] * (2.0 / max(h - 1, 1)) - 1.0
    return jnp.stack([gx, gy], axis=-1)


class _DepthwiseConv(nn.Module):
    """Depthwise conv (2D kernel k, stride s) on NHWC.

    ``tile > 1`` applies the same per-channel kernel to ``tile`` stacked
    channel groups (``[B, h, w, tile*channels]``, group-major) — numerically
    identical to batching the groups into the batch dim, but it keeps the
    group axis out of a fused ``B*G`` dim so a tensor-parallel mesh axis can
    shard it (parallel/tp_shard.py).  Params are identical to ``tile=1``."""

    kernel_size: int
    stride: int
    channels: int
    tile: int = 1

    @nn.compact
    def __call__(self, x):
        k, s, c = self.kernel_size, self.stride, self.channels
        ker = self.param("kernel", nn.initializers.lecun_normal(), (k, k, 1, c))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if self.tile > 1:
            ker = jnp.tile(ker, (1, 1, 1, self.tile))
            bias = jnp.tile(bias, (self.tile,))
        pad = (k - s) // 2
        y = jax.lax.conv_general_dilated(
            x, ker, (s, s), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c * self.tile,
        )
        return y + bias


class DeformCrossAttention2D(nn.Module):
    """2-D deformable cross attention: x1 queries, x2 sampled as kv.

    Config matches the reference instantiation (models/Modules.py:107-126):
    dim=128, dim_head=64, heads=8, offset_groups=8, downsample_factor=4,
    offset_scale=4, offset_kernel_size=6, grouped q/k/v.

    Inputs x1, x2: ``[B, N, C]`` with N a perfect square.
    Returns (out ``[B, N, C]``, attn) or (out, vgrid ``[B*G, 2, gh, gw]``)
    when ``return_vgrid`` — exactly the reference's two return modes
    (models/DeformableAttention2D.py:328-342).  The attn map is
    ``[B, heads, N, K]`` in the "nk" layout and ``[B, heads, K, N]`` in the
    TPU-native "kn" layout (see ``attn_layout`` / :func:`attn_kv_axis`).
    """

    dim: int
    dim_head: int = 64
    heads: int = 8
    dropout: float = 0.0
    downsample_factor: int = 4
    offset_scale: float = 4.0
    offset_groups: int = 8
    offset_kernel_size: int = 6
    # attention-map layout: "nk" = reference [B,H,Nq,Nk]; "kn" = transposed
    # [B,H,Nk,Nq] (TPU-native: the CPB bias comes straight out of the
    # transposed Pallas kernel and sim/softmax/PV run in that layout with
    # zero relayouts); "auto" = "kn" on TPU, "nk" elsewhere.  The attention
    # consistency losses contract over all trailing axes and are layout-
    # independent; reduce over kv via attn_kv_axis() in other consumers.
    attn_layout: str = "auto"
    # table-interpolated CPB (approximate, see CPB_TABLE_DIVISOR): -1 = use
    # the module-level global (set from cfg.cpb_table_divisor); 0 = exact
    cpb_table_divisor: int = -1
    # v10 fused table attention (see FUSED_TABLE_ATTENTION): -1 = global
    fused_table: int = -1

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, *, return_vgrid: bool = False,
                 deterministic: bool = True):
        B, N, C = x1.shape
        side = int(math.isqrt(N))
        assert side * side == N, f"token count {N} must be a perfect square"
        G, H = self.offset_groups, self.heads
        inner = self.dim_head * H
        od = inner // G  # offset-conv channel count per group

        cdt = _compute_dtype()
        q = GroupedPointwise(G, inner, use_bias=False, dtype=cdt,
                             name="to_q")(x1)  # [B,N,inner]

        # ---- offsets from grouped queries --------------------------------
        # The offset-group axis G stays UNFUSED from the batch dim all the
        # way through (channels kept group-major; the depthwise conv tiles
        # its shared kernel instead of folding G into batch): every reshape
        # below then splits/merges with G (or heads) as the major factor, so
        # a tensor-parallel 'model' mesh axis sharding the head/group params
        # (parallel/tp_shard.py) propagates with zero resharding.
        qg = q.reshape(B, side, side, G * od)  # channels group-major
        off = _DepthwiseConv(self.offset_kernel_size, self.downsample_factor,
                             od, tile=G, name="offset_conv")(qg)
        off = nn.gelu(off, approximate=False)
        gh, gw = off.shape[1], off.shape[2]
        off = off.reshape(B, gh, gw, G, od)
        off = nn.Dense(2, use_bias=False, name="offset_out")(off)  # [B,gh,gw,G,2]
        off = jnp.tanh(off) * self.offset_scale
        off = off.transpose(0, 3, 4, 1, 2)  # [B, G, 2, gh, gw]

        grid = create_grid_2d(gh, gw, dtype=off.dtype)
        vgrid = grid[None, None] + off  # [B, G, 2, gh, gw]
        # vgrid is normalized by the SMALL grid extent (gh-1, gw-1), exactly
        # like the reference (normalize_grid reads vgrid.shape[-2:],
        # models/DeformableAttention2D.py:270): the coarse 12x12 base grid is
        # stretched over the full 50x50 kv map in normalized coordinates, and
        # a tanh offset of +-offset_scale small-grid units deforms it.
        vgrid_scaled = normalize_grid_2d(vgrid)  # [B, G, gh, gw, 2]

        # ---- gather kv features at deformed positions --------------------
        x2g = x2.reshape(B, side, side, G, C // G).transpose(0, 3, 1, 2, 4)
        pts = vgrid_scaled.reshape(B, G, gh * gw, 2)
        # factored-matmul formulation: identical values, scatter-free
        # backward (the gather version's scatter-add lowers to while-loops
        # on TPU) with per-axis separable weights instead of the
        # [B, G, K, side*side] one-hot (ops/grid_sample.py)
        kv = grid_sample_2d_factored(x2g, pts)  # [B, G, K, C//G]
        K = gh * gw
        kv = kv.transpose(0, 2, 1, 3).reshape(B, K, C)

        k = GroupedPointwise(G, inner, use_bias=False, dtype=cdt, name="to_k")(kv)
        v = GroupedPointwise(G, inner, use_bias=False, dtype=cdt, name="to_v")(kv)

        # ---- attention (bf16 operands, f32 accumulation/softmax) ----------
        scale = self.dim_head ** -0.5

        def split(t):
            return t.reshape(B, -1, H, self.dim_head).transpose(0, 2, 1, 3)

        qh = split(q) * scale
        kh, vh = split(k), split(v)
        layout = resolve_attn_layout(self.attn_layout)

        grid_full = create_grid_2d(side, side, dtype=x1.dtype)
        grid_q = normalize_grid_2d(grid_full).reshape(N, 2)
        tbl_div = (CPB_TABLE_DIVISOR if self.cpb_table_divisor < 0
                   else self.cpb_table_divisor)
        # |vgrid_scaled| <= 1 + 2*offset_scale/(g-1): tanh bounds the offsets
        # in small-grid units, normalize_grid_2d divides by (g-1) per axis
        tbl_bound = (1.0 + 2.0 * self.offset_scale / (min(gh, gw) - 1)
                     if min(gh, gw) > 1 else 0.0)
        cpb = CPB(self.dim // 4, heads=H, offset_groups=G, depth=2,
                  table_divisor=(tbl_div if min(gh, gw) > 1 else 0),
                  table_side=side, table_kv_bound=tbl_bound,
                  name="rel_pos_bias")
        fused_tbl = (FUSED_TABLE_ATTENTION if self.fused_table < 0
                     else bool(self.fused_table))
        from ..ops.pallas.deform_attn import v10_supported
        use_v10 = (fused_tbl and layout == "kn" and tbl_div == 1
                   and min(gh, gw) > 1 and H == G
                   and v10_supported(N, side)
                   and (jax.default_backend() == "tpu" or V10_INTERPRET))
        if use_v10:
            # v10: window interpolation + sim + softmax + dropout + PV in
            # ONE pallas call (kn layout); the bias never exists in HBM in
            # any layout.  Math identical to the kn branch below with the
            # table CPB (golden-tested against it).
            from ..ops.pallas.deform_attn import fused_table_attention

            tablep, shifts, rn, tsplit = cpb(grid_q, pts, transposed=True,
                                             table_parts=True)
            rate = 0.0 if deterministic else float(self.dropout)
            if rate > 0.0:
                # float32 seed: the custom VJP emits a float cotangent for
                # every tensor input (int inputs would need float0); the
                # kernel re-derives int32 from it identically in fwd and bwd
                seed = jax.random.randint(self.make_rng("dropout"), (), 0,
                                          1 << 24).astype(jnp.float32)
            else:
                seed = jnp.zeros((), jnp.float32)
            qf = qh.astype(jnp.float32).reshape(B * H, N, self.dim_head)
            kf = kh.astype(jnp.float32).reshape(B * H, K, self.dim_head)
            vf = vh.astype(jnp.float32).reshape(B * H, K, self.dim_head)
            out, attn = fused_table_attention(qf, kf, vf, tablep, shifts,
                                              seed, side, rn, tsplit, rate,
                                              V10_INTERPRET)
            out = out.reshape(B, H, N, self.dim_head)
            attn_return = attn.reshape(B, H, K, N)
        elif layout == "kn":
            # transposed layout: i = query, j = kv; sim/softmax/PV in
            # [B,H,Nk,Nq] so the transposed CPB kernel output is consumed
            # with zero relayouts.  sdt = the materialized-stream dtype:
            # bf16 halves the HBM traffic of the sim/attn [B,H,K,N] streams
            # (the step's bandwidth bound at the d1 table operating point);
            # the softmax still upcasts and reduces in f32.
            sdt = jnp.bfloat16 if ATTN_BF16_STREAMS else jnp.float32
            sim = jnp.einsum("bhjd,bhid->bhji", kh.astype(cdt),
                             qh.astype(cdt),
                             preferred_element_type=sdt)  # [B,H,K,N]
            sim = sim + cpb(grid_q, pts, transposed=True).astype(sdt)
            attn = jax.nn.softmax(
                _presoftmax(sim.astype(jnp.float32), -2), axis=-2).astype(sdt)
            attn_return = attn
            attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
            out = jnp.einsum("bhji,bhjd->bhid", attn.astype(cdt),
                             vh.astype(cdt),
                             preferred_element_type=jnp.float32)
        else:
            sim = jnp.einsum("bhid,bhjd->bhij", qh.astype(cdt),
                             kh.astype(cdt),
                             preferred_element_type=jnp.float32)  # [B,H,N,K]
            sim = sim + cpb(grid_q, pts)
            attn = jax.nn.softmax(_presoftmax(sim, -1), axis=-1)
            attn_return = attn
            attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
            out = jnp.einsum("bhij,bhjd->bhid", attn.astype(cdt),
                             vh.astype(cdt),
                             preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, inner)
        out = nn.Dense(self.dim, use_bias=True, name="to_out")(out)

        if return_vgrid:
            # public contract keeps the reference's fused [B*G, 2, gh, gw]
            return out, vgrid.reshape(B * G, 2, gh, gw)
        return out, attn_return


class DeformCrossAttention1D(nn.Module):
    """1-D deformable cross attention (reference
    models/DeformableAttention1D.py:106-240; instantiated with dim=128,
    downsample_factor=4, offset_scale=2, offset_kernel_size=6 and default
    offset_groups=4, ungrouped q/k/v at models/DeformCrossTransMIL.py:55-60).

    ``degenerate_sampling=True`` reproduces the reference's pad-to-2D
    grid-sample bug exactly (see ops/grid_sample.py); default False uses the
    corrected 1-D bilinear gather.
    """

    dim: int
    dim_head: int = 64
    heads: int = 8
    dropout: float = 0.0
    downsample_factor: int = 4
    offset_scale: float = 2.0
    offset_groups: int = 4
    offset_kernel_size: int = 6
    degenerate_sampling: bool = False
    # internal attention layout (the 1-D module never returns attention
    # maps, so this is invisible to callers): "kn" on TPU feeds the
    # transposed CPB kernel with zero relayouts; see resolve_attn_layout
    attn_layout: str = "auto"
    # table-interpolated CPB (approximate): -1 = follow the global
    # CPB_TABLE_DIVISOR (the DEFAULT since r5, same semantics as the 2-D
    # module: the production presets run table CPB, plain Config() runs
    # exact).  The r3 measurement had the 1-D table perf-NEUTRAL (its
    # [1, cn] lane rotates use 1 of 8 sublanes); at the r5 variant-G
    # operating point it leads exact by ~4% (fwd+bwd 19.9 vs 20.7 ms,
    # tools/exp_tbl1_w128.py) with interpolation error far below f32
    # matmul noise (lattice spacing == query spacing).  0 forces exact.
    cpb_table_divisor: int = -1

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, *, return_vgrid: bool = False,
                 deterministic: bool = True):
        B, N, C = x1.shape
        G, H = self.offset_groups, self.heads
        inner = self.dim_head * H
        od = inner // G

        q = nn.Dense(inner, use_bias=False, name="to_q")(x1)  # ungrouped 1x1 conv

        qg = q.reshape(B, N, G, od).transpose(0, 2, 1, 3).reshape(B * G, N, od)
        # depthwise conv1d k=6 s=4 p=1 over the length axis
        k_, s_ = self.offset_kernel_size, self.downsample_factor
        ker = self.param("offset_conv_kernel", nn.initializers.lecun_normal(), (k_, 1, od))
        cbias = self.param("offset_conv_bias", nn.initializers.zeros, (od,))
        pad = (k_ - s_) // 2
        off = jax.lax.conv_general_dilated(
            qg, ker, (s_,), ((pad, pad),),
            dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=od,
        ) + cbias
        off = nn.gelu(off, approximate=False)
        off = nn.Dense(1, use_bias=False, name="offset_out")(off)[..., 0]  # [B*G, n_ds]
        off = jnp.tanh(off) * self.offset_scale
        n_ds = off.shape[-1]

        grid = jnp.arange(n_ds, dtype=off.dtype)
        vgrid = grid[None] + off  # [B*G, n_ds]
        vgrid_scaled = 2.0 * vgrid / max(n_ds - 1, 1) - 1.0

        x2g = x2.reshape(B, N, G, C // G).transpose(0, 2, 1, 3).reshape(B * G, N, C // G)
        sampler = (grid_sample_1d_torchtrick if self.degenerate_sampling
                   else grid_sample_1d_matmul)
        kv = sampler(x2g, vgrid_scaled)  # [B*G, n_ds, C//G]
        kv = kv.reshape(B, G, n_ds, C // G).transpose(0, 2, 1, 3).reshape(B, n_ds, C)

        kk = nn.Dense(inner, use_bias=False, name="to_k")(kv)
        vv = nn.Dense(inner, use_bias=False, name="to_v")(kv)

        scale = self.dim_head ** -0.5

        def split(t):
            return t.reshape(B, -1, H, self.dim_head).transpose(0, 2, 1, 3)

        qh = split(q) * scale
        kh, vh = split(kk), split(vv)
        layout = resolve_attn_layout(self.attn_layout)
        cdt = _compute_dtype()  # bf16 operands / f32 accum on TPU

        def ein(spec, a, b):
            return jnp.einsum(spec, a.astype(cdt), b.astype(cdt),
                              preferred_element_type=jnp.float32)

        seq = jnp.arange(N, dtype=x1.dtype)
        seq_scaled = (2.0 * seq / max(N - 1, 1) - 1.0)[:, None]  # [N,1]
        tbl_div = (CPB_TABLE_DIVISOR if self.cpb_table_divisor < 0
                   else self.cpb_table_divisor)
        # |vgrid_scaled| <= 1 + 2*offset_scale/(n_ds-1) (tanh-bounded
        # offsets, normalized by the downsampled extent)
        tbl_bound = (1.0 + 2.0 * self.offset_scale / (n_ds - 1)
                     if n_ds > 1 else 0.0)
        cpb = CPB(self.dim // 4, heads=H, offset_groups=G, depth=2,
                  table_divisor=(tbl_div if n_ds > 1 else 0),
                  table_side=N, table_kv_bound=tbl_bound,
                  name="rel_pos_bias")
        if layout == "kn":
            # sdt: the materialized-stream dtype (see the 2-D module).  The
            # 1-D mode's floor is set by its [B,H,K,N] streams (K ~= N/4,
            # 4.3x the 2-D K=144 — PERF.md "1-D table CPB"); bf16 halves
            # that traffic.  Softmax still upcasts and reduces in f32.
            sdt = jnp.bfloat16 if ATTN_BF16_STREAMS else jnp.float32
            sim = jnp.einsum("bhjd,bhid->bhji", kh.astype(cdt),
                             qh.astype(cdt),
                             preferred_element_type=sdt)  # [B,H,K,N]
            sim = sim + cpb(seq_scaled, vgrid_scaled[..., None],
                            transposed=True).astype(sdt)
            attn = jax.nn.softmax(
                _presoftmax(sim.astype(jnp.float32), -2), axis=-2).astype(sdt)
            attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
            out = jnp.einsum("bhji,bhjd->bhid", attn.astype(cdt),
                             vh.astype(cdt),
                             preferred_element_type=jnp.float32)
        else:
            sim = ein("bhid,bhjd->bhij", qh, kh)
            sim = sim + cpb(seq_scaled, vgrid_scaled[..., None])
            attn = jax.nn.softmax(_presoftmax(sim, -1), axis=-1)
            attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
            out = ein("bhij,bhjd->bhid", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, inner)
        out = nn.Dense(self.dim, use_bias=True, name="to_out")(out)

        if return_vgrid:
            return out, vgrid
        return out
