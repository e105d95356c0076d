"""Golden tests for the ops layer against torch CPU / naive numpy."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from disentangled_multimodal_learning_tpu.ops import (
    dpc_knn_cluster,
    grid_sample_1d,
    grid_sample_2d,
    grid_sample_2d_nchw,
    merge_tokens,
    moore_penrose_pinv,
    nystrom_attention,
)
from disentangled_multimodal_learning_tpu.ops.grid_sample import grid_sample_1d_torchtrick
from disentangled_multimodal_learning_tpu.ops.cluster import pairwise_dist

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


# ---------------------------------------------------------------- grid sample
def test_grid_sample_2d_matches_torch(rng):
    B, C, H, W = 2, 5, 7, 9
    feats = rng.normal(size=(B, C, H, W)).astype(np.float32)
    grid = (rng.uniform(-1.3, 1.3, size=(B, 4, 6, 2))).astype(np.float32)  # incl. OOB
    want = F.grid_sample(
        torch.from_numpy(feats), torch.from_numpy(grid),
        mode="bilinear", padding_mode="zeros", align_corners=False,
    ).numpy()
    got = np.asarray(grid_sample_2d_nchw(jnp.asarray(feats), jnp.asarray(grid)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_grid_sample_2d_exact_corners(rng):
    # integer pixel centers map back exactly
    H = W = 4
    feats = rng.normal(size=(1, H, W, 3)).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    gx = (2 * xs.ravel() + 1) / W - 1
    gy = (2 * ys.ravel() + 1) / H - 1
    pts = np.stack([gx, gy], -1)[None].astype(np.float32)
    out = np.asarray(grid_sample_2d(jnp.asarray(feats), jnp.asarray(pts)))
    np.testing.assert_allclose(out[0], feats[0].reshape(-1, 3), atol=1e-6)


def test_grid_sample_1d_correct_semantics(rng):
    # sample exactly at element centers -> identity
    N = 8
    feats = rng.normal(size=(1, N, 2)).astype(np.float32)
    v = ((2 * np.arange(N) + 1) / N - 1)[None].astype(np.float32)
    out = np.asarray(grid_sample_1d(jnp.asarray(feats), jnp.asarray(v)))
    np.testing.assert_allclose(out[0], feats[0], atol=1e-6)


@pytest.mark.parametrize("N", [7, 8])
def test_grid_sample_1d_torchtrick_matches_reference_trick(rng, N):
    """The reference's pad-to-2D helper (models/DeformableAttention1D.py:36-43)
    degenerates to center-feature x gain; verify our emulation is bit-exact."""
    from einops import rearrange

    def ref_trick(feats_t, grid_t):
        g = rearrange(grid_t, "... -> ... 1 1")
        g = F.pad(g, (0, 1), value=0.0)
        f = rearrange(feats_t, "... -> ... 1")
        out = F.grid_sample(f, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        return rearrange(out, "... 1 -> ...")

    B, C = 2, 3
    feats = rng.normal(size=(B, C, N)).astype(np.float32)
    v = rng.uniform(-1, 1, size=(B, 5)).astype(np.float32)
    want = ref_trick(torch.from_numpy(feats), torch.from_numpy(v)).numpy()  # [B,C,P]
    got = np.asarray(
        grid_sample_1d_torchtrick(jnp.asarray(feats.transpose(0, 2, 1)), jnp.asarray(v))
    ).transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)


# ----------------------------------------------------------------------- pinv
def test_moore_penrose_pinv_inverts_well_conditioned(rng):
    m = 16
    a = rng.normal(size=(2, 3, m, m)).astype(np.float32) * 0.05
    mat = np.eye(m, dtype=np.float32) + (a + a.swapaxes(-1, -2))
    z = np.asarray(moore_penrose_pinv(jnp.asarray(mat), iters=6))
    approx_eye = mat @ z
    eye = np.broadcast_to(np.eye(m, dtype=np.float32), approx_eye.shape)
    assert np.abs(approx_eye - eye).max() < 5e-2


def test_moore_penrose_pinv_matches_reference_iteration(rng):
    # independent torch transcription of the published iteration, in float64
    # (the cubic iteration on a near-singular softmax block amplifies f32
    # rounding differences between backends; formula equality needs f64)
    from jax import enable_x64

    with enable_x64(True):
        x_np = np.asarray(
            jax.nn.softmax(jnp.asarray(rng.normal(size=(2, 8, 8))), -1)
        ).astype(np.float64)
        x = torch.from_numpy(x_np)
        absx = x.abs()
        z = x.transpose(-1, -2) / (absx.sum(-1).max() * absx.sum(-2).max())
        eye = torch.eye(8, dtype=torch.float64)
        for _ in range(6):
            xz = x @ z
            z = 0.25 * z @ (13 * eye - (xz @ (15 * eye - (xz @ (7 * eye - xz)))))
        got = np.asarray(moore_penrose_pinv(jnp.asarray(x_np), iters=6))
        np.testing.assert_allclose(got, z.numpy(), atol=1e-8, rtol=1e-8)


# -------------------------------------------------------------------- nystrom
def _naive_nystrom(q, k, v, m, iters):
    """Naive numpy transcription of Nystromformer eq. 15 for goldens."""
    B, H, N, D = q.shape
    pad = (m - N % m) % m
    qp = np.pad(q, ((0, 0), (0, 0), (pad, 0), (0, 0)))
    kp = np.pad(k, ((0, 0), (0, 0), (pad, 0), (0, 0)))
    vp = np.pad(v, ((0, 0), (0, 0), (pad, 0), (0, 0)))
    n = N + pad
    l = n // m
    ql = qp.reshape(B, H, m, l, D).mean(3)
    kl = kp.reshape(B, H, m, l, D).mean(3)

    def sm(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    a1 = sm(qp @ kl.swapaxes(-1, -2))
    a2 = sm(ql @ kl.swapaxes(-1, -2))
    a3 = sm(ql @ kp.swapaxes(-1, -2))
    z = np.asarray(moore_penrose_pinv(jnp.asarray(a2), iters))
    out = (a1 @ z) @ (a3 @ vp)
    return out[:, :, -N:]


def test_nystrom_matches_naive(rng):
    # float64 comparison: the landmark-block pinv amplifies f32 rounding
    from jax import enable_x64

    with enable_x64(True):
        B, H, N, D, m = 2, 4, 37, 8, 8
        q = rng.normal(size=(B, H, N, D)) * D ** -0.5
        k = rng.normal(size=(B, H, N, D))
        v = rng.normal(size=(B, H, N, D))
        got = np.asarray(nystrom_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), m))
        want = _naive_nystrom(q, k, v, m, 6)
        np.testing.assert_allclose(got, want, atol=1e-8, rtol=1e-6)


def test_nystrom_approximates_exact_attention(rng):
    # with m == N (every token its own landmark) nystrom == exact attention
    B, H, N, D = 1, 2, 16, 8
    q = rng.normal(size=(B, H, N, D)).astype(np.float32) * D ** -0.5
    k = rng.normal(size=(B, H, N, D)).astype(np.float32)
    v = rng.normal(size=(B, H, N, D)).astype(np.float32)
    got = np.asarray(nystrom_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), N))
    sim = q @ k.swapaxes(-1, -2)
    a = np.asarray(jax.nn.softmax(jnp.asarray(sim), -1))
    want = a @ v
    np.testing.assert_allclose(got, want, atol=5e-2)


# ----------------------------------------------------------------- clustering
def test_pairwise_dist_matches_torch_cdist(rng):
    x = rng.normal(size=(2, 12, 6)).astype(np.float32)
    y = rng.normal(size=(2, 9, 6)).astype(np.float32)
    want = torch.cdist(torch.from_numpy(x), torch.from_numpy(y)).numpy()
    got = np.asarray(pairwise_dist(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def _naive_dpc_knn(x, cluster_num, k, noise):
    """Literal numpy transcription of DPC-KNN (density peaks + kNN density)."""
    B, N, C = x.shape
    idx_all = np.zeros((B, N), dtype=np.int64)
    centers_all = np.zeros((B, cluster_num), dtype=np.int64)
    for b in range(B):
        d = np.sqrt(((x[b][:, None, :] - x[b][None, :, :]) ** 2).sum(-1)) / np.sqrt(C)
        near = np.sort(d, axis=-1)[:, :k]
        dens = np.exp(-(near ** 2).mean(-1)) + noise[b] * 1e-6
        parent = np.empty(N)
        dmax = d.max()
        for i in range(N):
            mask = dens > dens[i]
            parent[i] = d[i][mask].min() if mask.any() else dmax
        score = parent * dens
        centers = np.argsort(-score)[:cluster_num]
        assign = np.argmin(d[centers], axis=0)
        for ci, c in enumerate(centers):
            assign[c] = ci
        idx_all[b] = assign
        centers_all[b] = centers
    return idx_all, centers_all


def test_dpc_knn_matches_naive(rng):
    B, N, C, K = 2, 24, 4, 3
    x = rng.normal(size=(B, N, C)).astype(np.float32)
    noise = rng.uniform(size=(B, N)).astype(np.float32)
    got_idx, got_centers = dpc_knn_cluster(
        jnp.asarray(x), K, k=5, density_noise=jnp.asarray(noise)
    )
    want_idx, want_centers = _naive_dpc_knn(x, K, 5, noise)
    np.testing.assert_array_equal(np.sort(np.asarray(got_centers), -1), np.sort(want_centers, -1))
    # cluster ids must match after aligning center ordering
    got_centers = np.asarray(got_centers)
    for b in range(B):
        mapping = {ci: np.where(want_centers[b] == c)[0][0] for ci, c in enumerate(got_centers[b])}
        remapped = np.vectorize(mapping.get)(np.asarray(got_idx[b]))
        np.testing.assert_array_equal(remapped, want_idx[b])


def test_dpc_knn_streamed_matches_xla(rng):
    """The streaming Pallas DPC (ops/pallas/dpc_knn.py, interpret mode on
    CPU) must reproduce the XLA path's centers and assignments exactly,
    including tie multiplicity from duplicated (padding-like) tokens."""
    from disentangled_multimodal_learning_tpu.ops.pallas.dpc_knn import (
        dpc_knn_cluster_streamed)

    for B, N, C, K, k in [(2, 300, 32, 6, 5), (1, 512, 16, 4, 3)]:
        x = rng.normal(size=(B, N, C)).astype(np.float32)
        noise = rng.uniform(size=(B, N)).astype(np.float32)
        i1, d1 = dpc_knn_cluster(jnp.asarray(x), K, k=k,
                                 density_noise=jnp.asarray(noise),
                                 use_kernel=False)
        i2, d2 = dpc_knn_cluster_streamed(jnp.asarray(x), K, k=k,
                                          density_noise=jnp.asarray(noise),
                                          interpret=True)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    # duplicate-token stress: half the bag is one repeated vector and one
    # extra duplicated pair — exact distance ties everywhere
    x = rng.normal(size=(2, 280, 16)).astype(np.float32)
    x[:, 140:, :] = 0.25
    x[:, 10, :] = x[:, 11, :]
    noise = rng.uniform(size=(2, 280)).astype(np.float32)
    i1, d1 = dpc_knn_cluster(jnp.asarray(x), 5, k=5,
                             density_noise=jnp.asarray(noise),
                             use_kernel=False)
    i2, d2 = dpc_knn_cluster_streamed(jnp.asarray(x), 5, k=5,
                                      density_noise=jnp.asarray(noise),
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_merge_tokens_weighted_mean(rng):
    B, N, C, K = 2, 10, 4, 2
    x = rng.normal(size=(B, N, C)).astype(np.float32)
    idx = rng.integers(0, K, size=(B, N)).astype(np.int32)
    w = rng.uniform(0.1, 2.0, size=(B, N, 1)).astype(np.float32)
    got = np.asarray(merge_tokens(jnp.asarray(x), jnp.asarray(idx), K, jnp.asarray(w)))
    want = np.zeros((B, K, C), dtype=np.float64)
    for b in range(B):
        for kk in range(K):
            sel = idx[b] == kk
            tot = w[b, sel, 0].sum() + 1e-6
            want[b, kk] = (x[b, sel] * (w[b, sel] / tot)).sum(0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_merge_tokens_is_differentiable():
    B, N, C, K = 1, 6, 3, 2
    x = jnp.arange(B * N * C, dtype=jnp.float32).reshape(B, N, C)
    idx = jnp.asarray(np.array([[0, 1, 0, 1, 0, 1]], dtype=np.int32))

    def f(x):
        return merge_tokens(x, idx, K).sum()

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_grid_sample_matmul_matches_gather(rng):
    from disentangled_multimodal_learning_tpu.ops.grid_sample import (
        grid_sample_1d_matmul, grid_sample_2d_matmul)

    feats = rng.normal(size=(2, 6, 6, 5)).astype(np.float32)
    pts = rng.uniform(-1.2, 1.2, size=(2, 9, 2)).astype(np.float32)
    a = np.asarray(grid_sample_2d(jnp.asarray(feats), jnp.asarray(pts)))
    b = np.asarray(grid_sample_2d_matmul(jnp.asarray(feats), jnp.asarray(pts)))
    np.testing.assert_allclose(a, b, atol=1e-5)
    # gradients agree too
    ga = jax.grad(lambda f, p: grid_sample_2d(f, p).sum(), argnums=(0, 1))(
        jnp.asarray(feats), jnp.asarray(pts))
    gb = jax.grad(lambda f, p: grid_sample_2d_matmul(f, p).sum(), argnums=(0, 1))(
        jnp.asarray(feats), jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gb[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gb[1]), atol=1e-4)

    f1 = rng.normal(size=(2, 7, 4)).astype(np.float32)
    v1 = rng.uniform(-1.1, 1.1, size=(2, 5)).astype(np.float32)
    a1 = np.asarray(grid_sample_1d(jnp.asarray(f1), jnp.asarray(v1)))
    b1 = np.asarray(grid_sample_1d_matmul(jnp.asarray(f1), jnp.asarray(v1)))
    np.testing.assert_allclose(a1, b1, atol=1e-5)


def test_grid_sample_factored_matches_gather(rng):
    """The separable two-matmul formulation == the gather reference, values
    AND grads, including out-of-bounds points (zeros padding) and leading
    batch dims (the [B, G] group axis the attention passes)."""
    from disentangled_multimodal_learning_tpu.ops.grid_sample import (
        grid_sample_2d_factored)

    feats = rng.normal(size=(2, 6, 6, 5)).astype(np.float32)
    pts = rng.uniform(-1.2, 1.2, size=(2, 9, 2)).astype(np.float32)
    a = np.asarray(grid_sample_2d(jnp.asarray(feats), jnp.asarray(pts)))
    b = np.asarray(grid_sample_2d_factored(jnp.asarray(feats),
                                           jnp.asarray(pts)))
    np.testing.assert_allclose(a, b, atol=1e-5)
    ga = jax.grad(lambda f, p: grid_sample_2d(f, p).sum(), argnums=(0, 1))(
        jnp.asarray(feats), jnp.asarray(pts))
    gb = jax.grad(lambda f, p: grid_sample_2d_factored(f, p).sum(),
                  argnums=(0, 1))(jnp.asarray(feats), jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gb[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gb[1]),
                               atol=1e-4)

    # leading [B, G] dims
    fg = rng.normal(size=(2, 3, 5, 5, 4)).astype(np.float32)
    pg = rng.uniform(-1.1, 1.1, size=(2, 3, 7, 2)).astype(np.float32)
    from disentangled_multimodal_learning_tpu.ops.grid_sample import (
        grid_sample_2d_matmul)
    a2 = np.asarray(grid_sample_2d_matmul(jnp.asarray(fg), jnp.asarray(pg)))
    b2 = np.asarray(grid_sample_2d_factored(jnp.asarray(fg),
                                            jnp.asarray(pg)))
    np.testing.assert_allclose(a2, b2, atol=1e-5)
