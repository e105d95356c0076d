"""Flagship-kernel parity against the ACTUAL reference implementation.

The reference repo (mounted read-only at /root/reference) is used purely as a
test oracle: we import its DeformableAttention2D module on torch CPU, port
OUR flax parameters into it, and require output agreement.  This is the
golden-value parity testing SURVEY.md §4 prescribes; no reference code is
copied into this repo.  Skipped when the reference mount is absent.
"""

import importlib.util
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference mount not available")


def _load_ref_module(relpath, name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_attn2d():
    mod = _load_ref_module("models/DeformableAttention2D.py", "ref_deform2d")
    m = mod.DeformCrossAttention2D(
        dim=128, dim_head=64, heads=8, dropout=0.0, downsample_factor=4,
        offset_scale=4, offset_groups=8, offset_kernel_size=6)
    m.eval()
    return m


def _port_params_into_ref(ref, params):
    """Copy our flax DeformCrossAttention2D params into the reference torch
    module (layout mapping documented inline)."""
    G, H, inner, dim, od = 8, 8, 512, 128, 64
    p = params
    with torch.no_grad():
        def t(x):
            return torch.from_numpy(np.asarray(x))

        # grouped 1x1 convs: torch weight [out, in/groups, 1, 1]; ours [g, ci, co]
        for ours, theirs in [("to_q", ref.to_q), ("to_k", ref.to_k),
                             ("to_v", ref.to_v)]:
            k = np.asarray(p[ours]["kernel"])  # [G, ci, co]
            w = np.zeros((inner, dim // G, 1, 1), np.float32)
            ci, co = k.shape[1], k.shape[2]
            for g in range(G):
                # torch rows g*co..(g+1)*co map input block g
                w[g * co:(g + 1) * co, :, 0, 0] = k[g].T
            theirs.weight.copy_(t(w))

        # offset depthwise conv: ours HWIO (k, k, 1, od); torch [od, 1, k, k]
        dk = np.asarray(p["offset_conv"]["kernel"])
        ref.to_offsets[0].weight.copy_(t(dk.transpose(3, 2, 0, 1)))
        ref.to_offsets[0].bias.copy_(t(p["offset_conv"]["bias"]))
        # offset 1x1 conv od->2 no bias: ours Dense [od, 2]; torch [2, od, 1, 1]
        ow = np.asarray(p["offset_out"]["kernel"])
        ref.to_offsets[2].weight.copy_(t(ow.T[:, :, None, None]))

        # CPB MLP: ours raw params mlp_{0,1}_kernel [in, out]; torch Linear [out, in]
        cpb = p["rel_pos_bias"]
        ref.rel_pos_bias.mlp[0][0].weight.copy_(t(np.asarray(cpb["mlp_0_kernel"]).T))
        ref.rel_pos_bias.mlp[0][0].bias.copy_(t(cpb["mlp_0_bias"]))
        ref.rel_pos_bias.mlp[1][0].weight.copy_(t(np.asarray(cpb["mlp_1_kernel"]).T))
        ref.rel_pos_bias.mlp[1][0].bias.copy_(t(cpb["mlp_1_bias"]))
        ref.rel_pos_bias.mlp[2].weight.copy_(t(np.asarray(cpb["mlp_out_kernel"]).T))
        ref.rel_pos_bias.mlp[2].bias.copy_(t(cpb["mlp_out_bias"]))

        # output projection: ours Dense [inner, dim]; torch Conv2d [dim, inner, 1, 1]
        ref.to_out.weight.copy_(t(np.asarray(p["to_out"]["kernel"]).T[:, :, None, None]))
        ref.to_out.bias.copy_(t(p["to_out"]["bias"]))


def test_deform2d_matches_reference_end_to_end(ref_attn2d, rng):
    """Same params, same input: our DeformCrossAttention2D == the reference's
    (out and attention maps), on a 16x16 token grid."""
    from disentangled_multimodal_learning_tpu.models.deform_attention import (
        DeformCrossAttention2D)

    B, N, C = 2, 256, 128
    x1 = rng.normal(size=(B, N, C)).astype(np.float32)
    x2 = rng.normal(size=(B, N, C)).astype(np.float32)

    ours = DeformCrossAttention2D(dim=128, dropout=0.0)
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.asarray(x1), jnp.asarray(x2), deterministic=True)
    out_j, attn_j = ours.apply(variables, jnp.asarray(x1), jnp.asarray(x2),
                               deterministic=True)

    _port_params_into_ref(ref_attn2d, variables["params"])
    with torch.no_grad():
        # reference takes channel-first [B, C, N] (models/Modules.py:206
        # transposes before the call)
        out_t, attn_t = ref_attn2d(torch.from_numpy(x1.transpose(0, 2, 1)),
                                   torch.from_numpy(x2.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy().transpose(0, 2, 1),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(attn_j), attn_t.numpy(),
                               atol=2e-4, rtol=1e-3)


def test_deform2d_vgrid_matches_reference(ref_attn2d, rng):
    from disentangled_multimodal_learning_tpu.models.deform_attention import (
        DeformCrossAttention2D)

    B, N, C = 1, 256, 128
    x1 = rng.normal(size=(B, N, C)).astype(np.float32)
    x2 = rng.normal(size=(B, N, C)).astype(np.float32)
    ours = DeformCrossAttention2D(dim=128, dropout=0.0)
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.asarray(x1), jnp.asarray(x2), deterministic=True)
    _, vgrid_j = ours.apply(variables, jnp.asarray(x1), jnp.asarray(x2),
                            return_vgrid=True, deterministic=True)
    _port_params_into_ref(ref_attn2d, variables["params"])
    with torch.no_grad():
        _, vgrid_t = ref_attn2d(torch.from_numpy(x1.transpose(0, 2, 1)),
                                torch.from_numpy(x2.transpose(0, 2, 1)),
                                return_vgrid=True)
    np.testing.assert_allclose(np.asarray(vgrid_j), vgrid_t.numpy(),
                               atol=2e-4, rtol=1e-3)


def test_deform2d_backward_matches_reference(ref_attn2d, rng):
    """Backward parity (VERDICT r1 #10): gradients of a scalar readout of
    (out, attn) wrt both inputs and representative params match torch
    autograd through the reference module — covering the grid-sample
    backward (our matmul-gather transpose vs torch scatter), the CPB MLP
    backward, and the softmax/einsum chain."""
    from disentangled_multimodal_learning_tpu.models.deform_attention import (
        DeformCrossAttention2D)

    B, N, C = 2, 256, 128
    x1 = rng.normal(size=(B, N, C)).astype(np.float32)
    x2 = rng.normal(size=(B, N, C)).astype(np.float32)
    w_out = rng.normal(size=(B, N, C)).astype(np.float32)

    ours = DeformCrossAttention2D(dim=128, dropout=0.0)
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.asarray(x1), jnp.asarray(x2), deterministic=True)
    _, attn_probe = ours.apply(variables, jnp.asarray(x1), jnp.asarray(x2),
                               deterministic=True)
    w_attn = rng.normal(size=attn_probe.shape).astype(np.float32)

    def loss_fn(params, a, b):
        out, attn = ours.apply({"params": params}, a, b, deterministic=True)
        return (out * w_out).sum() + (attn * jnp.asarray(w_attn)).sum()

    gp, gx1, gx2 = jax.grad(loss_fn, argnums=(0, 1, 2))(
        variables["params"], jnp.asarray(x1), jnp.asarray(x2))

    _port_params_into_ref(ref_attn2d, variables["params"])
    ref_attn2d.zero_grad()
    x1_t = torch.tensor(x1.transpose(0, 2, 1), requires_grad=True)
    x2_t = torch.tensor(x2.transpose(0, 2, 1), requires_grad=True)
    out_t, attn_t = ref_attn2d(x1_t, x2_t)
    # reference out is [B, C, N]
    loss_t = ((out_t * torch.from_numpy(w_out.transpose(0, 2, 1))).sum()
              + (attn_t * torch.from_numpy(w_attn)).sum())
    loss_t.backward()

    np.testing.assert_allclose(np.asarray(gx1),
                               x1_t.grad.numpy().transpose(0, 2, 1),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gx2),
                               x2_t.grad.numpy().transpose(0, 2, 1),
                               atol=1e-3, rtol=1e-3)
    # CPB MLP first-layer kernel: ours [in, out] vs torch Linear [out, in]
    np.testing.assert_allclose(
        np.asarray(gp["rel_pos_bias"]["mlp_0_kernel"]),
        ref_attn2d.rel_pos_bias.mlp[0][0].weight.grad.numpy().T,
        atol=1e-3, rtol=1e-3)
    # grouped to_v conv: torch [inner, dim/G, 1, 1] -> ours [G, ci, co]
    gv_t = ref_attn2d.to_v.weight.grad.numpy()[:, :, 0, 0]
    gv_ours = np.asarray(gp["to_v"]["kernel"])
    G, ci, co = gv_ours.shape
    for g in range(G):
        np.testing.assert_allclose(gv_ours[g],
                                   gv_t[g * co:(g + 1) * co, :].T,
                                   atol=1e-3, rtol=1e-3)


# --------------------------------------------------------------- Nystrom attn
def test_nystrom_matches_reference(rng):
    mod = _load_ref_module("models/NystromAttention.py", "ref_nystrom")
    dim, heads, dh, m = 64, 4, 16, 16
    ref = mod.NystromAttention(dim=dim, dim_head=dh, heads=heads,
                               num_landmarks=m, pinv_iterations=6,
                               residual=True, dropout=0.0)
    ref.eval()

    from disentangled_multimodal_learning_tpu.models.layers import (
        NystromAttention as OursNystrom)

    ours = OursNystrom(dim=dim, dim_head=dh, heads=heads, num_landmarks=m,
                       pinv_iterations=6, residual=True, dropout=0.0)
    B, N = 2, 50  # not a multiple of m -> exercises front padding
    x = rng.normal(size=(B, N, dim)).astype(np.float32)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = variables["params"]

    with torch.no_grad():
        ref.to_qkv.weight.copy_(torch.from_numpy(np.asarray(p["to_qkv"]["kernel"]).T))
        # ours res_conv HWIO (33, 1, 1, h); torch [h, 1, 33, 1]
        rc = np.asarray(p["res_conv"])
        ref.res_conv.weight.copy_(torch.from_numpy(rc.transpose(3, 2, 0, 1)))
        ref.to_out[0].weight.copy_(torch.from_numpy(np.asarray(p["to_out"]["kernel"]).T))
        ref.to_out[0].bias.copy_(torch.from_numpy(np.asarray(p["to_out"]["bias"])))
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-3)


# ------------------------------------------------------------ 1-D deform attn
def test_deform1d_matches_reference(rng):
    mod = _load_ref_module("models/DeformableAttention1D.py", "ref_deform1d")
    ref = mod.DeformCrossAttention1D(dim=128, downsample_factor=4,
                                     offset_scale=2, offset_kernel_size=6,
                                     dropout=0.0)
    ref.eval()

    from disentangled_multimodal_learning_tpu.models.deform_attention import (
        DeformCrossAttention1D)

    # degenerate_sampling=True reproduces the reference's pad-to-2D
    # grid-sample bug bit-exactly (see ops/grid_sample.py)
    ours = DeformCrossAttention1D(dim=128, downsample_factor=4, offset_scale=2,
                                  offset_kernel_size=6, dropout=0.0,
                                  degenerate_sampling=True)
    B, N, C = 2, 64, 128
    x1 = rng.normal(size=(B, N, C)).astype(np.float32)
    x2 = rng.normal(size=(B, N, C)).astype(np.float32)
    variables = ours.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x1),
                          jnp.asarray(x2), deterministic=True)
    p = variables["params"]
    inner, G, od = 512, 4, 128

    with torch.no_grad():
        def t(x):
            return torch.from_numpy(np.ascontiguousarray(np.asarray(x)))

        # ungrouped 1x1 conv1d [out, in, 1] <-> Dense [in, out]
        for ours_name, theirs in [("to_q", ref.to_q), ("to_k", ref.to_k),
                                  ("to_v", ref.to_v)]:
            ref_w = np.asarray(p[ours_name]["kernel"]).T[:, :, None]
            theirs.weight.copy_(t(ref_w))
        # depthwise conv1d: ours HIO (k, 1, od); torch [od, 1, k]
        dk = np.asarray(p["offset_conv_kernel"])
        ref.to_offsets[0].weight.copy_(t(dk.transpose(2, 1, 0)))
        ref.to_offsets[0].bias.copy_(t(p["offset_conv_bias"]))
        ow = np.asarray(p["offset_out"]["kernel"])  # [od, 1]
        ref.to_offsets[2].weight.copy_(t(ow.T[:, :, None]))
        cpb = p["rel_pos_bias"]
        ref.rel_pos_bias.mlp[0][0].weight.copy_(t(np.asarray(cpb["mlp_0_kernel"]).T))
        ref.rel_pos_bias.mlp[0][0].bias.copy_(t(cpb["mlp_0_bias"]))
        ref.rel_pos_bias.mlp[1][0].weight.copy_(t(np.asarray(cpb["mlp_1_kernel"]).T))
        ref.rel_pos_bias.mlp[1][0].bias.copy_(t(cpb["mlp_1_bias"]))
        ref.rel_pos_bias.mlp[2].weight.copy_(t(np.asarray(cpb["mlp_out_kernel"]).T))
        ref.rel_pos_bias.mlp[2].bias.copy_(t(cpb["mlp_out_bias"]))
        ref.to_out.weight.copy_(t(np.asarray(p["to_out"]["kernel"]).T[:, :, None]))
        ref.to_out.bias.copy_(t(p["to_out"]["bias"]))

        want = ref(torch.from_numpy(x1.transpose(0, 2, 1)),
                   torch.from_numpy(x2.transpose(0, 2, 1))).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(x1), jnp.asarray(x2),
                                deterministic=True))
    np.testing.assert_allclose(got, want.transpose(0, 2, 1), atol=5e-4, rtol=5e-3)


# ------------------------------------------------------------------- DPC-KNN
def test_dpc_knn_matches_reference(rng, monkeypatch):
    mod = _load_ref_module("models/ClusterMergeNet.py", "ref_cluster")
    B, N, C, K = 2, 24, 8, 3
    x = rng.normal(size=(B, N, C)).astype(np.float32)
    noise = rng.uniform(size=(B, N)).astype(np.float32)

    # reference adds torch.rand noise internally; pin it to ours
    monkeypatch.setattr(torch, "rand",
                        lambda *a, **k: torch.from_numpy(noise))
    token_dict = {"x": torch.from_numpy(x)}
    idx_ref, _ = mod.cluster_dpc_knn(token_dict, K, k=5)

    from disentangled_multimodal_learning_tpu.ops.cluster import dpc_knn_cluster

    idx_ours, _ = dpc_knn_cluster(jnp.asarray(x), K, k=5,
                                  density_noise=jnp.asarray(noise))
    np.testing.assert_array_equal(np.asarray(idx_ours), idx_ref.numpy())

    # and the weighted merge
    w = rng.uniform(0.5, 1.5, size=(B, N, 1)).astype(np.float32)
    token_dict_full = {"x": torch.from_numpy(x),
                       "idx_token": torch.arange(N)[None].repeat(B, 1),
                       "agg_weight": torch.ones(B, N, 1)}
    out_ref = mod.merge_tokens(token_dict_full, idx_ref, K,
                               torch.from_numpy(w))["x"].numpy()
    from disentangled_multimodal_learning_tpu.ops.cluster import merge_tokens

    out_ours = np.asarray(merge_tokens(jnp.asarray(x), idx_ours, K,
                                       jnp.asarray(w)))
    np.testing.assert_allclose(out_ours, out_ref, atol=1e-5)


# ------------------------------------------------- FULL TeacherNet (flagship)
def _load_ref_modules_pkg():
    """Import the reference models package with a faked nystrom_attention
    (the pip package is absent; the reference vendors an identical copy at
    models/NystromAttention.py which we inject instead)."""
    import types

    if "refmodels.Modules" in sys.modules:
        return sys.modules["refmodels.Modules"]
    nys = _load_ref_module("models/NystromAttention.py", "ref_nystrom_mod")
    fake = types.ModuleType("nystrom_attention")
    fake.NystromAttention = nys.NystromAttention
    sys.modules["nystrom_attention"] = fake
    pkg = types.ModuleType("refmodels")
    pkg.__path__ = [os.path.join(REF, "models")]
    sys.modules["refmodels"] = pkg
    spec = importlib.util.spec_from_file_location(
        "refmodels.Modules", os.path.join(REF, "models/Modules.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refmodels.Modules"] = mod
    spec.loader.exec_module(mod)
    return mod


def _t(x):
    return torch.from_numpy(np.ascontiguousarray(np.asarray(x)))


def _port_ln(ref_ln, p):
    with torch.no_grad():
        ref_ln.weight.copy_(_t(p["scale"]))
        ref_ln.bias.copy_(_t(p["bias"]))


def _port_dense(ref_linear, p):
    with torch.no_grad():
        ref_linear.weight.copy_(_t(np.asarray(p["kernel"]).T))
        if ref_linear.bias is not None:
            ref_linear.bias.copy_(_t(p["bias"]))


def _port_torch_mha(ref_mha, p):
    """our {q,k,v,out}_proj Dense -> torch packed nn.MultiheadAttention."""
    with torch.no_grad():
        wq = np.asarray(p["q_proj"]["kernel"]).T
        wk = np.asarray(p["k_proj"]["kernel"]).T
        wv = np.asarray(p["v_proj"]["kernel"]).T
        ref_mha.in_proj_weight.copy_(_t(np.concatenate([wq, wk, wv], 0)))
        ref_mha.in_proj_bias.copy_(_t(np.concatenate(
            [np.asarray(p["q_proj"]["bias"]), np.asarray(p["k_proj"]["bias"]),
             np.asarray(p["v_proj"]["bias"])])))
        _port_dense(ref_mha.out_proj, p["out_proj"])


def test_full_teacher_net_matches_reference(rng):
    """The flagship single-scale TeacherNet: same weights, same inputs ->
    same (logits, hazards, S, risk, feature1, feature2, att1, att2) as the
    reference (models/Modules.py:355-395)."""
    import argparse

    mod = _load_ref_modules_pkg()
    args = argparse.Namespace(path_dim=128, label_dim=4, attn_dim=2,
                              path_cluster_num=0.0008)
    ref = mod.TeacherNet(args)
    ref.eval()

    from disentangled_multimodal_learning_tpu.models.teacher_student import (
        TeacherNet)

    ours = TeacherNet(label_dim=4, path_dim=128)
    B, N = 2, 256
    path = rng.normal(size=(B, N, 1024)).astype(np.float32)
    omic1 = rng.normal(size=(B, 128)).astype(np.float32)
    omic2 = rng.normal(size=(B, 128)).astype(np.float32)
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.asarray(path), [jnp.asarray(omic1),
                                              jnp.asarray(omic2)],
                          deterministic=True)
    p = variables["params"]

    # ---- port every parameter --------------------------------------------
    _port_dense(ref._fc1[0], p["_fc1"])
    enc = p["encoder"]
    _port_ln(ref.encoder.norm, enc["norm"])
    _port_params_into_ref(ref.encoder.attn2d_omic1, enc["attn2d_omic1"])
    _port_params_into_ref(ref.encoder.attn2d_omic2, enc["attn2d_omic2"])
    _port_dense(ref.encoder.fusion_layer.fusion_layer,
                enc["fusion_layer"]["fusion_layer"])
    for i in (1, 2):
        ref_tf = getattr(ref.encoder, f"transfusion_layer{i}")
        our_tf = enc[f"transfusion_layer{i}"]
        _port_ln(ref_tf.norm, our_tf["norm"])
        _port_torch_mha(ref_tf.multihead_attn, our_tf["multihead_attn"])
        _port_dense(ref_tf.pooler.dense, our_tf["pooler"]["dense"])
    _port_ln(ref.norm, p["norm"])
    _port_dense(ref.pooler1.dense, p["pooler1"]["dense"])
    _port_dense(ref.pooler2.dense, p["pooler2"]["dense"])
    _port_dense(ref.classifier, p["classifier"])

    # ---- compare -----------------------------------------------------------
    out_j = ours.apply(variables, jnp.asarray(path),
                       [jnp.asarray(omic1), jnp.asarray(omic2)],
                       deterministic=True)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(path),
                    omic_list=[torch.from_numpy(omic1),
                               torch.from_numpy(omic2)])
    names = ["logits", "hazards", "S", "risk", "feature1", "feature2",
             "att1", "att2"]
    for n, a, b in zip(names, out_j, out_t):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=5e-4,
                                   rtol=5e-3, err_msg=f"TeacherNet.{n}")


def test_full_student_net_matches_reference(rng):
    """Pathology-only StudentNet with DPC-KNN token merge, end to end
    (reference models/Modules.py:428-457).  The cluster tie-break noise is
    pinned on both sides."""
    import argparse

    mod = _load_ref_modules_pkg()
    args = argparse.Namespace(path_dim=128, label_dim=4, attn_dim=2,
                              path_cluster_num=2 / 256)  # 2 clusters at N=256
    ref = mod.StudentNet(args)
    ref.eval()

    from disentangled_multimodal_learning_tpu.models.teacher_student import (
        StudentNet)

    ours = StudentNet(label_dim=4, path_dim=128, sample_ratio=2 / 256)
    B, N = 2, 256
    path = rng.normal(size=(B, N, 1024)).astype(np.float32)
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.asarray(path), deterministic=True)
    p = variables["params"]

    _port_dense(ref._fc1[0], p["_fc1"])
    enc = p["encoder"]
    _port_ln(ref.encoder.norm, enc["norm"])
    _port_params_into_ref(ref.encoder.attn2d, enc["attn2d"])
    cm = enc["cluster_merge"]
    _port_ln(ref.encoder.cluster_merge.norm, cm["norm"])
    _port_dense(ref.encoder.cluster_merge.score, cm["score"])
    # reference StudentNet defines norm/pooler1 but its forward never uses
    # them (models/Modules.py:449 commented out) — ours omits them entirely
    _port_dense(ref.classifier, p["classifier"])

    # pin density tie-break noise on both sides: ours uses PRNGKey(0) in
    # deterministic mode; give torch the same numbers
    import jax as _jax

    noise = np.asarray(_jax.random.uniform(_jax.random.PRNGKey(0), (B, N)))
    orig_rand = torch.rand
    torch.rand = lambda *a, **k: torch.from_numpy(noise.astype(np.float32))
    try:
        with torch.no_grad():
            out_t = ref(torch.from_numpy(path))
    finally:
        torch.rand = orig_rand
    out_j = ours.apply(variables, jnp.asarray(path), deterministic=True)
    names = ["logits", "hazards", "S", "risk", "feature", "att"]
    for n, a, b in zip(names, out_j, out_t):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=5e-4,
                                   rtol=5e-3, err_msg=f"StudentNet.{n}")


# ----------------------------------------------------- DeformCrossTransMIL
def test_deform_cross_trans_mil_matches_reference(rng):
    """The deformpathomic branch encoder (reference
    models/DeformCrossTransMIL.py:79-161), attn_dim=2 path (the default;
    the attn_dim=1 path hard-codes .cuda() in the reference and cannot run
    on the CPU oracle)."""
    import argparse
    import types

    _load_ref_modules_pkg()  # installs fake nystrom_attention + refmodels pkg
    spec = importlib.util.spec_from_file_location(
        "refmodels.DeformCrossTransMIL",
        os.path.join(REF, "models/DeformCrossTransMIL.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refmodels.DeformCrossTransMIL"] = mod
    spec.loader.exec_module(mod)

    # NOTE: the reference's attn_dim=2 + return_vgrid=False path CRASHES in
    # its snapshot (DeformCrossTransMIL.py:71-72 treats the (out, attn) tuple
    # from DeformCrossAttention2D:342 as a tensor) — another latent reference
    # bug our implementation fixes.  The oracle comparison therefore runs the
    # working return_vgrid=True path.
    args = argparse.Namespace(path_dim=128, attn_dim=2, return_vgrid=True)
    ref = mod.DeformCrossTransMIL(args, n_classes=4)
    ref.eval()

    from disentangled_multimodal_learning_tpu.models.deform_mil import (
        DeformCrossTransMIL)

    ours = DeformCrossTransMIL(label_dim=4, path_dim=128, attn_dim=2,
                               return_vgrid=True)
    B, N = 2, 256
    path = rng.normal(size=(B, N, 1024)).astype(np.float32)
    omic = rng.normal(size=(B, 128)).astype(np.float32)
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.asarray(path), jnp.asarray(omic),
                          deterministic=True)
    p = variables["params"]

    _port_dense(ref._fc1[0], p["_fc1"])
    _port_dense(ref.fusion_layer.fusion_layer,
                p["fusion_layer"]["fusion_layer"])
    _port_ln(ref.layer3.norm, p["layer3"]["norm"])
    _port_params_into_ref(ref.layer3.attn2d, p["layer3"]["attn2d"])
    _port_ln(ref.norm, p["norm"])
    _port_dense(ref.pooler.dense, p["pooler"]["dense"])
    _port_dense(ref._fc2, p["_fc2"])
    _port_dense(ref.multimodal_projection, p["multimodal_projection"])

    out_j = ours.apply(variables, jnp.asarray(path), jnp.asarray(omic),
                       deterministic=True)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(path), torch.from_numpy(omic))
    # returns (encoded, logits, path_grads, omic, vgrid)
    np.testing.assert_allclose(np.asarray(out_j[0]), out_t[0].numpy(),
                               atol=5e-4, rtol=5e-3, err_msg="encoded")
    np.testing.assert_allclose(np.asarray(out_j[1]), out_t[1].numpy(),
                               atol=5e-4, rtol=5e-3, err_msg="logits")
    np.testing.assert_allclose(np.asarray(out_j[4]), out_t[4].numpy(),
                               atol=5e-4, rtol=5e-3, err_msg="vgrid")


# ------------------------------------------- FULL two-scale TeachersNet
def _load_ref_model_py():
    """Import the reference models/model.py with stubs for its absent deps
    (lifelines/sksurv/imblearn/wandb/torchvision + pip nystrom_attention)."""
    import importlib.machinery
    import types

    if "refm.model" in sys.modules:
        return sys.modules["refm.model"]

    def fake(name, **attrs):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    fake("lifelines")
    fake("lifelines.utils", concordance_index=lambda *a, **k: 0.5)
    fake("sksurv")
    fake("sksurv.metrics", concordance_index_censored=lambda *a, **k: (0.5,))
    fake("imblearn")
    fake("imblearn.over_sampling", RandomOverSampler=object)
    fake("imblearn.metrics", sensitivity_score=lambda *a, **k: 0,
         specificity_score=lambda *a, **k: 0)
    fake("wandb")
    fake("torchvision")
    _load_ref_modules_pkg()  # installs fake nystrom_attention
    import types as _t

    pkg_u = _t.ModuleType("utils")
    pkg_u.__path__ = [os.path.join(REF, "utils")]
    sys.modules["utils"] = pkg_u
    pkg = _t.ModuleType("refm")
    pkg.__path__ = [os.path.join(REF, "models")]
    sys.modules["refm"] = pkg
    spec = importlib.util.spec_from_file_location(
        "refm.model", os.path.join(REF, "models/model.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refm.model"] = mod
    spec.loader.exec_module(mod)
    return mod


def _port_maxnet(ref_maxnet, p):
    for i in range(4):
        _port_dense(ref_maxnet.encoder[i][0], p[f"encoder_{i}"])
    _port_dense(ref_maxnet.classifier[0], p["classifier"])


def _port_teacher_net(ref_tn, p):
    _port_dense(ref_tn._fc1[0], p["_fc1"])
    enc = p["encoder"]
    _port_ln(ref_tn.encoder.norm, enc["norm"])
    _port_params_into_ref(ref_tn.encoder.attn2d_omic1, enc["attn2d_omic1"])
    _port_params_into_ref(ref_tn.encoder.attn2d_omic2, enc["attn2d_omic2"])
    _port_dense(ref_tn.encoder.fusion_layer.fusion_layer,
                enc["fusion_layer"]["fusion_layer"])
    for i in (1, 2):
        ref_tf = getattr(ref_tn.encoder, f"transfusion_layer{i}")
        our_tf = enc[f"transfusion_layer{i}"]
        _port_ln(ref_tf.norm, our_tf["norm"])
        _port_torch_mha(ref_tf.multihead_attn, our_tf["multihead_attn"])
        _port_dense(ref_tf.pooler.dense, our_tf["pooler"]["dense"])
    _port_ln(ref_tn.norm, p["norm"])
    _port_dense(ref_tn.pooler1.dense, p["pooler1"]["dense"])
    _port_dense(ref_tn.pooler2.dense, p["pooler2"]["dense"])
    _port_dense(ref_tn.classifier, p["classifier"])


def test_full_teachers_net_two_scale_matches_reference(rng):
    """The COMPLETE flagship: two-scale TeachersNet with both MaxNet omic
    encoders, max_confidence logit combination and the survival chain
    (reference models/model.py:795-878) — same weights, same inputs, same
    six output dicts."""
    import argparse

    mod = _load_ref_model_py()
    args = argparse.Namespace(
        path_dim=128, label_dim=4, attn_dim=2, path_cluster_num=0.0008,
        input_size_omic_tumor=59, input_size_omic_immune=361, omic_dim=128,
        dropout_rate=0.25, return_grad=False, init_type="max",
        combination_type_teas="max_confidence")
    ref = mod.TeachersNet(args)
    ref.eval()

    from disentangled_multimodal_learning_tpu.models.teacher_student import (
        TeachersNet)

    ours = TeachersNet(label_dim=4, input_size_omic_tumor=59,
                       input_size_omic_immune=361, path_dim=128, omic_dim=128,
                       dropout_rate=0.25, combination_type="max_confidence")
    B, N = 2, 256
    x10 = rng.normal(size=(B, N, 1024)).astype(np.float32)
    x20 = rng.normal(size=(B, N, 1024)).astype(np.float32)
    xt = rng.normal(size=(B, 59)).astype(np.float32)
    xi = rng.normal(size=(B, 361)).astype(np.float32)
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.asarray(x10), jnp.asarray(x20),
                          jnp.asarray(xt), jnp.asarray(xi),
                          deterministic=True)
    p = variables["params"]

    _port_maxnet(ref.omic_net_tumor, p["omic_net_tumor"])
    _port_maxnet(ref.omic_net_immune, p["omic_net_immune"])
    _port_teacher_net(ref.teacher10_net, p["teacher10_net"])
    _port_teacher_net(ref.teacher20_net, p["teacher20_net"])

    out_j = ours.apply(variables, jnp.asarray(x10), jnp.asarray(x20),
                       jnp.asarray(xt), jnp.asarray(xi), deterministic=True)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x10), torch.from_numpy(x20),
                    torch.from_numpy(xt), torch.from_numpy(xi))
    dict_names = ["feature", "att", "logits", "hazards", "S", "risk"]
    for dn, dj, dt in zip(dict_names, out_j, out_t):
        assert set(dj.keys()) == set(dt.keys()), (dn, dj.keys(), dt.keys())
        for k in dj:
            np.testing.assert_allclose(
                np.asarray(dj[k]), dt[k].numpy(), atol=1e-3, rtol=1e-2,
                err_msg=f"TeachersNet {dn}[{k}]")
