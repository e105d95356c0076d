"""Torch-checkpoint migration: import a live reference model's state_dict
and verify our model reproduces the reference's outputs exactly.

This is the inverse direction of tests/test_reference_parity.py (which
ports OUR params into the reference oracle): here the reference's randomly
initialized torch modules are the source of truth and
``import_torch_checkpoint`` must land every weight in the right leaf with
the right layout."""

import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from test_reference_parity import _load_ref_model_py  # noqa: F401 (oracle loader)

from disentangled_multimodal_learning_tpu.utils.torch_import import (
    import_torch_checkpoint)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def _ref_args(**over):
    import argparse

    base = dict(path_dim=128, label_dim=4, attn_dim=2, path_cluster_num=0.0008,
                input_size_omic_tumor=59, input_size_omic_immune=361,
                omic_dim=128, mmhid=128, dropout_rate=0.25, return_grad=False,
                init_type="max", combination_type_teas="max_confidence",
                combination_type_stus="max_confidence", return_vgrid=True,
                fusion_type="concat")
    base.update(over)
    return argparse.Namespace(**base)


def test_import_teachers_checkpoint_reproduces_reference(rng):
    """reference TeachersNet state_dict -> our params: identical six output
    dicts on the same inputs (the true migration path for a lab's trained
    fold checkpoints, reference train_test.py:325-340)."""
    mod = _load_ref_model_py()
    ref = mod.TeachersNet(_ref_args())
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
    template = ours.init({"params": jax.random.PRNGKey(0)},
                         jnp.asarray(x10), jnp.asarray(x20), jnp.asarray(xt),
                         jnp.asarray(xi), deterministic=True)["params"]

    params = import_torch_checkpoint(ref.state_dict(), mode="teacher",
                                     template=template)

    out_j = ours.apply({"params": params}, jnp.asarray(x10), jnp.asarray(x20),
                       jnp.asarray(xt), jnp.asarray(xi), deterministic=True)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x10), torch.from_numpy(x20),
                    torch.from_numpy(xt), torch.from_numpy(xi))
    for dn, dj, dt in zip(["feature", "att", "logits", "hazards", "S", "risk"],
                          out_j, out_t):
        assert set(dj.keys()) == set(dt.keys())
        for k in dj:
            np.testing.assert_allclose(
                np.asarray(dj[k]), dt[k].numpy(), atol=1e-3, rtol=1e-2,
                err_msg=f"imported TeachersNet {dn}[{k}]")


def test_import_students_checkpoint_reproduces_reference(rng):
    """reference StudentsNet state_dict -> our params, with the DPC-KNN
    density tie-break noise pinned on both sides."""
    mod = _load_ref_model_py()
    ref = mod.StudentsNet(_ref_args(path_cluster_num=2 / 256))
    ref.eval()

    from disentangled_multimodal_learning_tpu.models.teacher_student import (
        StudentsNet)

    ours = StudentsNet(label_dim=4, path_dim=128, sample_ratio=2 / 256,
                       combination_type="max_confidence")
    B, N = 2, 256
    x10 = rng.normal(size=(B, N, 1024)).astype(np.float32)
    x20 = rng.normal(size=(B, N, 1024)).astype(np.float32)
    template = ours.init({"params": jax.random.PRNGKey(0)},
                         jnp.asarray(x10), jnp.asarray(x20),
                         deterministic=True)["params"]

    params = import_torch_checkpoint(ref.state_dict(), mode="student",
                                     template=template)

    # pin the cluster tie-break noise (ours: PRNGKey(0) in deterministic
    # mode; reference: torch.rand) — same trick as the parity suite
    noise = np.asarray(jax.random.uniform(jax.random.PRNGKey(0), (B, N)))
    orig_rand = torch.rand
    torch.rand = lambda *a, **k: torch.from_numpy(noise.astype(np.float32))
    try:
        with torch.no_grad():
            out_t = ref(torch.from_numpy(x10), torch.from_numpy(x20))
    finally:
        torch.rand = orig_rand
    out_j = ours.apply({"params": params}, jnp.asarray(x10), jnp.asarray(x20),
                       deterministic=True)
    for dn, dj, dt in zip(["feature", "att", "logits", "hazards", "S", "risk"],
                          out_j, out_t):
        assert set(dj.keys()) == set(dt.keys())
        for k in dj:
            np.testing.assert_allclose(
                np.asarray(dj[k]), dt[k].numpy(), atol=1e-3, rtol=1e-2,
                err_msg=f"imported StudentsNet {dn}[{k}]")


def test_import_deformpathomic_checkpoint_matches_template(rng):
    """reference DeformPathomicNet state_dict -> our params tree (template
    structure + per-branch forward equivalence via DeformCrossTransMIL;
    the reference's full forward is exercised branch-by-branch because its
    attn_dim=2 non-vgrid path crashes in the snapshot,
    models/DeformCrossTransMIL.py:71-72)."""
    mod = _load_ref_model_py()
    ref = mod.DeformPathomicNet(_ref_args())
    ref.eval()

    from disentangled_multimodal_learning_tpu.models.deform_mil import (
        DeformPathomicNet)

    ours = DeformPathomicNet(label_dim=4, input_size_omic_tumor=59,
                             input_size_omic_immune=361, path_dim=128,
                             omic_dim=128, mmhid=128, return_vgrid=True)
    B, N = 2, 256
    path = rng.normal(size=(B, N, 1024)).astype(np.float32)
    xo = rng.normal(size=(B, 431)).astype(np.float32)
    xt = rng.normal(size=(B, 59)).astype(np.float32)
    xi = rng.normal(size=(B, 361)).astype(np.float32)
    template = ours.init({"params": jax.random.PRNGKey(0)},
                         jnp.asarray(path), jnp.asarray(xo), jnp.asarray(xt),
                         jnp.asarray(xi), deterministic=True)["params"]

    params = import_torch_checkpoint(ref.state_dict(), mode="deformpathomic",
                                     template=template)

    # branch oracle: tumor branch forward through the reference vs ours
    from disentangled_multimodal_learning_tpu.models.maxnet import MaxNet

    omic_j = MaxNet(59, 128, dropout_rate=0.25, label_dim=4).apply(
        {"params": params["omic_net_tumor"]}, jnp.asarray(xt),
        deterministic=True)[0]
    with torch.no_grad():
        omic_t = ref.omic_net_tumor(x_omic=torch.from_numpy(xt))[0]
    np.testing.assert_allclose(np.asarray(omic_j), omic_t.numpy(),
                               atol=1e-4, rtol=1e-3)

    from disentangled_multimodal_learning_tpu.models.deform_mil import (
        DeformCrossTransMIL)

    mil = DeformCrossTransMIL(label_dim=4, path_dim=128, attn_dim=2,
                              return_vgrid=True)
    out_j = mil.apply({"params": params["pathomic_net_tumor"]},
                      jnp.asarray(path), omic_j, deterministic=True)
    with torch.no_grad():
        out_t = ref.pathomic_net_tumor(path=torch.from_numpy(path),
                                       omic=omic_t)
    np.testing.assert_allclose(np.asarray(out_j[0]), out_t[0].numpy(),
                               atol=1e-3, rtol=1e-2, err_msg="branch encoded")
    np.testing.assert_allclose(np.asarray(out_j[1]), out_t[1].numpy(),
                               atol=1e-3, rtol=1e-2, err_msg="branch logits")


def test_import_multiscale_checkpoint_matches_template(rng):
    """reference MultiScaleNet state_dict -> our params tree; the dead
    cls_token/FusionNet members (model.py:617-619, never in forward) are
    skipped and everything else must land."""
    mod = _load_ref_model_py()
    ref = mod.MultiScaleNet(_ref_args(path_cluster_num=2 / 256))
    ref.eval()

    from disentangled_multimodal_learning_tpu.models.teacher_student import (
        MultiScaleNet)

    ours = MultiScaleNet(label_dim=4, input_size_omic_tumor=59,
                         input_size_omic_immune=361, path_dim=128,
                         omic_dim=128, dropout_rate=0.25,
                         sample_ratio=2 / 256)
    B, N = 1, 256
    x10 = rng.normal(size=(B, N, 1024)).astype(np.float32)
    x20 = rng.normal(size=(B, N, 1024)).astype(np.float32)
    xt = rng.normal(size=(B, 59)).astype(np.float32)
    xi = rng.normal(size=(B, 361)).astype(np.float32)
    template = ours.init({"params": jax.random.PRNGKey(0)},
                         jnp.asarray(x10), jnp.asarray(x20), jnp.asarray(xt),
                         jnp.asarray(xi), deterministic=True)["params"]

    params = import_torch_checkpoint(ref.state_dict(), mode="multiscale",
                                     template=template)
    # structure validated by template=; sanity: a forward runs and is finite
    out = ours.apply({"params": params}, jnp.asarray(x10), jnp.asarray(x20),
                     jnp.asarray(xt), jnp.asarray(xi), deterministic=True)
    assert np.isfinite(np.asarray(out[2]["logits_stus"])).all()


def test_import_wrong_mode_raises(rng):
    mod = _load_ref_model_py()
    ref = mod.StudentsNet(_ref_args(path_cluster_num=2 / 256))
    with pytest.raises(KeyError):
        import_torch_checkpoint(ref.state_dict(), mode="teacher")


def test_import_strict_flags_unconsumed(rng):
    mod = _load_ref_model_py()
    ref = mod.TeachersNet(_ref_args())
    sd = dict(ref.state_dict())
    sd["rogue.extra.weight"] = torch.zeros(3, 3)
    with pytest.raises(ValueError, match="not consumed"):
        import_torch_checkpoint(sd, mode="teacher")
    import_torch_checkpoint(sd, mode="teacher", strict=False)  # tolerated


def test_import_cli_roundtrip(tmp_path, monkeypatch, rng):
    """tools/import_torch_ckpt.py: reference .pth -> framework checkpoint
    that restore_state loads with the imported weights intact."""
    mod = _load_ref_model_py()
    ref = mod.TeachersNet(_ref_args())
    pth = tmp_path / "ref_teacher.pth"
    torch.save(ref.state_dict(), str(pth))

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import import_torch_ckpt as tool

    monkeypatch.setattr(sys, "argv", [
        "import_torch_ckpt.py", str(pth),
        "--config", os.path.join(os.path.dirname(__file__), "..",
                                 "config", "config_synthetic_smoke.yaml"),
        "--out", str(tmp_path), "--name", "teacher_imported"])
    tool.main()

    out = tmp_path / "teacher_imported.ckpt"
    assert out.exists()

    from disentangled_multimodal_learning_tpu.config import load_config
    from disentangled_multimodal_learning_tpu.data import (BagLoader,
                                                           SyntheticBagDataset)
    from disentangled_multimodal_learning_tpu.models.factory import define_net
    from disentangled_multimodal_learning_tpu.train.optim import make_optimizer
    from disentangled_multimodal_learning_tpu.train.trainers import (
        init_model_state)
    from disentangled_multimodal_learning_tpu.utils.checkpoint import (
        restore_state)

    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "config", "config_synthetic_smoke.yaml"))
    cfg.validate()
    model = define_net(cfg)
    ds = SyntheticBagDataset(size=1, fixdim=cfg.fixdim,
                             label_dim=cfg.label_dim, seed=0, args=cfg)
    sample = next(iter(BagLoader(ds, 1, shuffle=False)))
    state = init_model_state(model, cfg, sample, make_optimizer(cfg, 1))
    state = restore_state(state, str(out))

    want = ref.state_dict()["teacher10_net.classifier.weight"].numpy().T
    got = np.asarray(state.params["teacher10_net"]["classifier"]["kernel"])
    np.testing.assert_allclose(got, want, atol=0, rtol=0)


def test_inference_cli_accepts_reference_pth(tmp_path, monkeypatch, rng):
    """inference.py auto-detects a reference .pth checkpoint and imports it
    (the zero-retraining migration path, end to end through the eval CLI)."""
    mod = _load_ref_model_py()
    ref = mod.TeachersNet(_ref_args())
    pth = tmp_path / "fold_1_ref.pth"
    torch.save(ref.state_dict(), str(pth))

    import inference
    from disentangled_multimodal_learning_tpu.config import load_config

    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "config", "config_synthetic_smoke.yaml"))
    cfg.eval_during_training = False
    cfg.save4visualization = False
    cfg.synthetic_test_size = 8
    cfg.validate()
    metrics = inference.main(0, cfg, checkpoint=str(pth))
    assert np.isfinite(metrics["auc"])


# ------------------------------------------------- export (ours -> torch)

def test_export_teachers_reproduces_in_reference(rng):
    """export_torch_state_dict: OUR trained weights loaded into the live
    reference TeachersNet (strict=False: only its dead members are absent)
    produce OUR outputs — the hand-back path for torch-based tooling."""
    from disentangled_multimodal_learning_tpu.models.teacher_student import (
        TeachersNet)
    from disentangled_multimodal_learning_tpu.utils.torch_export import (
        export_torch_state_dict)

    ours = TeachersNet(label_dim=4, input_size_omic_tumor=59,
                       input_size_omic_immune=361, path_dim=128, omic_dim=128,
                       dropout_rate=0.25, combination_type="max_confidence")
    B, N = 2, 256
    x10 = rng.normal(size=(B, N, 1024)).astype(np.float32)
    x20 = rng.normal(size=(B, N, 1024)).astype(np.float32)
    xt = rng.normal(size=(B, 59)).astype(np.float32)
    xi = rng.normal(size=(B, 361)).astype(np.float32)
    params = ours.init({"params": jax.random.PRNGKey(5)},
                       jnp.asarray(x10), jnp.asarray(x20), jnp.asarray(xt),
                       jnp.asarray(xi), deterministic=True)["params"]

    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
          export_torch_state_dict(params, mode="teacher").items()}
    mod = _load_ref_model_py()
    ref = mod.TeachersNet(_ref_args())
    missing, unexpected = ref.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected  # every exported key must land
    ref.eval()

    out_j = ours.apply({"params": params}, jnp.asarray(x10), jnp.asarray(x20),
                       jnp.asarray(xt), jnp.asarray(xi), deterministic=True)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x10), torch.from_numpy(x20),
                    torch.from_numpy(xt), torch.from_numpy(xi))
    for dn, dj, dt in zip(["feature", "att", "logits", "hazards", "S", "risk"],
                          out_j, out_t):
        for k in dj:
            np.testing.assert_allclose(
                np.asarray(dj[k]), dt[k].numpy(), atol=1e-3, rtol=1e-2,
                err_msg=f"exported TeachersNet {dn}[{k}]")


@pytest.mark.parametrize("mode", ["teacher", "student", "deformpathomic",
                                  "multiscale"])
def test_export_import_roundtrip(mode, rng):
    """export -> import is the identity on every leaf, for every mode."""
    from disentangled_multimodal_learning_tpu.config import Config
    from disentangled_multimodal_learning_tpu.data import (
        BagLoader, SyntheticBagDataset)
    from disentangled_multimodal_learning_tpu.models.factory import define_net
    from disentangled_multimodal_learning_tpu.train.optim import make_optimizer
    from disentangled_multimodal_learning_tpu.train.trainers import (
        init_model_state)
    from disentangled_multimodal_learning_tpu.utils.torch_export import (
        export_torch_state_dict)

    cfg = Config(mode=mode, task_type="diag2021", label_dim=4, fixdim=64,
                 batch_size=2, checkpoints="#", debug=True).validate()
    ds = SyntheticBagDataset(size=2, fixdim=64, label_dim=4, seed=0, args=cfg)
    b = next(iter(BagLoader(ds, 2, shuffle=False)))
    model = define_net(cfg)
    state = init_model_state(model, cfg, b, make_optimizer(cfg, 1))

    sd = export_torch_state_dict(state.params, mode=mode)
    back = import_torch_checkpoint(sd, mode=mode, template=state.params)
    fa = {str(p): l for p, l in
          jax.tree_util.tree_leaves_with_path(state.params)}
    fb = {str(p): l for p, l in jax.tree_util.tree_leaves_with_path(back)}
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]),
                                      err_msg=k)
