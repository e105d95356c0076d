"""Export this framework's param trees as reference-named torch state_dicts.

The inverse of utils/torch_import.py: a model trained HERE can be handed
back to the reference ecosystem (its inference.py, torch-based tooling like
SHAP DeepExplainer, collaborators still on the reference) as the bare
``state_dict`` the reference saves and loads (reference train_test.py:
325-340, main.py:369-385).

Layout transforms are the exact inverses of the import path (tested
round-trip and against the live reference modules in
tests/test_torch_import.py):

    flax Dense kernel [in, out]      -> torch nn.Linear weight [out, in]
    flax scale/bias                  -> torch LayerNorm weight/bias
    split q/k/v/out_proj Denses      -> packed nn.MultiheadAttention
    GroupedPointwise [G, ci, co]     -> grouped 1x1 Conv2d [out, in/G, 1, 1]
    HWIO depthwise [k, k, 1, C]      -> torch Conv2d [C, 1, k, k]
    raw CPB mlp_* params             -> CPB MLP Linears

Members the reference instantiates but never uses in forward (StudentNet's
norm/pooler1, cls tokens, the unused attention variant inside
DeformCrossTransLayer, the output_range/output_shift constants) carry no
parameters here, so the produced state_dict must be loaded with
``load_state_dict(sd, strict=False)`` — the missing keys are exactly the
dead members, and the forward is unaffected (verified against the live
reference modules).
"""

from __future__ import annotations

import numpy as np

__all__ = ["export_torch_state_dict", "save_torch_checkpoint"]


def _np(v):
    return np.asarray(v, dtype=np.float32)


def _dense(p, key, out, bias=True):
    out[f"{key}.weight"] = _np(p["kernel"]).T
    if bias and "bias" in p:
        out[f"{key}.bias"] = _np(p["bias"])


def _ln(p, key, out):
    out[f"{key}.weight"] = _np(p["scale"])
    out[f"{key}.bias"] = _np(p["bias"])


def _mha(p, key, out):
    wq = _np(p["q_proj"]["kernel"]).T
    wk = _np(p["k_proj"]["kernel"]).T
    wv = _np(p["v_proj"]["kernel"]).T
    out[f"{key}.in_proj_weight"] = np.concatenate([wq, wk, wv], 0)
    out[f"{key}.in_proj_bias"] = np.concatenate(
        [_np(p["q_proj"]["bias"]), _np(p["k_proj"]["bias"]),
         _np(p["v_proj"]["bias"])])
    _dense(p["out_proj"], f"{key}.out_proj", out)


def _grouped_pointwise(p, key, out, conv1d=False):
    k = _np(p["kernel"])  # [G, ci, co]
    g, ci, co = k.shape
    w = np.zeros((g * co, ci), np.float32)
    for i in range(g):
        w[i * co:(i + 1) * co] = k[i].T
    out[f"{key}.weight"] = w[:, :, None] if conv1d else w[:, :, None, None]


def _cpb(p, key, out):
    out[f"{key}.mlp.0.0.weight"] = _np(p["mlp_0_kernel"]).T
    out[f"{key}.mlp.0.0.bias"] = _np(p["mlp_0_bias"])
    out[f"{key}.mlp.1.0.weight"] = _np(p["mlp_1_kernel"]).T
    out[f"{key}.mlp.1.0.bias"] = _np(p["mlp_1_bias"])
    out[f"{key}.mlp.2.weight"] = _np(p["mlp_out_kernel"]).T
    out[f"{key}.mlp.2.bias"] = _np(p["mlp_out_bias"])


def _attn2d(p, key, out):
    for name in ("to_q", "to_k", "to_v"):
        _grouped_pointwise(p[name], f"{key}.{name}", out)
    dw = _np(p["offset_conv"]["kernel"])  # HWIO [k, k, 1, C]
    out[f"{key}.to_offsets.0.weight"] = dw.transpose(3, 2, 0, 1)
    out[f"{key}.to_offsets.0.bias"] = _np(p["offset_conv"]["bias"])
    ow = _np(p["offset_out"]["kernel"])  # [od, 2]
    out[f"{key}.to_offsets.2.weight"] = ow.T[:, :, None, None]
    _cpb(p["rel_pos_bias"], f"{key}.rel_pos_bias", out)
    out[f"{key}.to_out.weight"] = _np(p["to_out"]["kernel"]).T[:, :, None, None]
    out[f"{key}.to_out.bias"] = _np(p["to_out"]["bias"])


def _attn1d(p, key, out):
    for name in ("to_q", "to_k", "to_v"):
        out[f"{key}.{name}.weight"] = _np(p[name]["kernel"]).T[:, :, None]
    dw = _np(p["offset_conv_kernel"])  # HIO [k, 1, od]
    out[f"{key}.to_offsets.0.weight"] = dw.transpose(2, 1, 0)
    out[f"{key}.to_offsets.0.bias"] = _np(p["offset_conv_bias"])
    out[f"{key}.to_offsets.2.weight"] = _np(p["offset_out"]["kernel"]).T[:, :, None]
    _cpb(p["rel_pos_bias"], f"{key}.rel_pos_bias", out)
    out[f"{key}.to_out.weight"] = _np(p["to_out"]["kernel"]).T[:, :, None]
    out[f"{key}.to_out.bias"] = _np(p["to_out"]["bias"])


def _maxnet(p, key, out):
    for i in range(4):
        _dense(p[f"encoder_{i}"], f"{key}.encoder.{i}.0", out)
    if "classifier" in p:
        _dense(p["classifier"], f"{key}.classifier.0", out)


def _transfusion(p, key, out):
    _ln(p["norm"], f"{key}.norm", out)
    _mha(p["multihead_attn"], f"{key}.multihead_attn", out)
    _dense(p["pooler"]["dense"], f"{key}.pooler.dense", out)


def _teacher_net(p, key, out):
    _dense(p["_fc1"], f"{key}._fc1.0", out)
    enc = p["encoder"]
    _ln(enc["norm"], f"{key}.encoder.norm", out)
    _attn2d(enc["attn2d_omic1"], f"{key}.encoder.attn2d_omic1", out)
    _attn2d(enc["attn2d_omic2"], f"{key}.encoder.attn2d_omic2", out)
    _dense(enc["fusion_layer"]["fusion_layer"],
           f"{key}.encoder.fusion_layer.fusion_layer", out)
    _transfusion(enc["transfusion_layer1"],
                 f"{key}.encoder.transfusion_layer1", out)
    _transfusion(enc["transfusion_layer2"],
                 f"{key}.encoder.transfusion_layer2", out)
    _ln(p["norm"], f"{key}.norm", out)
    _dense(p["pooler1"]["dense"], f"{key}.pooler1.dense", out)
    _dense(p["pooler2"]["dense"], f"{key}.pooler2.dense", out)
    _dense(p["classifier"], f"{key}.classifier", out)


def _student_net(p, key, out):
    _dense(p["_fc1"], f"{key}._fc1.0", out)
    enc = p["encoder"]
    _ln(enc["norm"], f"{key}.encoder.norm", out)
    _attn2d(enc["attn2d"], f"{key}.encoder.attn2d", out)
    _ln(enc["cluster_merge"]["norm"], f"{key}.encoder.cluster_merge.norm", out)
    _dense(enc["cluster_merge"]["score"],
           f"{key}.encoder.cluster_merge.score", out)
    _dense(p["classifier"], f"{key}.classifier", out)


def _deform_mil(p, key, out, attn_dim):
    _dense(p["_fc1"], f"{key}._fc1.0", out)
    _dense(p["fusion_layer"]["fusion_layer"],
           f"{key}.fusion_layer.fusion_layer", out)
    _ln(p["layer3"]["norm"], f"{key}.layer3.norm", out)
    if attn_dim == 2:
        _attn2d(p["layer3"]["attn2d"], f"{key}.layer3.attn2d", out)
        _dense(p["pooler"]["dense"], f"{key}.pooler.dense", out)
    else:
        _attn1d(p["layer3"]["attn1d"], f"{key}.layer3.attn1d", out)
        if "cls_token" in p:
            out[f"{key}.cls_token"] = _np(p["cls_token"])
    _ln(p["norm"], f"{key}.norm", out)
    _dense(p["_fc2"], f"{key}._fc2", out)
    _dense(p["multimodal_projection"], f"{key}.multimodal_projection", out)


def export_torch_state_dict(params, mode: str, attn_dim: int = 2) -> dict:
    """Our params pytree -> reference-named state_dict (numpy values).

    The stacked branch-parallel layout is accepted and unstacked first
    (parallel/branch_shard.py).  Load into the reference with
    ``load_state_dict(sd, strict=False)`` (see module docstring).
    """
    if any(k in params for k in ("teacher_nets", "student_nets", "scale_nets")):
        from ..parallel.branch_shard import unstack_scale_params

        params = unstack_scale_params(params)

    out: dict = {}
    if mode in ("teacher", "uniteacher"):
        _maxnet(params["omic_net_tumor"], "omic_net_tumor", out)
        _maxnet(params["omic_net_immune"], "omic_net_immune", out)
        _teacher_net(params["teacher10_net"], "teacher10_net", out)
        _teacher_net(params["teacher20_net"], "teacher20_net", out)
    elif mode == "student":
        _student_net(params["student10_net"], "student10_net", out)
        _student_net(params["student20_net"], "student20_net", out)
    elif mode == "deformpathomic":
        _maxnet(params["omic_net_tumor"], "omic_net_tumor", out)
        _maxnet(params["omic_net_immune"], "omic_net_immune", out)
        _deform_mil(params["pathomic_net_tumor"], "pathomic_net_tumor", out,
                    attn_dim)
        _deform_mil(params["pathomic_net_immune"], "pathomic_net_immune", out,
                    attn_dim)
        _dense(params["classifier"], "classifier", out)
        _dense(params["classifier_tumor"], "classifier_tumor.0", out)
        _dense(params["classifier_immune"], "classifier_immune.0", out)
        # reference constants (models/model.py:509-510)
        out["output_range"] = np.asarray([6.0], np.float32)
        out["output_shift"] = np.asarray([-3.0], np.float32)
    elif mode == "multiscale":
        for key in ("scale10_net", "scale20_net"):
            p = params[key]
            _maxnet(p["omic_net_tumor"], f"{key}.omic_net_tumor", out)
            _maxnet(p["omic_net_immune"], f"{key}.omic_net_immune", out)
            _student_net(p["student_net"], f"{key}.student_net", out)
            _teacher_net(p["teacher_net"], f"{key}.teacher_net", out)
    else:
        raise ValueError(f"unsupported mode for torch export: {mode!r}")
    return out


def save_torch_checkpoint(params, mode: str, path: str,
                          attn_dim: int = 2) -> str:
    """Export and ``torch.save`` as the reference's checkpoint format."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_torch_state_dict(params, mode, attn_dim).items()}
    torch.save(sd, path)
    return path
