"""Import reference PyTorch checkpoints into this framework's param trees.

The reference saves bare ``model.state_dict()`` files once per fold
(reference train_test.py:325-340).  A lab migrating from the reference to
this framework should not have to retrain: this module converts those
``.pth`` state_dicts into the exact flax param pytrees ``define_net`` +
``model.init`` produce, so a reference-trained model can be evaluated,
fine-tuned or distilled here directly.

The module-name surface is identical by construction (TeachersNet ->
teacher10_net.encoder.attn2d_omic1..., reference models/model.py:795-878 /
models/Modules.py:172-240); what differs is each leaf's LAYOUT:

    torch nn.Linear weight [out, in]          -> flax Dense kernel [in, out]
    torch LayerNorm weight/bias               -> flax scale/bias
    torch packed nn.MultiheadAttention        -> split q/k/v/out_proj Denses
    torch grouped 1x1 Conv2d [out, in/G, 1,1] -> GroupedPointwise [G, ci, co]
    torch depthwise Conv2d [C, 1, k, k]       -> HWIO [k, k, 1, C]
    torch depthwise Conv1d [C, 1, k]          -> HIO  [k, 1, C]
    CPB MLP Linears                           -> raw mlp_*_kernel/bias params

Each transform is the exact inverse of the jax->torch porting the oracle
parity suite uses (tests/test_reference_parity.py:44-83,342-365,587-610),
and the round-trip is tested there against the live reference modules:
an imported reference model produces the reference's outputs.

Entry point:

    params = import_torch_checkpoint("fold_1_....pth", mode="teacher")
    state  = TrainState.create({"params": params}, tx)

Buffers that are not parameters here (``output_range``/``output_shift``
constants, reference models/model.py:509-510) and modules the reference
instantiates but never uses in forward (StudentNet.norm/pooler1,
models/Modules.py:449) are skipped; unknown keys raise unless
``strict=False``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["import_torch_checkpoint"]


def _np(v):
    if hasattr(v, "detach"):  # torch tensor
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


class _SD:
    """state_dict view that strips the DDP ``module.`` prefix and records
    which keys were consumed (for strict-mode accounting)."""

    def __init__(self, sd):
        self.d = {(k[7:] if k.startswith("module.") else k): v
                  for k, v in sd.items()}
        self.used: set = set()

    def __call__(self, key):
        if key not in self.d:
            raise KeyError(
                f"torch checkpoint is missing '{key}' — is the mode right "
                "for this checkpoint?")
        self.used.add(key)
        return _np(self.d[key])

    def has(self, key):
        return key in self.d

    def unused(self):
        return sorted(set(self.d) - self.used)


def _dense(sd: _SD, key: str, bias: bool = True) -> dict:
    p = {"kernel": sd(f"{key}.weight").T}
    if bias:
        p["bias"] = sd(f"{key}.bias")
    return p


def _ln(sd: _SD, key: str) -> dict:
    return {"scale": sd(f"{key}.weight"), "bias": sd(f"{key}.bias")}


def _mha(sd: _SD, key: str) -> dict:
    """torch packed nn.MultiheadAttention -> our {q,k,v,out}_proj Denses
    (models/layers.py:83-124)."""
    w = sd(f"{key}.in_proj_weight")  # [3E, E]
    b = sd(f"{key}.in_proj_bias")
    e = w.shape[1]
    return {
        "q_proj": {"kernel": w[:e].T, "bias": b[:e]},
        "k_proj": {"kernel": w[e:2 * e].T, "bias": b[e:2 * e]},
        "v_proj": {"kernel": w[2 * e:].T, "bias": b[2 * e:]},
        "out_proj": _dense(sd, f"{key}.out_proj"),
    }


def _grouped_pointwise(sd: _SD, key: str, groups: int) -> dict:
    """torch grouped 1x1 Conv2d/Conv1d weight [out, in/G, 1(,1)] ->
    GroupedPointwise kernel [G, ci, co] (models/deform_attention.py:60-80)."""
    w = sd(f"{key}.weight").reshape(
        sd.d[f"{key}.weight"].shape[0], -1)  # [out, in/G]
    out, ci = w.shape
    co = out // groups
    k = np.stack([w[g * co:(g + 1) * co, :].T for g in range(groups)])
    return {"kernel": k.astype(np.float32)}


def _cpb(sd: _SD, key: str) -> dict:
    """SwinV2 CPB MLP (Sequential(Linear,ReLU) x2 + Linear) -> our raw
    mlp_* params (models/deform_attention.py:150-165)."""
    return {
        "mlp_0_kernel": sd(f"{key}.mlp.0.0.weight").T,
        "mlp_0_bias": sd(f"{key}.mlp.0.0.bias"),
        "mlp_1_kernel": sd(f"{key}.mlp.1.0.weight").T,
        "mlp_1_bias": sd(f"{key}.mlp.1.0.bias"),
        "mlp_out_kernel": sd(f"{key}.mlp.2.weight").T,
        "mlp_out_bias": sd(f"{key}.mlp.2.bias"),
    }


def _attn2d(sd: _SD, key: str, groups: int = 8) -> dict:
    """DeformCrossAttention2D (reference models/DeformableAttention2D.py:
    162-342) -> models/deform_attention.py:259-385."""
    dw = sd(f"{key}.to_offsets.0.weight")  # [od, 1, k, k]
    ow = sd(f"{key}.to_offsets.2.weight")  # [2, od, 1, 1]
    return {
        "to_q": _grouped_pointwise(sd, f"{key}.to_q", groups),
        "to_k": _grouped_pointwise(sd, f"{key}.to_k", groups),
        "to_v": _grouped_pointwise(sd, f"{key}.to_v", groups),
        "offset_conv": {"kernel": dw.transpose(2, 3, 1, 0),  # -> HWIO
                        "bias": sd(f"{key}.to_offsets.0.bias")},
        "offset_out": {"kernel": ow[:, :, 0, 0].T},  # -> [od, 2]
        "rel_pos_bias": _cpb(sd, f"{key}.rel_pos_bias"),
        "to_out": {"kernel": sd(f"{key}.to_out.weight")[:, :, 0, 0].T,
                   "bias": sd(f"{key}.to_out.bias")},
    }


def _attn1d(sd: _SD, key: str) -> dict:
    """DeformCrossAttention1D (reference models/DeformableAttention1D.py:
    106-240; ungrouped q/k/v) -> models/deform_attention.py:388-491."""
    dw = sd(f"{key}.to_offsets.0.weight")  # [od, 1, k]
    ow = sd(f"{key}.to_offsets.2.weight")  # [1, od, 1]
    return {
        "to_q": {"kernel": sd(f"{key}.to_q.weight")[:, :, 0].T},
        "to_k": {"kernel": sd(f"{key}.to_k.weight")[:, :, 0].T},
        "to_v": {"kernel": sd(f"{key}.to_v.weight")[:, :, 0].T},
        "offset_conv_kernel": dw.transpose(2, 1, 0),  # -> HIO [k, 1, od]
        "offset_conv_bias": sd(f"{key}.to_offsets.0.bias"),
        "offset_out": {"kernel": ow[:, :, 0].T},  # -> [od, 1]
        "rel_pos_bias": _cpb(sd, f"{key}.rel_pos_bias"),
        "to_out": {"kernel": sd(f"{key}.to_out.weight")[:, :, 0].T,
                   "bias": sd(f"{key}.to_out.bias")},
    }


def _maxnet(sd: _SD, key: str) -> dict:
    """MaxNet SNN omic encoder (reference models/model.py:173-270) ->
    models/maxnet.py (encoder.{i}.0 Sequential Linears -> encoder_{i})."""
    p = {f"encoder_{i}": _dense(sd, f"{key}.encoder.{i}.0") for i in range(4)}
    if sd.has(f"{key}.classifier.0.weight"):
        p["classifier"] = _dense(sd, f"{key}.classifier.0")
    return p


def _transfusion(sd: _SD, key: str) -> dict:
    return {"norm": _ln(sd, f"{key}.norm"),
            "multihead_attn": _mha(sd, f"{key}.multihead_attn"),
            "pooler": {"dense": _dense(sd, f"{key}.pooler.dense")}}


def _teacher_net(sd: _SD, key: str) -> dict:
    """TeacherNet / UniTeacherNet (reference models/Modules.py:355-395 /
    312-352; identical param surface) -> teacher_student.py TeacherNet."""
    enc = f"{key}.encoder"
    return {
        "_fc1": _dense(sd, f"{key}._fc1.0"),
        "encoder": {
            "norm": _ln(sd, f"{enc}.norm"),
            "attn2d_omic1": _attn2d(sd, f"{enc}.attn2d_omic1"),
            "attn2d_omic2": _attn2d(sd, f"{enc}.attn2d_omic2"),
            "fusion_layer": {"fusion_layer":
                             _dense(sd, f"{enc}.fusion_layer.fusion_layer")},
            "transfusion_layer1": _transfusion(sd, f"{enc}.transfusion_layer1"),
            "transfusion_layer2": _transfusion(sd, f"{enc}.transfusion_layer2"),
        },
        "norm": _ln(sd, f"{key}.norm"),
        "pooler1": {"dense": _dense(sd, f"{key}.pooler1.dense")},
        "pooler2": {"dense": _dense(sd, f"{key}.pooler2.dense")},
        "classifier": _dense(sd, f"{key}.classifier"),
    }


def _student_net(sd: _SD, key: str) -> dict:
    """StudentNet (reference models/Modules.py:398-457) ->
    teacher_student.py StudentNet.  The reference's unused norm/pooler1
    members (forward never calls them, Modules.py:449) are dropped."""
    enc = f"{key}.encoder"
    return {
        "_fc1": _dense(sd, f"{key}._fc1.0"),
        "encoder": {
            "norm": _ln(sd, f"{enc}.norm"),
            "attn2d": _attn2d(sd, f"{enc}.attn2d"),
            "cluster_merge": {
                "norm": _ln(sd, f"{enc}.cluster_merge.norm"),
                "score": _dense(sd, f"{enc}.cluster_merge.score"),
            },
        },
        "classifier": _dense(sd, f"{key}.classifier"),
    }


def _deform_mil(sd: _SD, key: str, attn_dim: int) -> dict:
    """DeformCrossTransMIL branch encoder (reference
    models/DeformCrossTransMIL.py:79-161) -> models/deform_mil.py."""
    attn = ("attn2d", _attn2d) if attn_dim == 2 else ("attn1d", _attn1d)
    p = {
        "_fc1": _dense(sd, f"{key}._fc1.0"),
        "fusion_layer": {"fusion_layer":
                         _dense(sd, f"{key}.fusion_layer.fusion_layer")},
        "layer3": {"norm": _ln(sd, f"{key}.layer3.norm"),
                   attn[0]: attn[1](sd, f"{key}.layer3.{attn[0]}")},
        "_fc2": _dense(sd, f"{key}._fc2"),
        "multimodal_projection": _dense(sd, f"{key}.multimodal_projection"),
    }
    if attn_dim == 2:
        p["norm"] = _ln(sd, f"{key}.norm")
        p["pooler"] = {"dense": _dense(sd, f"{key}.pooler.dense")}
    else:  # cls-token path normalizes then takes token 0
        p["norm"] = _ln(sd, f"{key}.norm")
        if sd.has(f"{key}.cls_token"):
            p["cls_token"] = sd(f"{key}.cls_token")
    return p


def _teachers_net(sd: _SD) -> dict:
    """TeachersNet / UniTeachersNet (reference models/model.py:795-878 /
    709-792)."""
    return {
        "omic_net_tumor": _maxnet(sd, "omic_net_tumor"),
        "omic_net_immune": _maxnet(sd, "omic_net_immune"),
        "teacher10_net": _teacher_net(sd, "teacher10_net"),
        "teacher20_net": _teacher_net(sd, "teacher20_net"),
    }


def _students_net(sd: _SD) -> dict:
    """StudentsNet (reference models/model.py:881-964)."""
    return {
        "student10_net": _student_net(sd, "student10_net"),
        "student20_net": _student_net(sd, "student20_net"),
    }


def _teacher_student_net(sd: _SD, key: str) -> dict:
    """TeacherStudentNet (reference models/model.py:571-604)."""
    return {
        "omic_net_tumor": _maxnet(sd, f"{key}.omic_net_tumor"),
        "omic_net_immune": _maxnet(sd, f"{key}.omic_net_immune"),
        "student_net": _student_net(sd, f"{key}.student_net"),
        "teacher_net": _teacher_net(sd, f"{key}.teacher_net"),
    }


def _deformpathomic_net(sd: _SD, attn_dim: int) -> dict:
    """DeformPathomicNet, concat fusion path (reference
    models/model.py:471-568)."""
    return {
        "omic_net_tumor": _maxnet(sd, "omic_net_tumor"),
        "omic_net_immune": _maxnet(sd, "omic_net_immune"),
        "pathomic_net_tumor": _deform_mil(sd, "pathomic_net_tumor", attn_dim),
        "pathomic_net_immune": _deform_mil(sd, "pathomic_net_immune", attn_dim),
        "classifier": _dense(sd, "classifier"),
        "classifier_tumor": _dense(sd, "classifier_tumor.0"),
        "classifier_immune": _dense(sd, "classifier_immune.0"),
    }


# reference buffers / dead members that are correct to leave unconsumed
_IGNORABLE = (
    "output_range", "output_shift",      # constants (model.py:509-510)
    ".num_batches_tracked",              # BN bookkeeping
    "norm.weight", "norm.bias",          # StudentNet's unused norm
    "pooler1.dense",                     # StudentNet's unused pooler1
    "cls_token",                         # unused cls tokens
    "fusion.fusion_layer",               # MultiScaleNet's dead FusionNet
                                         # (model.py:619, never in forward)
)


def import_torch_checkpoint(source, mode: str, attn_dim: int = 2,
                            template=None, strict: bool = True) -> dict:
    """Convert a reference torch checkpoint into this framework's params.

    source: path to a ``.pth`` file (``torch.save(model.state_dict())``,
    reference train_test.py:327-331) or an already-loaded state_dict.
    mode: 'teacher' | 'uniteacher' | 'student' | 'deformpathomic' |
    'multiscale' (for 'distillation', import the student and teacher
    checkpoints separately, as the reference loads them, main.py:369-385).
    template: optional params pytree from ``model.init`` — when given, the
    imported tree must match its leaf paths and shapes exactly.
    strict: fail on unconsumed non-ignorable checkpoint keys.
    """
    if isinstance(source, (str, bytes)) or hasattr(source, "__fspath__"):
        import torch

        source = torch.load(source, map_location="cpu")
    if hasattr(source, "state_dict"):
        source = source.state_dict()
    sd = _SD(source)
    # the reference's DeformCrossTransLayer instantiates BOTH attention
    # variants and uses only args.attn_dim's (models/DeformCrossTransMIL.py:
    # 28-77) — the other's weights legitimately stay unconsumed
    ignorable = _IGNORABLE + (
        (".attn1d.",) if attn_dim == 2 else (".attn2d.",))

    if mode in ("teacher", "uniteacher"):
        params = _teachers_net(sd)
    elif mode == "student":
        params = _students_net(sd)
    elif mode == "deformpathomic":
        params = _deformpathomic_net(sd, attn_dim)
    elif mode == "multiscale":
        params = {"scale10_net": _teacher_student_net(sd, "scale10_net"),
                  "scale20_net": _teacher_student_net(sd, "scale20_net")}
    else:
        raise ValueError(f"unsupported mode for torch import: {mode!r}")

    leftovers = [k for k in sd.unused()
                 if not any(tag in k for tag in ignorable)]
    if strict and leftovers:
        raise ValueError(
            f"{len(leftovers)} torch keys were not consumed (wrong mode or "
            f"architecture mismatch): {leftovers[:8]}...")

    if template is not None:
        import jax

        want = {jax.tree_util.keystr(p): l.shape for p, l in
                jax.tree_util.tree_leaves_with_path(template)}
        got = {jax.tree_util.keystr(p): l.shape for p, l in
               jax.tree_util.tree_leaves_with_path(params)}
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        bad = [k for k in set(want) & set(got) if want[k] != got[k]]
        if missing or extra or bad:
            raise ValueError(
                "imported tree does not match the model template: "
                f"missing={missing[:5]} extra={extra[:5]} "
                f"shape-mismatch={[(k, got[k], want[k]) for k in bad[:5]]}")
    return params
