"""Model factory: mode string -> flax module (reference define_net,
models/model.py:51-104).  ``distillation`` returns (student, teacher) like the
reference (models/model.py:97-101)."""

from __future__ import annotations

from .cmta import CMTA
from .deform_mil import DeformPathomicNet
from .maxnet import MaxNet
from .mcat import MCAT_Surv
from .mil import ABMIL, TransMIL
from .pathomic import (
    PathomicNet,
    PathomicNet_Ensemble,
    PathomicNet_FG,
    PathomicNet_Original,
)
from .teacher_student import MultiScaleNet, StudentsNet, TeachersNet


def define_net(args):
    """args: Config (or any namespace with the reference YAML fields)."""
    from . import deform_attention as _da

    _da.CPB_REMAT = bool(getattr(args, "remat", True))
    # table-interpolated CPB (approximate; 0 = exact).  Module-level knob:
    # the deformable attentions are built deep inside the model classes.
    _da.CPB_TABLE_DIVISOR = int(getattr(args, "cpb_table_divisor", 0))
    _da.FUSED_TABLE_ATTENTION = bool(
        getattr(args, "fused_table_attention", False))
    _da.ATTN_BF16_STREAMS = bool(getattr(args, "attn_bf16_streams", False))
    from ..ops.pallas import deform_attn as _pda

    _pda.TBL_BF16_OUT = bool(getattr(args, "cpb_table_bf16", False))
    mode = args.mode
    common = dict(label_dim=args.label_dim)
    if mode == "path":
        return ABMIL(path_dim=args.path_dim, **common)
    if mode == "transmil":
        seq_mesh = None
        if getattr(args, "seq_shard_devices", 0):
            from ..parallel.seq_shard import make_dp_seq_mesh, make_seq_mesh
            dp = getattr(args, "seq_shard_dp", 0)
            seq_mesh = (make_dp_seq_mesh(dp, args.seq_shard_devices) if dp
                        else make_seq_mesh(args.seq_shard_devices))
        return TransMIL(path_dim=args.path_dim, seq_mesh=seq_mesh, **common)
    if mode == "omic":
        return MaxNet(input_dim=args.input_size_omic, omic_dim=args.omic_dim,
                      dropout_rate=args.dropout_rate, label_dim=args.label_dim,
                      init_max=args.init_type == "max")
    if mode == "pathomic":
        return PathomicNet(input_size_omic=args.input_size_omic,
                           path_dim=args.path_dim, omic_dim=args.omic_dim,
                           mmhid=args.mmhid, dropout_rate=args.dropout_rate,
                           fusion_type=args.fusion_type, skip=args.skip,
                           use_bilinear=args.use_bilinear, path_gate=args.path_gate,
                           omic_gate=args.omic_gate, path_scale=args.path_scale,
                           omic_scale=args.omic_scale, **common)
    if mode == "pathomic_original":
        return PathomicNet_Original(input_size_omic=args.input_size_omic,
                                    path_dim=args.path_dim, omic_dim=args.omic_dim,
                                    mmhid=args.mmhid, dropout_rate=args.dropout_rate,
                                    fusion_type=args.fusion_type, skip=args.skip,
                                    use_bilinear=args.use_bilinear, **common)
    if mode == "mcat":
        return MCAT_Surv(**common)
    if mode == "cmta":
        return CMTA(**common)
    if mode == "pathomic_fg":
        return PathomicNet_FG(input_size_omic=args.input_size_omic,
                              path_dim=args.path_dim, omic_dim=args.omic_dim,
                              mmhid=args.mmhid, dropout_rate=args.dropout_rate, **common)
    if mode == "pathomic_ensemble":
        return PathomicNet_Ensemble(input_size_omic=args.input_size_omic,
                                    path_dim=args.path_dim, omic_dim=args.omic_dim,
                                    mmhid=args.mmhid, dropout_rate=args.dropout_rate,
                                    **common)
    if mode == "deformpathomic":
        return DeformPathomicNet(
            input_size_omic_tumor=args.input_size_omic_tumor,
            input_size_omic_immune=args.input_size_omic_immune,
            path_dim=args.path_dim, omic_dim=args.omic_dim, mmhid=args.mmhid,
            dropout_rate=args.dropout_rate, attn_dim=args.attn_dim,
            return_vgrid=args.return_vgrid, fusion_type=args.fusion_type,
            task_type=args.task_type,
            degenerate_1d_sampling=getattr(args, "degenerate_1d_sampling",
                                           False), **common)
    # scale-branch parallelism stacks the two magnification branches so a
    # 'scale' mesh axis can shard them (parallel/branch_shard.py)
    stacked = getattr(args, "branch_devices", 0) > 1
    if mode == "multiscale":
        return MultiScaleNet(
            input_size_omic_tumor=args.input_size_omic_tumor,
            input_size_omic_immune=args.input_size_omic_immune,
            path_dim=args.path_dim, omic_dim=args.omic_dim, mmhid=args.mmhid,
            dropout_rate=args.dropout_rate, sample_ratio=args.path_cluster_num,
            combination_type=args.combination_type_teas,
            stacked_scales=stacked, **common)
    if mode in ("teacher", "uniteacher"):
        return TeachersNet(
            input_size_omic_tumor=args.input_size_omic_tumor,
            input_size_omic_immune=args.input_size_omic_immune,
            path_dim=args.path_dim, omic_dim=args.omic_dim,
            dropout_rate=args.dropout_rate,
            combination_type=args.combination_type_teas,
            unimodal=mode == "uniteacher", stacked_scales=stacked, **common)
    if mode == "student":
        return StudentsNet(path_dim=args.path_dim,
                           sample_ratio=args.path_cluster_num,
                           combination_type=args.combination_type_stus,
                           stacked_scales=stacked, **common)
    if mode == "distillation":
        student = StudentsNet(path_dim=args.path_dim,
                              sample_ratio=args.path_cluster_num,
                              combination_type=args.combination_type_stus, **common)
        teacher = TeachersNet(
            input_size_omic_tumor=args.input_size_omic_tumor,
            input_size_omic_immune=args.input_size_omic_immune,
            path_dim=args.path_dim, omic_dim=args.omic_dim,
            dropout_rate=args.dropout_rate,
            combination_type=args.combination_type_teas, **common)
        return student, teacher
    raise NotImplementedError(f"model [{mode}] is not implemented")


def model_inputs(mode: str, batch, train: bool = True) -> dict:
    """Map a contract Batch to the model's __call__ kwargs
    (call-site shapes from reference train_test.py:56,377,590,824)."""
    import jax.numpy as jnp

    b = batch
    to = jnp.asarray
    if mode in ("teacher", "uniteacher", "multiscale"):
        return dict(x_path10=to(b.x_path10), x_path20=to(b.x_path20),
                    x_omic_tumor=to(b.x_omic_tumor), x_omic_immune=to(b.x_omic_immune))
    if mode in ("student",):
        return dict(x_path10=to(b.x_path10), x_path20=to(b.x_path20))
    if mode == "deformpathomic":
        return dict(x_path=to(b.x_path10), x_omic=to(b.x_omic),
                    x_omic_tumor=to(b.x_omic_tumor), x_omic_immune=to(b.x_omic_immune))
    if mode in ("pathomic", "pathomic_original", "mcat", "cmta"):
        return dict(x_path=to(b.x_path10), x_omic=to(b.x_omic))
    if mode in ("pathomic_fg", "pathomic_ensemble"):
        return dict(x_path=to(b.x_path10), x_omic=to(b.x_omic), is_training=train)
    if mode in ("path", "transmil"):
        return dict(x=to(b.x_path10))
    if mode == "omic":
        return dict(x_omic=to(b.x_omic))
    raise NotImplementedError(mode)


def define_act_layer(act_type: str = "Tanh"):
    """Activation factory (reference models/model.py:146-159) as a callable."""
    import jax
    import jax.numpy as jnp

    table = {
        "Tanh": jnp.tanh,
        "ReLU": jax.nn.relu,
        "Sigmoid": jax.nn.sigmoid,
        "LSM": lambda x: jax.nn.log_softmax(x, axis=1),
        "none": None,
    }
    if act_type not in table:
        raise NotImplementedError(f"activation layer [{act_type}] is not found")
    return table[act_type]


def define_bifusion(fusion_type: str, skip=1, use_bilinear=1, gate1=1, gate2=1,
                    dim1=32, dim2=32, scale_dim1=1, scale_dim2=1, mmhid=32,
                    dropout_rate=0.25):
    """Gated-bilinear fusion factory (reference models/model.py:162-168)."""
    from .fusion import BilinearFusion

    if fusion_type != "pofusion":
        raise NotImplementedError(f"fusion type [{fusion_type}] is not found")
    return BilinearFusion(skip=skip, use_bilinear=use_bilinear, gate1=gate1,
                          gate2=gate2, dim1=dim1, dim2=dim2,
                          scale_dim1=scale_dim1, scale_dim2=scale_dim2,
                          mmhid=mmhid, dropout_rate=dropout_rate)
