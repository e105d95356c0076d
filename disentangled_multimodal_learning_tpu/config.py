"""Config system: YAML presets mirrored into typed CLI flags.

Parity with the reference workflow (reference utils/yaml_config_hook.py:5-23 and
main.py:436-442): a YAML file defines every experiment knob; each key is
auto-registered as an argparse flag of the same name and type so the CLI can
override the preset.  Supports the reference's ``defaults:`` include mechanism.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Any

import yaml


def yaml_config_hook(config_file: str) -> dict:
    """Load a YAML config, resolving the nested ``defaults:`` include list.

    Same observable behavior as reference utils/yaml_config_hook.py:5-23:
    each entry of ``defaults`` is a single-item mapping ``{subdir: name}``
    resolved to ``<dir-of-config>/<subdir>/<name>.yaml`` and merged (later
    files win over earlier, the top-level file loses to its includes — the
    reference uses dict.update with the include after the base load).
    """
    with open(config_file) as f:
        cfg = yaml.safe_load(f)
    for d in cfg.get("defaults", []):
        config_dir, cf = dict(d).popitem()
        cf = os.path.join(os.path.dirname(config_file), config_dir, cf + ".yaml")
        with open(cf) as g:
            cfg.update(yaml.safe_load(g))
    cfg.pop("defaults", None)
    return cfg


def _flag_type(v: Any):
    # bool flags: accept "true"/"false"/"1"/"0" on the CLI
    if isinstance(v, bool):
        return lambda s: str(s).lower() in ("1", "true", "yes", "y")
    if v is None:
        return str
    if isinstance(v, (list, tuple)):
        return lambda s: yaml.safe_load(s)
    return type(v)


def build_parser(yaml_config: dict, parser: argparse.ArgumentParser | None = None) -> argparse.ArgumentParser:
    """Mirror every YAML key into an argparse flag (reference main.py:437-439)."""
    parser = parser or argparse.ArgumentParser()
    for k, v in yaml_config.items():
        if k == "debug":
            continue
        parser.add_argument(f"--{k}", default=v, type=_flag_type(v))
    parser.add_argument("--debug", action="store_true",
                        default=bool(yaml_config.get("debug", False)),
                        help="debug mode (disable wandb/logging sinks)")
    return parser


# ---------------------------------------------------------------------------
# Typed experiment config.
# ---------------------------------------------------------------------------

_TASK_LABEL_COLUMN = {
    # label layout (reference train_test.py:54):
    # 0:IDH 1:1p19q 2:CDKN 3:His 4:Grade 5:Diag 6:His_2class 7:Subtype
    # 8:survival_bin 9:censor 10:event 11:survival_time
    "diag2021": 5,
    "grade": 4,
    "subtype": 7,
    "survival": 8,
}

_TASK_LABEL_DIM = {"diag2021": 4, "survival": 4, "grade": 3, "subtype": 3}

# Weighted CE class weights per task (reference train_test.py:27-29).
TASK_CLASS_WEIGHTS = {
    "diag2021": (1.0, 4.15, 2.93, 2.43),
    "grade": (1.47, 1.51, 1.0),
    "subtype": (1.0, 1.72, 2.43),
}


@dataclasses.dataclass
class Config:
    """Flat experiment config. Field names/defaults mirror the reference YAML
    (reference config/config_mine_diag2021.yaml) so presets load unchanged."""

    # dataset
    fixdim: int = 2500
    # bucketed variable-length bags: comma-separated perfect-square
    # bucket sizes (e.g. "400,900,1600,2500"); empty = fixdim behavior
    buckets: str = ""
    label_path: str = "./data"
    dataDir: str = "./data/"
    dataDir_pyramid: str = "./data/"
    pyramid: int = 2
    dataset: str = "TCGA"
    checkpoints: str = "./checkpoints"
    # "pickle" (single portable file) or "orbax" (async-capable TPU-idiomatic
    # directory checkpoints); restore_state reads either transparently
    checkpoint_backend: str = "pickle"
    # > 0: also write a rolling "<mode>_fold_<k>_latest" checkpoint every N
    # epochs; with resume=True a run that died mid-fold restarts from it,
    # skipping the completed epochs (the reference can only save once at the
    # end of training and reload-then-finetune, main.py:153-174)
    save_every_epochs: int = 0
    resume: bool = False
    # > 0: shard the Nystrom token axis of TransMIL over the first N devices
    # (parallel/seq_shard.py) — for single huge bags beyond one chip's HBM
    seq_shard_devices: int = 0
    # > 0: compose data parallelism with sequence sharding on a 2-D
    # (data=seq_shard_dp, seq=seq_shard_devices) mesh — batch rows split
    # over 'data' groups, each group splitting the token axis
    seq_shard_dp: int = 0
    # > 1: tensor parallelism — shard the deformable-attention heads /
    # offset groups over a 'model' mesh axis (parallel/tp_shard.py); the
    # remaining devices form the 'data' axis (dp = device_count // tp)
    tp_devices: int = 0
    # 2: scale-branch parallelism — stack the two magnification branches of
    # the teacher/student/multiscale families and shard them over a 'scale'
    # mesh axis (parallel/branch_shard.py); the remaining devices form the
    # 'data' axis (dp = device_count // 2)
    branch_devices: int = 0
    # 2: pipeline parallelism for mode=distillation — the frozen teacher
    # forward on stage 0, the student fwd+bwd on stage 1, microbatches
    # flowing through a KB-scale ppermute handoff (parallel/pipe_shard.py);
    # the remaining devices form the 'data' axis (dp = device_count // 2)
    pipe_devices: int = 0
    pipe_microbatches: int = 2
    # distillation: cache the frozen teacher's boundary tensors (~1 KB per
    # sample) on device and replay them instead of recomputing the teacher
    # forward every step — the teacher is deterministic so this is exact,
    # and steady-state distillation runs at student-only speed
    # (train/steps.py make_distill_cached_step).  Ignored under
    # pipe_devices (the pipeline already overlaps the teacher).
    distill_teacher_cache: bool = True
    checkpoints_student: str = "#"
    checkpoints_teacher: str = "#"

    # distributed (reference uses nodes/gpus; here they size the data mesh axis)
    nodes: int = 1
    gpus: int = 1
    visiable_device: str = "0"
    nr: int = 0
    dataparallel: int = 0
    workers: int = 0

    # fusion
    fusion_type: str = "concat"
    skip: int = 0
    use_bilinear: int = 1

    # omic dims (overwritten by the dataset like reference main.py:104-106)
    input_size_omic: int = 431
    input_size_omic_tumor: int = 59
    input_size_omic_immune: int = 361

    input_path_dim: int = 1024
    path_gate: int = 1
    omic_gate: int = 1
    path_dim: int = 128
    omic_dim: int = 128
    path_scale: int = 1
    omic_scale: int = 1
    mmhid: int = 128
    cut_fuse_grad: bool = False

    # training
    reload: bool = False
    seed: int = 42
    batch_size: int = 4
    image_size: tuple = (224, 224)
    start_epoch: int = 0
    epochs: int = 10
    lr: float = 2.0e-4
    lr_policy: str = "cosine"
    # lr_policy="plateau" knobs (torch ReduceLROnPlateau defaults the
    # reference uses, models/model.py:133-136)
    plateau_factor: float = 0.2
    plateau_patience: int = 5
    plateau_threshold: float = 0.01
    dropout_rate: float = 0.1
    return_grad: bool = False
    optimizer: str = "adamw"
    weight_decay: float = 0.01
    init_type: str = "max"
    init_gain: float = 0.02
    warmup_epochs: int = 1
    kfold: int = 3

    # loss options
    return_vgrid: bool = False
    gradient_modulate: bool = True
    multiscale_attention: bool = True
    path_cluster_num: float = 0.0008
    distill_logits: bool = True
    distill_feature: bool = True
    temperature: float = 2.0

    # logits combination
    combination_type: str = "max_confidence"
    combination_type_teas: str = "max_confidence"
    combination_type_stus: str = "max_confidence"

    # model
    mode: str = "teacher"
    attn_dim: int = 2
    # attn_dim=1 only: bit-exact emulation of the reference's degenerate
    # pad-to-2D grid_sample (reference models/DeformableAttention1D.py:36-43)
    degenerate_1d_sampling: bool = False
    # table-interpolated CPB bias (v9, APPROXIMATE): >0 evaluates the SwinV2
    # CPB MLP once per step on a lattice of (query spacing / divisor) and
    # bilinearly interpolates each kv point's bias window, instead of running
    # the MLP at all Nq*Nk positions (the teacher's measured bottleneck,
    # PERF.md).  0 = exact (default).  Divisor 4: bias error ~1e-3 of its
    # dynamic range (tools/exp_cpb_table_acc.py).
    cpb_table_divisor: int = 0
    # v10 fused table attention (TPU, divisor-1 kn path only): interpolate
    # the bias windows INSIDE the attention kernel (sim+softmax+dropout+PV
    # in one pallas call) instead of materializing [BH, K, N] bias in HBM.
    # MEASURED SLOWER at the production operating point and kept opt-in:
    # fwd 1.13 vs 0.70 ms, grad 3.40 vs 1.53 ms per attention
    # (tools/exp_v10_fwdbwd.py), teacher train step 206 vs 283 bags/s
    # (tools/exp_v10_e2e.py) — the d1 interp output already streams at
    # HBM bandwidth and XLA's attention pipeline beats the in-kernel
    # VPU window placement.  Golden-tested against the unfused path.
    fused_table_attention: bool = False
    # bf16 materialized attention streams (kn layout): store the [B,H,K,N]
    # sim and attention maps in bf16 (softmax still reduces in f32).  Halves
    # the HBM traffic of the step's bandwidth-bound streams at the d1 table
    # operating point; ~2e-3 relative perturbation on attention weights
    # (bf16 mantissa).  A/B in tools/exp_attn_bf16_streams.py.
    attn_bf16_streams: bool = False
    # bf16 STORE of the table-interpolated CPB windows (interpolation
    # arithmetic stays f32 in-kernel): halves the interp output write, the
    # window->row relayout traffic and the bias-add read, plus the mirrored
    # backward streams.  Only meaningful with cpb_table_divisor > 0.
    # Measured NEGATIVE on chip (teacher 299 vs 318 bags/s,
    # tools/exp_tbl_bf16.py — the window->row relayout is a physical
    # retiling and bf16's packed (16,128) sublane tiling makes it cost
    # MORE per element than the halved bytes save); kept opt-in.
    cpb_table_bf16: bool = False

    # task
    task_type: str = "diag2021"
    label_dim: int = 4
    survival_interval: str = "all"
    act_type: str = "Sigmoid"

    # dataset options
    coTraining: bool = True
    external_eval: bool = False
    save4roc: bool = False
    printDataSplit: bool = False
    save4visualization: bool = False

    # --- new (TPU framework) knobs, all optional ---------------------------
    # synthetic-data fallback when no manifests exist on disk
    synthetic_data: bool = False
    synthetic_train_size: int = 64
    synthetic_test_size: int = 32
    # evaluation cadence during training (reference hardcodes 10,
    # reference train_test.py:234 — and runs a FULL test pass that often;
    # that is a major host-sync anti-pattern, so the default here is a far
    # sparser cadence: each eval blocks the train-step stream for a full
    # test pass.  The reference presets keep 10 in their YAMLs for workflow
    # parity; lower this deliberately, knowing the cost.)
    eval_every_iters: int = 200
    # train steps fused into ONE device dispatch via lax.scan (1 = off).
    # Useful when dispatch latency rivals step compute (remote/tunneled
    # chips, sub-ms models); eval/logging cadence rounds to multiples of it.
    scan_steps: int = 1
    eval_during_training: bool = True
    # deterministic training: run the train step's model forward in
    # deterministic mode (dropout off, DPC tie-break noise pinned, BN frozen
    # on running stats).  For bitwise-reproducible debugging and for
    # trajectory-parity testing against a torch eval-mode oracle
    # (tests/test_reference_parity.py); NOT a production setting.
    deterministic_training: bool = False
    # numerics
    compute_dtype: str = "float32"  # or "bfloat16" for matmul-heavy paths
    use_pallas: bool = True  # use fused Pallas kernels where available
    remat: bool = True  # rematerialize CPB/attention internals
    # mesh
    mesh_data_axis: int = 0  # 0 = all local devices
    # misc
    debug: bool = False
    cur_fold: int = 0
    rank: int = 0
    world_size: int = 1
    log_dir: str = "./logs"
    wandb: bool = False

    # ------------------------------------------------------------------
    @property
    def label_column(self) -> int:
        return _TASK_LABEL_COLUMN[self.task_type]

    @property
    def class_weights(self):
        return TASK_CLASS_WEIGHTS.get(self.task_type)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in known}
        extra = {k: v for k, v in d.items() if k not in known}
        cfg = cls(**kwargs)
        cfg._extra = extra  # keep unknown keys for forward compat
        return cfg

    @classmethod
    def from_yaml(cls, path: str) -> "Config":
        return cls.from_dict(yaml_config_hook(path))

    @classmethod
    def from_args(cls, argv=None, default_yaml: str | None = None) -> "Config":
        """YAML preset + CLI overrides, reference main.py:434-446 workflow."""
        pre = argparse.ArgumentParser(add_help=False)
        pre.add_argument("--config", default=default_yaml)
        ns, rest = pre.parse_known_args(argv)
        ycfg = yaml_config_hook(ns.config) if ns.config else {}
        base = dataclasses.asdict(cls())
        base.update(ycfg)
        parser = build_parser(base)
        parser.add_argument("--config", default=ns.config)
        args = parser.parse_args(argv)
        d = vars(args)
        d.pop("config", None)
        cfg = cls.from_dict(d)
        cfg.validate()
        return cfg

    def validate(self):
        if self.task_type not in _TASK_LABEL_COLUMN:
            raise ValueError(f"unknown task_type {self.task_type!r}")
        expected = _TASK_LABEL_DIM[self.task_type]
        if self.label_dim != expected:
            # reference relies on the YAML to keep these in sync; we enforce it
            self.label_dim = expected
        if self.buckets:
            from .data.bucketing import validate_buckets

            validate_buckets(str(self.buckets).split(","))
        from .utils.weight_init import VALID_INIT_TYPES
        if self.init_type not in VALID_INIT_TYPES:
            # the reference raises the same way inside init_weights
            # (utils/utils.py:202); we reject at config time instead of
            # silently falling through to framework defaults
            raise NotImplementedError(
                f"initialization method [{self.init_type}] is not implemented"
                f" (valid: {', '.join(VALID_INIT_TYPES)})")
        if self.fixdim <= 0:
            raise ValueError("fixdim must be positive")
        n = self.fixdim
        r = int(round(n ** 0.5))
        if r * r != n:
            raise ValueError(
                f"fixdim={n} must be a perfect square: the deformable 2D "
                "attention views the bag as a sqrt(N) x sqrt(N) grid "
                "(reference models/DeformableAttention2D.py:241-242)"
            )
        return self

    def replace(self, **kw) -> "Config":
        new = dataclasses.replace(self, **kw)
        new._extra = getattr(self, "_extra", {})
        return new


def load_config(path_or_cfg) -> Config:
    if isinstance(path_or_cfg, Config):
        return path_or_cfg
    if isinstance(path_or_cfg, dict):
        return Config.from_dict(path_or_cfg)
    return Config.from_yaml(path_or_cfg)
