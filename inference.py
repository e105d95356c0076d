"""Evaluation entry point — same workflow as the reference inference.py:
rebuild the fold split from the seed, load a checkpoint, dispatch to the
mode's test loop (reference inference.py:16-440; note the reference imports
two test functions its train_test.py never defines, inference.py:9 — both
exist here)."""

from __future__ import annotations

import argparse
import os

import numpy as np

from disentangled_multimodal_learning_tpu.config import Config
from disentangled_multimodal_learning_tpu.data import (
    BagLoader,
    ConcatDataset,
    CPTAC_Dataset,
    IvYGAP_Dataset,
    SyntheticBagDataset,
    TCGA_Dataset,
    kfold_patient_split,
)
from disentangled_multimodal_learning_tpu.models.factory import define_net
from disentangled_multimodal_learning_tpu.train.optim import make_optimizer
from disentangled_multimodal_learning_tpu.train.trainers import (
    init_model_state,
    testBaselineModel,
    testDeformPathomicModel,
    testDistillation,
    testMultiScaleModel,
    testStudentsModel,
    testTeachersModel,
)
from disentangled_multimodal_learning_tpu.utils.checkpoint import restore_state
from disentangled_multimodal_learning_tpu.utils.logging import Logger

DEFAULT_CONFIG = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "config", "config_mine_diag2021.yaml")


def _test_loader(cfg, test_ds):
    """Bucketed when cfg.buckets is set (data/bucketing.py), else plain."""
    if getattr(cfg, "buckets", ""):
        from disentangled_multimodal_learning_tpu.data import BucketedBagLoader

        return BucketedBagLoader(
            test_ds, cfg.batch_size,
            buckets=[int(b) for b in str(cfg.buckets).split(",")],
            shuffle=False, drop_last=False, seed=cfg.seed)
    return BagLoader(test_ds, cfg.batch_size, shuffle=False, drop_last=False)


def _build_fold0_test_loader(cfg):
    """Rebuild the fold-0 split identically via the seed
    (reference inference.py:113-121)."""
    np.random.seed(cfg.seed)
    if cfg.synthetic_data:
        test_ds = SyntheticBagDataset(size=cfg.synthetic_test_size,
                                      fixdim=cfg.fixdim, label_dim=cfg.label_dim,
                                      seed=cfg.seed + 100, args=cfg)
        return _test_loader(cfg, test_ds)
    import pandas as pd

    if cfg.external_eval:
        df = pd.read_csv(os.path.join(cfg.dataDir, "CPTAC",
                                      "multimodal_diag_survival_CPTAC.csv"))
        _, _, te = next(iter(kfold_patient_split(df.iloc[:, 0].to_numpy(),
                                                 cfg.kfold, cfg.seed)))
        test_ds = CPTAC_Dataset(excel_wsi=df[te], args=cfg)
    else:
        df_tcga = pd.read_csv(os.path.join(
            cfg.dataDir, "TCGA", "multimodal_diag_survival_TCGA.csv"))
        df_ivy = pd.read_csv(os.path.join(
            cfg.dataDir, "IvYGAP", "multimodal_diag_survival_IvY.csv"))
        _, _, te_t = next(iter(kfold_patient_split(df_tcga.iloc[:, 0].to_numpy(),
                                                   cfg.kfold, cfg.seed)))
        _, _, te_i = next(iter(kfold_patient_split(df_ivy.iloc[:, 0].to_numpy(),
                                                   cfg.kfold, cfg.seed)))
        test_tcga = TCGA_Dataset(excel_wsi=df_tcga[te_t], args=cfg)
        if cfg.coTraining:
            test_ivy = IvYGAP_Dataset(excel_wsi=df_ivy[te_i], args=cfg)
            test_ds = ConcatDataset([test_ivy, test_tcga])
        else:
            test_ds = test_tcga
    return _test_loader(cfg, test_ds)


def main(gpu, args, wandb_logger=None, checkpoint: str | None = None):
    cfg = args if isinstance(args, Config) else Config.from_dict(vars(args))
    logger = wandb_logger if wandb_logger is not None else Logger(cfg)
    loader = _build_fold0_test_loader(cfg)

    if cfg.mode == "distillation":
        model, _ = define_net(cfg)
    else:
        model = define_net(cfg)

    sample = next(iter(loader))
    tx = make_optimizer(cfg, 1)
    state = init_model_state(model, cfg, sample, tx)
    ckpt = checkpoint or (cfg.checkpoints_teacher
                          if cfg.mode in ("teacher", "uniteacher")
                          else cfg.checkpoints_student)
    if ckpt and ckpt not in ("#", ""):
        if ckpt.endswith((".pth", ".pt")):
            # reference-trained torch state_dict (reference
            # train_test.py:325-340): import the weights directly
            # (utils/torch_import.py) — no retraining to migrate
            from disentangled_multimodal_learning_tpu.utils.torch_import import (
                import_torch_checkpoint)

            imp_mode = "student" if cfg.mode == "distillation" else cfg.mode
            state = state.replace(params=import_torch_checkpoint(
                ckpt, mode=imp_mode, attn_dim=getattr(cfg, "attn_dim", 2),
                template=state.params))
            print(f"[inference] imported reference torch checkpoint: {ckpt}")
        else:
            state = restore_state(state, ckpt)
    else:
        print("[inference] WARNING: no checkpoint given, evaluating random init")

    dispatch = {
        "teacher": testTeachersModel,
        "uniteacher": testTeachersModel,
        "student": testStudentsModel,
        "distillation": testDistillation,
        "deformpathomic": testDeformPathomicModel,
        "multiscale": testMultiScaleModel,
    }
    fn = dispatch.get(cfg.mode, testBaselineModel)
    metrics = fn(model, loader, logger, cfg, state=state)

    if cfg.save4visualization and cfg.mode in ("teacher", "uniteacher",
                                               "student", "distillation",
                                               "multiscale"):
        # attention-heatmap export (reference train_test.py:1121-1177)
        from disentangled_multimodal_learning_tpu.train.evaluation import Evaluator

        ev = Evaluator(model, cfg)
        out_dir = cfg.checkpoints if cfg.checkpoints != "#" else "."
        os.makedirs(out_dir, exist_ok=True)
        path = ev.export_attention_maps(
            state, loader, os.path.join(out_dir, f"attention_fold{cfg.cur_fold}.npz"))
        print(f"[inference] attention maps -> {path}")
    printable = {k: v for k, v in metrics.items() if isinstance(v, float)}
    print(" ".join(f"{k}={v:.4f}" for k, v in printable.items()))
    if logger is not None:
        logger.log({"inference": printable})
    return metrics


if __name__ == "__main__":
    if os.environ.get("DMLT_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["DMLT_PLATFORM"])
    # rbg PRNG: ~3% step-time win over threefry on TPU (dropout mask
    # generation); statistically equivalent streams
    import jax as _jax

    _jax.config.update("jax_default_prng_impl", "rbg")
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--checkpoint", default=None)
    ns, rest = pre.parse_known_args()
    cfg = Config.from_args(rest, default_yaml=DEFAULT_CONFIG)
    if not cfg.synthetic_data and not os.path.isdir(
            os.path.join(cfg.dataDir, "CPTAC" if cfg.external_eval else "TCGA")):
        print("[inference] no dataset manifests; falling back to --synthetic_data")
        cfg = cfg.replace(synthetic_data=True)
    main(0, cfg, checkpoint=ns.checkpoint)
