"""Training entry point — same workflow surface as the reference main.py:
YAML preset mirrored into CLI flags, seeded k-fold patient splits over
TCGA+IvYGAP co-training (or CPTAC when --external_eval), mode-dispatched
trainers, metric-stamped checkpoints.

TPU-native differences (by design, see SURVEY.md §2.3):
- no mp.spawn / process-per-device (reference main.py:476-482): one
  controller, data parallelism via a jax.sharding Mesh inside the jitted step;
- no DDP wrap / SyncBN conversion (reference main.py:183-207): the global
  batch is sharded over the 'data' axis so grads and BN stats span replicas
  automatically;
- when no dataset manifests exist on disk (the reference's data/dataset.py is
  absent from its snapshot), --synthetic_data runs the full pipeline on the
  deterministic synthetic contract generator.
"""

from __future__ import annotations

import os
import sys

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
from disentangled_multimodal_learning_tpu.train.trainers import (
    run_training,
    trainDeformPathomicModel,
    trainDistillation,
    trainStudentsModel,
    trainTeachersModel,
)
from disentangled_multimodal_learning_tpu.utils.checkpoint import (
    load_checkpoint,
    restore_state,
)
from disentangled_multimodal_learning_tpu.utils.logging import Logger

DEFAULT_CONFIG = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "config", "config_mine_diag2021.yaml")


def _make_loaders(cfg, train_ds, test_ds):
    from disentangled_multimodal_learning_tpu.data import (BucketedBagLoader,
                                                           PrefetchLoader)

    if getattr(cfg, "buckets", ""):
        # bucketed variable-length bags: one compiled executable per
        # perfect-square bucket size (data/bucketing.py)
        buckets = [int(b) for b in str(cfg.buckets).split(",")]
        train_inner = BucketedBagLoader(train_ds, cfg.batch_size,
                                        buckets=buckets, shuffle=True,
                                        drop_last=True, seed=cfg.seed)
        test_loader = (BucketedBagLoader(test_ds, cfg.batch_size,
                                         buckets=buckets, shuffle=False,
                                         drop_last=False, seed=cfg.seed)
                       if test_ds is not None else None)
    else:
        train_inner = BagLoader(train_ds, cfg.batch_size, shuffle=True,
                                drop_last=True, seed=cfg.seed)
        test_loader = (BagLoader(test_ds, cfg.batch_size, shuffle=False,
                                 drop_last=False, pad_final=False,
                                 seed=cfg.seed)
                       if test_ds is not None else None)
    train_loader = PrefetchLoader(
        train_inner, depth=max(1, int(getattr(cfg, "workers", 0)) or 2))
    return train_loader, test_loader


def _synthetic_fold_datasets(cfg, fold):
    train = SyntheticBagDataset(size=cfg.synthetic_train_size, fixdim=cfg.fixdim,
                                label_dim=cfg.label_dim, seed=cfg.seed + fold,
                                args=cfg)
    test = SyntheticBagDataset(size=cfg.synthetic_test_size, fixdim=cfg.fixdim,
                               label_dim=cfg.label_dim, seed=cfg.seed + 100 + fold,
                               args=cfg)
    return train, test


def _dispatch_training(cfg, logger, loaders):
    """mode -> trainer (reference main.py:209-220,420-431)."""
    if cfg.mode == "distillation":
        student, teacher = define_net(cfg)
        import jax

        from disentangled_multimodal_learning_tpu.train.optim import make_optimizer
        from disentangled_multimodal_learning_tpu.train.trainers import (
            init_model_state)

        sample = next(iter(loaders[0]))
        tx = make_optimizer(cfg, max(1, len(loaders[0])))
        student_state = init_model_state(student, cfg, sample, tx)
        teacher_state = init_model_state(teacher, cfg, sample, tx)
        if cfg.checkpoints_student not in ("#", "", None):
            student_state = restore_state(student_state, cfg.checkpoints_student)
        if cfg.checkpoints_teacher not in ("#", "", None):
            teacher_state = restore_state(teacher_state, cfg.checkpoints_teacher)
        teacher_vars = {"params": teacher_state.params,
                        "batch_stats": teacher_state.batch_stats}
        return trainDistillation(student, teacher, loaders, None, None, logger,
                                 cfg, teacher_vars=teacher_vars,
                                 student_state=student_state)

    model = define_net(cfg)
    state = None
    if cfg.reload:
        ckpt = (cfg.checkpoints_teacher if cfg.mode in ("teacher", "uniteacher")
                else cfg.checkpoints_student)
        if ckpt not in ("#", "", None):
            import jax

            from disentangled_multimodal_learning_tpu.train.optim import (
                make_optimizer)
            from disentangled_multimodal_learning_tpu.train.trainers import (
                init_model_state)

            sample = next(iter(loaders[0]))
            tx = make_optimizer(cfg, max(1, len(loaders[0])))
            state = restore_state(init_model_state(model, cfg, sample, tx), ckpt)

    # ``state`` (the --reload restored TrainState, reference main.py:153-174)
    # must reach run_training for EVERY mode — dropping it here would train
    # from scratch while claiming to resume
    if cfg.mode == "deformpathomic":
        return trainDeformPathomicModel(model, loaders, None, None, logger,
                                        cfg, state=state)
    if cfg.mode in ("teacher", "uniteacher"):
        return trainTeachersModel(model, loaders, None, None, logger, cfg,
                                  state=state)
    if cfg.mode == "student":
        return trainStudentsModel(model, loaders, None, None, logger, cfg,
                                  state=state)
    # baselines / multiscale: generic driver
    return run_training(cfg, model, loaders, logger, state=state)


def _maybe_init_distributed(cfg):
    """Multi-host initialization (replaces the reference's
    dist.init_process_group("nccl") + MASTER_ADDR/PORT env rendezvous,
    reference main.py:27-29,451-452).  On TPU pods each host runs this same
    script; jax.distributed discovers peers from the TPU environment, and the
    'data' mesh then spans all hosts' devices (collectives ride ICI/DCN).

    An explicit rendezvous — the analogue of the reference's
    MASTER_ADDR/PORT — is supported via env vars for non-TPU clusters (and
    the simulated 2-process CPU cluster in tests/test_parallel.py):
    DMLT_COORDINATOR=<host:port>, DMLT_NUM_PROCESSES, DMLT_PROCESS_ID."""
    if int(getattr(cfg, "nodes", 1)) > 1:
        import jax

        kw = {}
        coordinator = os.environ.get("DMLT_COORDINATOR", "")
        if coordinator:
            kw = dict(
                coordinator_address=coordinator,
                num_processes=int(os.environ.get("DMLT_NUM_PROCESSES",
                                                 cfg.nodes)),
                process_id=int(os.environ.get("DMLT_PROCESS_ID", "0")))
        jax.distributed.initialize(**kw)
        print(f"[main] multi-host: process {jax.process_index()} / "
              f"{jax.process_count()}, {jax.device_count()} global devices")


def main(gpu, args, wandb_logger=None):
    """Reference-compatible signature (main.py:19); ``gpu`` is unused on the
    single-controller TPU runtime."""
    cfg = args if isinstance(args, Config) else Config.from_dict(vars(args))
    _maybe_init_distributed(cfg)
    np.random.seed(cfg.seed)
    logger = wandb_logger if wandb_logger is not None else Logger(cfg)
    os.makedirs(cfg.checkpoints, exist_ok=True) if cfg.checkpoints != "#" else None

    results = {}

    if cfg.synthetic_data:
        for fold in range(cfg.kfold):
            cfg.cur_fold = fold
            train_ds, test_ds = _synthetic_fold_datasets(cfg, fold)
            loaders = _make_loaders(cfg, train_ds, test_ds)
            _, metrics, ckpt = _dispatch_training(cfg, logger, loaders)
            results[fold] = metrics
            print(f"\n[fold {fold}] {_fmt(metrics)}  ckpt={ckpt}")
        return results

    if cfg.external_eval:
        # CPTAC path (reference main.py:35-220)
        print("Now Training CPTAC!")
        import pandas as pd

        manifest = os.path.join(cfg.dataDir, "CPTAC",
                                "multimodal_diag_survival_CPTAC.csv")
        df = pd.read_csv(manifest, header=0)
        for fold, train_mask, test_mask in kfold_patient_split(
                df.iloc[:, 0].to_numpy(), cfg.kfold, cfg.seed):
            cfg.cur_fold = fold
            _maybe_dump_split(cfg, "CPTAC", fold, df, train_mask, test_mask)
            train_ds = CPTAC_Dataset(excel_wsi=df[train_mask], args=cfg)
            test_ds = CPTAC_Dataset(excel_wsi=df[test_mask], args=cfg)
            loaders = _make_loaders(cfg, train_ds, test_ds)
            _, metrics, ckpt = _dispatch_training(cfg, logger, loaders)
            results[fold] = metrics
            print(f"\n[CPTAC fold {fold}] {_fmt(metrics)}  ckpt={ckpt}")
        return results

    # TCGA + IvYGAP co-training (reference main.py:223-431)
    print("Now is the TCGA and IvYGAP CoTraining!")
    import pandas as pd

    df_tcga = pd.read_csv(os.path.join(cfg.dataDir, "TCGA",
                                       "multimodal_diag_survival_TCGA.csv"), header=0)
    df_ivy = pd.read_csv(os.path.join(cfg.dataDir, "IvYGAP",
                                      "multimodal_diag_survival_IvY.csv"), header=0)
    tcga_folds = list(kfold_patient_split(df_tcga.iloc[:, 0].to_numpy(),
                                          cfg.kfold, cfg.seed))
    ivy_folds = list(kfold_patient_split(df_ivy.iloc[:, 0].to_numpy(),
                                         cfg.kfold, cfg.seed))
    for (fold, tr_t, te_t), (_, tr_i, te_i) in zip(tcga_folds, ivy_folds):
        cfg.cur_fold = fold
        _maybe_dump_split(cfg, "TCGA", fold, df_tcga, tr_t, te_t)
        if cfg.coTraining:
            _maybe_dump_split(cfg, "IvYGAP", fold, df_ivy, tr_i, te_i)
        train_tcga = TCGA_Dataset(excel_wsi=df_tcga[tr_t], args=cfg)
        test_tcga = TCGA_Dataset(excel_wsi=df_tcga[te_t], args=cfg)
        if cfg.coTraining:
            train_ivy = IvYGAP_Dataset(excel_wsi=df_ivy[tr_i], args=cfg)
            test_ivy = IvYGAP_Dataset(excel_wsi=df_ivy[te_i], args=cfg)
            train_ds = ConcatDataset([train_ivy, train_tcga])
            test_ds = ConcatDataset([test_ivy, test_tcga])
        else:
            train_ds, test_ds = train_tcga, test_tcga
        loaders = _make_loaders(cfg, train_ds, test_ds)
        _, metrics, ckpt = _dispatch_training(cfg, logger, loaders)
        results[fold] = metrics
        print(f"\n[fold {fold}] {_fmt(metrics)}  ckpt={ckpt}")
    return results


def _maybe_dump_split(cfg, cohort, fold, df, train_mask, test_mask):
    """Per-fold split manifests next to checkpoints (reference
    printDataSplit, main.py:70-99,282-299)."""
    if not getattr(cfg, "printDataSplit", False):
        return
    from disentangled_multimodal_learning_tpu.data.splits import dump_split_csvs

    out_dir = cfg.checkpoints if cfg.checkpoints not in ("#", "") else "."
    paths = dump_split_csvs(out_dir, cohort, fold, df, train_mask, test_mask)
    print(f"[main] split manifests: {paths['train']}, {paths['test']}")


def _fmt(metrics: dict) -> str:
    return " ".join(f"{k}={v:.4f}" for k, v in metrics.items()
                    if isinstance(v, float))


if __name__ == "__main__":
    # DMLT_PLATFORM=cpu forces the CPU backend (the axon TPU plugin rewrites
    # jax_platforms at import, so JAX_PLATFORMS alone cannot)
    if os.environ.get("DMLT_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["DMLT_PLATFORM"])
    # rbg PRNG: ~3% step-time win over threefry on TPU (dropout mask
    # generation); statistically equivalent streams
    import jax as _jax

    _jax.config.update("jax_default_prng_impl", "rbg")
    cfg = Config.from_args(default_yaml=DEFAULT_CONFIG)
    # fall back to synthetic data when no manifests exist on disk
    if not cfg.synthetic_data:
        probe = os.path.join(cfg.dataDir, "CPTAC" if cfg.external_eval else "TCGA")
        if not os.path.isdir(probe):
            print(f"[main] no dataset manifests under {probe!r}; "
                  "falling back to --synthetic_data")
            cfg = cfg.replace(synthetic_data=True)
    main(0, cfg)
