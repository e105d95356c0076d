"""Convert a reference PyTorch checkpoint into a framework checkpoint.

Migration CLI for labs moving from the reference (which saves bare
``model.state_dict()`` .pth files, reference train_test.py:325-340) to this
framework: builds the mode's model from the given config, imports the torch
weights into its param tree (utils/torch_import.py, layout transforms
oracle-tested in tests/test_torch_import.py), and writes a framework
checkpoint that ``inference.py --checkpoint`` / ``cfg.resume`` can load.

Usage:
    python tools/import_torch_ckpt.py fold_1_... .pth \
        --config config/config_mine_diag2021.yaml --out ./checkpoints \
        [--name teacher_fold_1_imported] [--mode teacher]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pth", help="reference torch .pth state_dict file")
    ap.add_argument("--config", required=True, help="framework YAML config")
    ap.add_argument("--out", default="./checkpoints", help="output directory")
    ap.add_argument("--name", default=None,
                    help="checkpoint name (default: <mode>_imported)")
    ap.add_argument("--mode", default=None,
                    help="override the config's mode for the import")
    ap.add_argument("--lenient", action="store_true",
                    help="tolerate unconsumed torch keys")
    args = ap.parse_args()

    os.environ.setdefault("DMLT_PLATFORM", "cpu")  # conversion is host work
    from disentangled_multimodal_learning_tpu.config import load_config
    from disentangled_multimodal_learning_tpu.data import (BagLoader,
                                                           SyntheticBagDataset)
    from disentangled_multimodal_learning_tpu.models.factory import define_net
    from disentangled_multimodal_learning_tpu.train.optim import make_optimizer
    from disentangled_multimodal_learning_tpu.train.trainers import (
        init_model_state)
    from disentangled_multimodal_learning_tpu.utils.checkpoint import (
        save_checkpoint)
    from disentangled_multimodal_learning_tpu.utils.torch_import import (
        import_torch_checkpoint)

    cfg = load_config(args.config)
    if args.mode:
        cfg.mode = args.mode
    cfg.validate()

    model = define_net(cfg)
    if cfg.mode == "distillation":
        raise SystemExit("import the student and teacher checkpoints "
                         "separately with --mode student / --mode teacher "
                         "(the reference loads them separately too, "
                         "main.py:369-385)")
    ds = SyntheticBagDataset(size=1, fixdim=cfg.fixdim,
                             label_dim=cfg.label_dim, seed=0, args=cfg)
    sample = next(iter(BagLoader(ds, 1, shuffle=False)))
    state = init_model_state(model, cfg, sample, make_optimizer(cfg, 1))

    params = import_torch_checkpoint(
        args.pth, mode=cfg.mode, attn_dim=getattr(cfg, "attn_dim", 2),
        template=state.params, strict=not args.lenient)
    state = state.replace(params=params)

    name = args.name or f"{cfg.mode}_imported"
    path = save_checkpoint(args.out, name, state,
                           extra={"mode": cfg.mode, "task": cfg.task_type,
                                  "imported_from": os.path.abspath(args.pth)})
    print(f"[import_torch_ckpt] {args.pth} -> {path}")


if __name__ == "__main__":
    main()
