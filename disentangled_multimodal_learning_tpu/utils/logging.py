"""Experiment logging: wandb when available (reference main.py:459-473,
project "MultiScale_TMI25"), JSONL sink otherwise (this image has no wandb)."""

from __future__ import annotations

import json
import os
import time


class Logger:
    def __init__(self, cfg, project: str = "MultiScale_TMI25"):
        self.cfg = cfg
        self._wandb = None
        self._fh = None
        if getattr(cfg, "debug", False):
            return
        if getattr(cfg, "wandb", False):
            try:
                import wandb

                # vars() works on dataclass instances too — always forward the
                # run config (the reference records it, main.py:466-471)
                self._wandb = wandb.init(project=project, notes=project,
                                         tags=["TMI25", "MultiScale"],
                                         config=self.run_config())
                return
            except Exception:
                self._wandb = None
        log_dir = getattr(cfg, "log_dir", "./logs")
        os.makedirs(log_dir, exist_ok=True)
        self._fh = open(os.path.join(log_dir, f"run_{int(time.time())}.jsonl"), "a")

    def run_config(self) -> dict:
        """The experiment parameters recorded with the run; never None."""
        import dataclasses

        if dataclasses.is_dataclass(self.cfg):
            return dataclasses.asdict(self.cfg)
        return dict(vars(self.cfg))

    def log(self, payload: dict):
        def to_py(x):
            try:
                return float(x)
            except (TypeError, ValueError):
                return x

        payload = json.loads(json.dumps(payload, default=to_py))
        if self._wandb is not None:
            self._wandb.log(payload)
        elif self._fh is not None:
            self._fh.write(json.dumps({"t": time.time(), **payload}) + "\n")
            self._fh.flush()

    def close(self):
        if self._fh:
            self._fh.close()
