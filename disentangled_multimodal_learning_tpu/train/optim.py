"""Optimizers and LR schedules (optax), mirroring the reference factory
(reference models/model.py:107-143): sgd/adam/adagrad/adamw x linear/exp/step/
plateau/cosine/cosinewithwarmup/onecycle.

The reference steps its scheduler PER ITERATION in all four trainers
(train_test.py:230,435,660; deformpathomic steps per epoch, :1029), so
schedules here are expressed per-step with ``steps_per_epoch`` granularity.
"""

from __future__ import annotations

import math
from typing import Callable

import optax


def make_schedule(args, steps_per_epoch: int) -> Callable[[int], float]:
    lr = float(args.lr)
    policy = args.lr_policy
    epochs = int(args.epochs)
    total_steps = max(1, epochs * max(1, steps_per_epoch))

    if policy == "cosine":
        # torch CosineAnnealingLR(T_max=epochs, eta_min=0) stepped per iter:
        # the reference advances it every optimizer step, so the period is
        # effectively `epochs` STEPS (a reference quirk: with 10 epochs the
        # cosine completes within the first 10 iterations and restarts-free
        # clamps; we use the sane per-step cosine over the full run instead,
        # and keep the quirk available via lr_policy="cosine_torchstep").
        return optax.cosine_decay_schedule(lr, total_steps, alpha=0.0)
    if policy == "cosine_torchstep":
        def sched(step):
            t = step % (2 * epochs)
            return lr * (1 + math.cos(math.pi * min(t, epochs) / epochs)) / 2
        return sched
    if policy == "cosinewithwarmup":
        warmup = max(1, int(args.warmup_epochs) * max(1, steps_per_epoch))
        return optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup_steps=warmup, decay_steps=total_steps, end_value=0.0)
    if policy == "linear":
        return optax.linear_schedule(lr, 0.0, total_steps)
    if policy == "exp":
        return optax.exponential_decay(lr, max(1, steps_per_epoch), 0.1)
    if policy == "step":
        decay_iters = getattr(args, "lr_decay_iters", max(1, steps_per_epoch))
        return optax.exponential_decay(lr, decay_iters, 0.1, staircase=True)
    if policy == "onecycle":
        return optax.cosine_onecycle_schedule(total_steps, peak_value=1e-3)
    raise NotImplementedError(f"lr policy [{policy}] is not implemented")


class ReduceLROnPlateau:
    """Host-side metric watcher with torch ReduceLROnPlateau semantics
    (reference models/model.py:133-136: mode='min', factor=0.2,
    threshold=0.01 rel, patience=5).

    The reference calls ``scheduler.step()`` per iteration WITHOUT a metric,
    which raises in torch — plateau was unusable there; here it is wired to
    the per-epoch mean train loss in run_training.  ``step(metric)`` returns
    the cumulative LR scale; apply it with ``set_learning_rate`` (the
    optimizer must be built with lr_policy='plateau', which wraps it in
    optax.inject_hyperparams)."""

    def __init__(self, factor: float = 0.2, patience: int = 5,
                 threshold: float = 0.01, mode: str = "min"):
        self.factor = float(factor)
        self.patience = int(patience)
        self.threshold = float(threshold)
        self.mode = mode
        self.best: float | None = None
        self.num_bad = 0
        self.scale = 1.0

    def _improved(self, metric: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":  # torch rel threshold: best * (1 - threshold)
            return metric < self.best * (1.0 - self.threshold)
        return metric > self.best * (1.0 + self.threshold)

    def step(self, metric: float) -> float:
        if self._improved(metric):
            self.best = float(metric)
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.scale *= self.factor
                self.num_bad = 0
        return self.scale


def set_learning_rate(state, lr: float):
    """Overwrite the injected learning_rate hyperparam in a TrainState built
    with lr_policy='plateau'."""
    import jax.numpy as jnp

    hp = dict(state.opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(
        lr, dtype=jnp.asarray(hp["learning_rate"]).dtype)
    return state.replace(opt_state=state.opt_state._replace(hyperparams=hp))


def current_learning_rate(state) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


def _base_optimizer(name: str, wd: float, learning_rate) -> optax.GradientTransformation:
    if name == "sgd":
        return optax.chain(
            optax.add_decayed_weights(wd),
            optax.sgd(learning_rate, momentum=0.9),
        )
    if name == "adam":
        # torch Adam's weight_decay is L2 added to the gradient (not decoupled)
        return optax.chain(optax.add_decayed_weights(wd),
                           optax.adam(learning_rate))
    if name == "adagrad":
        return optax.chain(
            optax.add_decayed_weights(wd),
            optax.adagrad(learning_rate, initial_accumulator_value=0.1),
        )
    if name == "adamw":
        return optax.adamw(learning_rate, weight_decay=wd)
    raise NotImplementedError(f"optimizer [{name}] is not implemented")


def make_optimizer(args, steps_per_epoch: int = 1) -> optax.GradientTransformation:
    name = args.optimizer
    wd = float(args.weight_decay)
    if args.lr_policy == "plateau":
        # metric-reactive LR: expose learning_rate as mutable optimizer state
        # (host watcher: ReduceLROnPlateau + set_learning_rate)
        def build(learning_rate):
            return _base_optimizer(name, wd, learning_rate)

        return optax.inject_hyperparams(build)(learning_rate=float(args.lr))
    sched = make_schedule(args, steps_per_epoch)
    return _base_optimizer(name, wd, sched)
