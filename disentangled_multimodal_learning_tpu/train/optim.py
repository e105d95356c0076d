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
    if policy == "plateau":
        # data-dependent plateau scheduling breaks the static schedule model;
        # approximate with a gentle staircase (documented deviation)
        return optax.exponential_decay(lr, 5 * max(1, steps_per_epoch), 0.2,
                                       staircase=True)
    raise NotImplementedError(f"lr policy [{policy}] is not implemented")


def make_optimizer(args, steps_per_epoch: int = 1) -> optax.GradientTransformation:
    sched = make_schedule(args, steps_per_epoch)
    name = args.optimizer
    wd = float(args.weight_decay)
    if name == "sgd":
        return optax.chain(
            optax.add_decayed_weights(wd),
            optax.sgd(sched, momentum=0.9),
        )
    if name == "adam":
        # torch Adam's weight_decay is L2 added to the gradient (not decoupled)
        return optax.chain(optax.add_decayed_weights(wd), optax.adam(sched))
    if name == "adagrad":
        return optax.chain(
            optax.add_decayed_weights(wd),
            optax.adagrad(sched, initial_accumulator_value=0.1),
        )
    if name == "adamw":
        return optax.adamw(sched, weight_decay=wd)
    raise NotImplementedError(f"optimizer [{name}] is not implemented")
