"""LR schedule builders (optax).

Counterpart of /root/reference/utils/lr_scheduler.py:13-60 (timm cosine /
linear / step / multistep builders).  Like the reference — which defines
these but trains at constant LR (train.py:83) — the default train loop uses
a constant schedule; these are available via CONFIG.TRAIN.LR_POLICY.
"""

from __future__ import annotations

import optax


def build_scheduler(cfg, steps_per_epoch: int):
    train = cfg.CONFIG.TRAIN
    base_lr = train.LR
    policy = train.get("LR_POLICY", "constant")
    epochs = train.NUM_EPOCHS
    warmup_epochs = train.get("WARMUP_EPOCHS", 0)
    min_lr = train.get("MIN_LR", 0.0)
    total = epochs * steps_per_epoch
    warmup = warmup_epochs * steps_per_epoch

    if policy == "constant":
        sched = optax.constant_schedule(base_lr)
    elif policy == "cosine":
        sched = optax.cosine_decay_schedule(
            base_lr, max(total - warmup, 1), alpha=min_lr / max(base_lr, 1e-12)
        )
    elif policy == "linear":
        sched = optax.linear_schedule(base_lr, min_lr, max(total - warmup, 1))
    elif policy == "step":
        decay_epochs = train.get("DECAY_EPOCHS", 30)
        rate = train.get("DECAY_RATE", 0.1)
        sched = optax.exponential_decay(
            base_lr, decay_epochs * steps_per_epoch, rate, staircase=True
        )
    elif policy == "multistep":
        milestones = train.get("LR_MILESTONE", [])
        rate = train.get("DECAY_RATE", 0.1)
        boundaries = {int(m) * steps_per_epoch: rate for m in milestones}
        sched = optax.piecewise_constant_schedule(base_lr, boundaries)
    else:
        raise ValueError(f"unknown LR_POLICY {policy}")

    if warmup > 0:
        sched = optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, warmup), sched], [warmup]
        )
    return sched
