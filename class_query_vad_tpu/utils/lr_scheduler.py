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
    # float()/int(): bare "1e-4"-style YAML scalars parse as strings
    # (YAML 1.1); the reference casts LR at its consumer (train.py:83)
    base_lr = float(train.LR)
    policy = train.get("LR_POLICY", "constant")
    epochs = int(train.NUM_EPOCHS)
    warmup_epochs = int(train.get("WARMUP_EPOCHS", 0))
    min_lr = float(train.get("MIN_LR", 0.0))
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
