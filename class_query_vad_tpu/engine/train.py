"""Training step + epoch loop.

Reference semantics (/root/reference/train.py:126-182):

* constant-LR AdamW over all parameters (torch defaults: betas (0.9,
  0.999), eps 1e-8, weight_decay 0.01 — train.py:83);
* the optimized total is the weighted sum of the LAST layer's four losses
  only — the aux losses are computed for logging but ``weight_dict`` has no
  aux keys, so they do not contribute gradients (train.py:148);
* gradients accumulate (sum, not mean) over GRAD_ACCUM micro-batches, then
  global-norm clip at 1.0 and one optimizer step (train.py:150-167).

TPU design: one jitted ``train_step`` carries a gradient-accumulation
buffer inside the optimizer state (optax.MultiSteps), so the loader keeps
the reference's per-micro-batch cadence while the whole update stays on
device; batches are sharded over the mesh 'data' axis and the grad psum is
inserted by XLA.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: FrozenDict
    opt_state: optax.OptState
    dropout_rng: jnp.ndarray


def make_optimizer(lr: float, grad_accum: int = 1,
                   clip_norm: float = 1.0) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01),
    )
    if grad_accum > 1:
        # accumulate SUM like the reference (scale micro-grads back up)
        tx = optax.chain(optax.scale(float(grad_accum)),
                         optax.MultiSteps(tx, grad_accum))
    return tx


def create_train_state(model, cfg, rng, sample_batch) -> Tuple[TrainState, optax.GradientTransformation]:
    params_rng, dropout_rng = jax.random.split(rng)
    params = model.init(
        params_rng, jnp.asarray(sample_batch["pixels"]),
        jnp.asarray(sample_batch["mask"]), True,
    )
    tx = make_optimizer(
        cfg.CONFIG.TRAIN.LR, cfg.CONFIG.TRAIN.GRAD_ACCUM,
        cfg.CONFIG.TRAIN.get("CLIP_GRAD_NORM", 1.0),
    )
    return (
        TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            dropout_rng=dropout_rng,
        ),
        tx,
    )


def make_train_step(model, criterion, weight_dict: Dict[str, float], tx):
    """Returns jit-able train_step(state, batch) -> (state, metrics)."""

    target_keys = ("boxes", "labels", "n_boxes", "frame_valid", "n_actors")

    def loss_fn(params, batch, rng):
        outputs = model.apply(
            params, batch["pixels"], batch["mask"], False,
            rngs={"dropout": rng},
        )
        targets = {k: batch[k] for k in target_keys if k in batch}
        loss_dict = criterion(outputs, targets)
        total = sum(loss_dict[k] * w for k, w in weight_dict.items())
        return total, loss_dict

    def train_step(state: TrainState, batch):
        rng, new_rng = jax.random.split(state.dropout_rng)
        (total, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"total_loss": total}
        metrics.update({k: loss_dict[k] for k in weight_dict})
        return (
            state.replace(
                step=state.step + 1, params=params, opt_state=opt_state,
                dropout_rng=new_rng,
            ),
            metrics,
        )

    return train_step
