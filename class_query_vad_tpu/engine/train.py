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


def backbone_freeze_labels(params, cfg):
    """Label pytree ("frozen"/"trainable") reproducing the reference's
    ``tune_point`` requires_grad freezing, applied during pretrained
    backbone loading:

    * ViT (/root/reference/models/backbones/vit.py:119-129): freeze
      patch_embed, every norm parameter in the trunk, and blocks with
      index <= tune_point;
    * CSN (/root/reference/models/backbones/ir_CSN_152.py:272-324):
      freeze the stem (conv1 + bn1) when tune_point > 1 and stage s
      (0-based) when tune_point > s + 2.

    Frozen parameters get optax.set_to_zero() via multi_transform, so they
    also skip AdamW weight decay and the global-norm clip — matching
    requires_grad=False (no grad, no decay) in the reference.

    BatchNorm running statistics (CSN buffers, held in the param tree) are
    ALWAYS frozen: torch registers them as buffers — never optimized, never
    weight-decayed.  Without this, AdamW's decay would corrupt the
    pretrained statistics every step.
    """
    tune = int(cfg.CONFIG.MODEL.get("TUNE_POINT", 0))
    tune_active = (bool(cfg.CONFIG.MODEL.get("PRETRAINED", False))
                   and tune > 0)
    bb = cfg.CONFIG.MODEL.BACKBONE_NAME

    def is_frozen(path) -> bool:
        keys = [getattr(k, "key", str(k)) for k in path]
        if keys and keys[-1] in ("running_mean", "running_var"):
            return True
        if not tune_active:
            return False
        if "backbone" not in keys:
            return False
        sub = keys[keys.index("backbone") + 1 :]
        if not sub:
            return False
        if bb == "ViT":
            if tune <= 0 or sub[0] != "body" or len(sub) < 2:
                return False
            rest = sub[1:]
            if "patch_embed" in rest[0]:
                return True
            if any("norm" in k for k in rest):
                return True
            if rest[0].startswith("blocks_"):
                return int(rest[0].rsplit("_", 1)[-1]) <= tune
            return False
        if bb.startswith("CSN"):
            head = sub[0]
            if head in ("conv1", "bn1"):
                return tune > 1
            if head.startswith("layer"):
                return tune > int(head[5]) - 1 + 2
        return False

    return jax.tree_util.tree_map_with_path(
        lambda p, _: "frozen" if is_frozen(p) else "trainable", params
    )


def make_optimizer(lr, grad_accum: int = 1, clip_norm: float = 1.0,
                   freeze_labels=None) -> optax.GradientTransformation:
    """lr may be a float (constant) or an optax schedule."""
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01),
    )
    if freeze_labels is not None:
        tx = optax.multi_transform(
            {"trainable": tx, "frozen": optax.set_to_zero()}, freeze_labels
        )
    if grad_accum > 1:
        # accumulate SUM like the reference (scale micro-grads back up)
        tx = optax.chain(optax.scale(float(grad_accum)),
                         optax.MultiSteps(tx, grad_accum))
    return tx


@functools.lru_cache(maxsize=8)
def _jitted_model_init(model):
    # jit the inits: eagerly they dispatch one op per parameter tensor,
    # which is fine on a local device but takes SECONDS PER OP through
    # this environment's remote-TPU tunnel (CLAUDE.md) — an unjitted
    # flagship init stalls for many minutes before the first train step.
    # Memoized so multi-state processes reuse one trace (same pattern as
    # engine.evaluate's memoized forward jits).
    return jax.jit(model.init, static_argnums=(3,))


@functools.lru_cache(maxsize=8)
def _jitted_tx_init(tx):
    return jax.jit(tx.init)


def create_train_state(model, cfg, rng, sample_batch,
                       steps_per_epoch: int = 0) -> Tuple[TrainState, optax.GradientTransformation]:
    params_rng, dropout_rng = jax.random.split(rng)
    params = _jitted_model_init(model)(
        params_rng, jnp.asarray(sample_batch["pixels"]),
        jnp.asarray(sample_batch["mask"]), True,
    )
    # always computed: BN buffers are frozen unconditionally; tune_point
    # stage freezing activates only with pretrained loading (the reference
    # freezes inside load_pretrain)
    freeze = backbone_freeze_labels(params, cfg)
    leaves = jax.tree_util.tree_leaves(freeze)
    n_frozen = sum(1 for l in leaves if l == "frozen")
    tune_active = (bool(cfg.CONFIG.MODEL.get("PRETRAINED", False))
                   and int(cfg.CONFIG.MODEL.get("TUNE_POINT", 0)) > 0)
    if n_frozen == 0:
        freeze = None
    elif tune_active:
        print(
            f"tune_point={cfg.CONFIG.MODEL.TUNE_POINT}: freezing "
            f"{n_frozen}/{len(leaves)} parameter tensors in the backbone"
        )
    else:
        # without pretrained loading only the BN buffers are frozen —
        # attribute the count to buffer freezing, not tune_point staging
        print(f"freezing {n_frozen} BatchNorm buffer tensors in the backbone")
    # CONFIG.TRAIN.LR_POLICY selects an optax schedule (utils/lr_scheduler,
    # counterpart of the reference's unwired timm builders); the default is
    # the reference train loop's constant LR (/root/reference/train.py:83).
    # float(): YAML 1.1 parses the reference yamls' bare "1e-4" as a STRING
    # (no decimal point / exponent-only) — the reference casts at the same
    # consumer (`lr=float(cfg.CONFIG.TRAIN.LR)`, train.py:83); a string LR
    # otherwise detonates deep inside optax's scale step.
    lr = float(cfg.CONFIG.TRAIN.LR)
    policy = cfg.CONFIG.TRAIN.get("LR_POLICY", "constant")
    if policy != "constant" and steps_per_epoch > 0:
        from ..utils.lr_scheduler import build_scheduler

        lr = build_scheduler(cfg, steps_per_epoch)
    tx = make_optimizer(
        lr, cfg.CONFIG.TRAIN.GRAD_ACCUM,
        cfg.CONFIG.TRAIN.get("CLIP_GRAD_NORM", 1.0),
        freeze_labels=freeze,
    )
    return (
        TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=_jitted_tx_init(tx)(params),
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
