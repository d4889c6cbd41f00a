"""Checkpoint save/restore.

Reference counterpart: utils/model_utils.py:266-299 (save) and :197-239
(restore) — model/optimizer/epoch/accuracy/config plus the RNG streams.
Here one orbax checkpoint holds the whole TrainState pytree (params,
opt_state, step, dropout_rng — the JAX PRNG key replaces the four torch RNG
streams) plus a small metadata dict.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ckpt_dir(cfg) -> str:
    return os.path.join(
        cfg.CONFIG.LOG.BASE_PATH, cfg.CONFIG.LOG.EXP_NAME,
        cfg.CONFIG.LOG.SAVE_DIR,
    )


def save_checkpoint(cfg, state, epoch: int, accuracy: float = 0.0):
    import orbax.checkpoint as ocp

    path = os.path.join(_ckpt_dir(cfg), f"ckpt_epoch_{epoch:02d}")
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    meta = {"epoch": epoch, "accuracy": float(accuracy),
            "config": cfg.dump()}
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)
    return path


def load_checkpoint(path: str, target=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), item=target)
    meta_path = os.path.abspath(path) + ".meta.json"
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return restored, meta


def load_pretrained_params(cfg, pretrained_path: str):
    """Load model params from either an orbax dir or a torch .pth reference
    checkpoint (converted on the fly) —
    counterpart of load_model_and_states (model_utils.py:197-239)."""
    if pretrained_path.endswith((".pth", ".pt")):
        from ..utils.checkpoint_convert import (
            convert_detr_checkpoint,
            load_torch_state_dict,
        )

        sd = load_torch_state_dict(pretrained_path)
        return convert_detr_checkpoint(sd, cfg)
    restored, _ = load_checkpoint(pretrained_path)
    if isinstance(restored, dict) and "params" in restored:
        return {"params": restored["params"]}
    return restored
