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
import jax.numpy as jnp
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
    # host-side RNG streams for bit-exact resume of the data pipeline —
    # the reference saves python/numpy/torch/cuda states
    # (utils/model_utils.py:282-286); the device stream (dropout_rng) is
    # already inside the TrainState pytree.
    import pickle
    import random

    meta = {"epoch": epoch, "accuracy": float(accuracy),
            "config": cfg.dump()}
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)
    with open(path + ".rng.pkl", "wb") as f:
        pickle.dump({"python": random.getstate(),
                     "numpy": np.random.get_state()}, f)
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
    rng_path = os.path.abspath(path) + ".rng.pkl"
    if os.path.exists(rng_path):
        import pickle
        import random

        with open(rng_path, "rb") as f:
            rng = pickle.load(f)
        random.setstate(rng["python"])
        np.random.set_state(rng["numpy"])
    return restored, meta


def load_detr_weights(params: dict, pretrain_path: str, cfg) -> dict:
    """Two-stage training init (utils/model_utils.py:17-99): transplant the
    transformer + bbox_embed + refpoint weights from a stage-1 reference
    checkpoint into an initialized param tree, with tube <-> single-frame
    refpoint reshaping and shape-mismatch skipping."""
    import numpy as np

    from ..utils.checkpoint_convert import (
        convert_decoder,
        convert_encoder,
        convert_ssm_encoder,
        load_torch_state_dict,
    )

    sd = load_torch_state_dict(pretrain_path)
    m = cfg.CONFIG.MODEL
    donor: dict = {}
    try:
        enc_type = m.get("ENCODER_TYPE", "attention")
        if enc_type == "attention":
            convert_encoder(sd, donor, "transformer/encoder",
                            "transformer.encoder", m.ENC_LAYERS)
        else:
            convert_ssm_encoder(sd, donor, "transformer/encoder",
                                "transformer.encoder", m.ENC_LAYERS, enc_type)
        convert_decoder(sd, donor, "transformer/decoder",
                        "transformer.decoder", m.DEC_LAYERS,
                        m.BBOX_EMBED_DIFF_EACH_LAYER)
        if "transformer.level_embed" in sd:
            donor["transformer"]["level_embed"] = sd["transformer.level_embed"]
    except KeyError as e:
        print(f"load_detr_weights: donor missing {e}; partial transplant")

    if "refpoint_embed.weight" in sd:
        v = sd["refpoint_embed.weight"]
        t, nq = m.TEMP_LEN, m.QUERY_NUM
        target = np.asarray(
            jax.tree_util.tree_leaves(
                {"r": params["params"]["refpoint_embed"]}
            )[0]
        )
        if m.SINGLE_FRAME and target.shape[0] < v.shape[0]:
            v = v.reshape(t, nq, 4)[t // 2]
        elif not m.SINGLE_FRAME and target.shape[0] > v.shape[0]:
            v = np.tile(v[:nq], (t, 1))
        donor["refpoint_embed"] = v

    def merge(dst, src, path=""):
        used, skipped = 0, 0
        for k, v in src.items():
            if k not in dst:
                skipped += 1
                continue
            if isinstance(v, dict):
                u, s = merge(dst[k], v, f"{path}/{k}")
                used += u
                skipped += s
            else:
                if tuple(np.shape(dst[k])) == tuple(np.shape(v)):
                    dst[k] = jnp.asarray(v)
                    used += 1
                else:
                    print(f"Skip loading parameter {path}/{k}: "
                          f"{np.shape(v)} vs {np.shape(dst[k])}")
                    skipped += 1
        return used, skipped

    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    import copy as _copy

    new_params = _copy.deepcopy(jax.device_get(params))
    used, skipped = merge(new_params["params"], donor)
    print(f"load_detr_weights: {used} tensors transplanted, {skipped} skipped")
    return new_params


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
    if isinstance(restored, dict) and "opt_state" in restored:
        # a full TrainState checkpoint: its .params IS the variables dict
        restored = restored["params"]
    if isinstance(restored, dict) and set(restored.keys()) == {"params"}:
        return restored
    if isinstance(restored, dict) and "params" in restored:
        return {"params": restored["params"]}
    return restored
