"""Image-classification config schema (reference
pipelines/image_classification_config.py — an unused sibling of the video
schema kept for surface parity; useful for backbone pre-training
experiments).  Same two-tree layout: DDP_CONFIG (closed) + CONFIG (open).
"""

from __future__ import annotations

from .node import CfgNode as CN

_C = CN()

_C.DDP_CONFIG = CN(
    dict(
        WORLD_SIZE=1,
        WORLD_RANK=0,
        GPU_WORLD_SIZE=8,
        GPU_WORLD_RANK=0,
        DIST_URL="tcp://127.0.0.1:10001",
        WORLD_URLS=["127.0.0.1"],
        AUTO_RANK_MATCH=True,
        DIST_BACKEND="nccl",
        GPU=0,
        DISTRIBUTED=True,
    ),
    new_allowed=False,
)

_C.CONFIG = CN(new_allowed=True)

_C.CONFIG.TRAIN = CN(
    dict(
        START_EPOCH=0,
        EPOCH_NUM=300,
        BATCH_SIZE=64,
        LR=5e-4,
        WEIGHT_DECAY=0.05,
        WARMUP_EPOCHS=5,
        WARMUP_START_LR=5e-7,
        MIN_LR=5e-6,
        OPTIMIZER=CN(dict(NAME="adamw", EPS=1e-8, MOMENTUM=0.9),
                     new_allowed=True),
        LR_SCHEDULER=CN(dict(NAME="cosine", DECAY_EPOCHS=30, DECAY_RATE=0.1),
                        new_allowed=True),
        USE_AMP=True,
    ),
    new_allowed=True,
)

_C.CONFIG.VAL = CN(dict(FREQ=2, BATCH_SIZE=64), new_allowed=True)

_C.CONFIG.DATA = CN(
    dict(
        TRAIN_ANNO_PATH="",
        VAL_ANNO_PATH="",
        TRAIN_DATA_PATH="",
        VAL_DATA_PATH="",
        NUM_CLASSES=1000,
        IMG_SIZE=224,
        NUM_WORKERS=8,
    ),
    new_allowed=True,
)

_C.CONFIG.MODEL = CN(
    dict(NAME="", PRETRAINED=False, PRETRAINED_PATH=""), new_allowed=True
)

_C.CONFIG.LOG = CN(
    dict(
        BASE_PATH="./logs",
        LOG_DIR="tb_log",
        SAVE_DIR="checkpoints",
        EXP_NAME="experiment",
        SAVE_FREQ=10,
        DISPLAY_FREQ=10,
        EVAL_DIR="",
    ),
    new_allowed=True,
)


def get_cfg_defaults():
    """Clone of the image-classification default tree."""
    return _C.clone()


def get_cfg_custom(cfg_file: str):
    cfg = get_cfg_defaults()
    cfg.merge_from_file(cfg_file)
    return cfg
