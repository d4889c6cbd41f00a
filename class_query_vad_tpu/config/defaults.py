"""Default configuration schema.

Mirrors the reference two-tree yacs schema so the shipped
``configuration/*.yaml`` overlays load unchanged
(/root/reference/pipelines/video_action_recognition_config.py:8-202).
``DDP_CONFIG`` keys are kept for YAML compatibility; on TPU the distribution
layer maps them onto a ``jax.sharding.Mesh`` (see
class_query_vad_tpu/parallel/mesh.py) instead of NCCL process groups.
"""

from .node import CfgNode as CN

_C = CN()

# ---------------------------------------------------------------------------
# Distribution config (kept key-compatible with the reference launcher;
# reference semantics at /root/reference/pipelines/launch.py:23-59)
# ---------------------------------------------------------------------------
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

# ---------------------------------------------------------------------------
# Standard training/testing setting: CONFIG (new_allowed — YAMLs add keys
# such as MATCHER, LOSS_COFS, TRAIN, MAMBA freely)
# ---------------------------------------------------------------------------
_C.CONFIG = CN(new_allowed=True)

_C.CONFIG.EVAL_ONLY = False

_C.CONFIG.VAL = CN(dict(BATCH_SIZE=8), new_allowed=True)

_C.CONFIG.TRAIN = CN(
    dict(
        NUM_EPOCHS=12,
        BATCH_SIZE=2,
        LR=1e-4,
        GRAD_ACCUM=1,
        EVAL_FREQ=1,
        CLIP_GRAD_NORM=1.0,
        # optax schedule via utils/lr_scheduler (constant | cosine | linear
        # | step | multistep); the reference trains at constant LR
        LR_POLICY="constant",
        WARMUP_EPOCHS=0,
        MIN_LR=0.0,
    ),
    new_allowed=True,
)

_C.CONFIG.INFERENCE = CN(dict(FEAT=False), new_allowed=True)

_C.CONFIG.DATA = CN(
    dict(
        DATASET_NAME="ava",
        TRAIN_ANNO_PATH="",
        TRAIN_DATA_PATH="",
        VAL_ANNO_PATH="",
        VAL_DATA_PATH="",
        ANNO_PATH="",
        DATA_PATH="",
        LABEL_PATH="",
        NUM_CLASSES=80,
        MULTIGRID=False,
        CLIP_LEN=32,
        TEMP_LEN=32,
        FRAME_RATE=2,
        SPLIT=0,
        IMG_SIZE=256,
        IMG_RESHAPE_SIZE=288,
        KEEP_ASPECT_RATIO=False,
        NUM_SEGMENT=1,
        NUM_CROP=1,
        TEST_NUM_SEGMENT=10,
        TEST_NUM_CROP=3,
        CROP_SIZE=224,
        SHORT_SIDE_SIZE=256,
        NEW_HEIGHT=256,
        NEW_WIDTH=340,
        INTERPOLATION="bicubic",
        # TPU-specific: maximum ground-truth boxes per keyframe/frame once
        # ragged targets are packed into static-shape masked arrays.
        MAX_BOXES=32,
    ),
    new_allowed=True,
)

_C.CONFIG.AUG = CN(
    dict(
        COLOR_JITTER=0.4,
        AUTO_AUGMENT="rand-m9-mstd0.5-inc1",
        REPROB=0.25,
        REMODE="pixel",
        RECOUNT=1,
        MIXUP=0.8,
        CUTMIX=1.0,
        CUTMIX_MINMAX=None,
        MIXUP_PROB=1.0,
        MIXUP_SWITCH_PROB=0.5,
        MIXUP_MODE="batch",
        LABEL_SMOOTHING=0.1,
        REPEATED_AUG=True,
        TRAIN_PCA_EIGVAL=[0.225, 0.224, 0.229],
        TRAIN_PCA_EIGVEC=[
            [-0.5675, 0.7192, 0.4009],
            [-0.5808, -0.0045, -0.8140],
            [-0.5836, -0.6948, 0.4203],
        ],
    ),
    new_allowed=True,
)

_C.CONFIG.MODEL = CN(
    dict(
        NAME="",
        LOAD=False,
        LOAD_FC=True,
        LOAD_DETR=False,
        PRETRAINED_PATH="",
        PRETRAINED=False,
        PRETRAINED_BASE=True,
        PRETRAIN_BACKBONE_DIR="",
        PRETRAIN_TRANSFORMER_DIR="",
        BN_EVAL=False,
        PARTIAL_BN=False,
        BN_FROZEN=False,
        USE_AFFINE=False,
        DROP_RATE=0.0,
        DROP_PATH_RATE=0.1,
        TUNE_POINT=4,
        SINGLE_FRAME=False,
        BACKBONE_NAME="ViT",
        ENC_LAYERS=6,
        DEC_LAYERS=6,
        D_MODEL=256,
        NHEAD=8,
        DIM_FEEDFORWARD=2048,
        QUERY_NUM=15,
        NORMALIZE_BEFORE=False,
        DROPOUT=0.1,
        DS_RATE=8,
        TEMP_LEN=32,
        SAMPLE_RATE=1,
        POSITION_EMBEDDING="sine",
        NUM_FEATURE_LEVELS=4,
        NUM_ENC_N_POINTS=8,
        BBOX_EMBED_DIFF_EACH_LAYER=False,
        LABEL_SMOOTHING_ALPHA=0.1,
        LAST_STRIDE=True,
        GENERATE_LFB=False,
        TEMPORAL_DS_STRATEGY="decode",
        ENCODER_TYPE="attention",
        FAST_RADIUS=1,
        FAST_DTYPE="float32",
        FAST_WINDOW="3d",
        FAST_CROSS_LEVEL="resample",
        DECODER_TYPE="attention",
        DECODER_DTYPE="float32",
        RETURN_INTERM_LAYERS=True,
    ),
    new_allowed=True,
)

_C.CONFIG.ViT = CN(
    dict(
        TUBELET_SIZE=2,
        PATCH_SIZE=16,
        IN_CHANS=3,
        EMBED_DIM=768,
        PRETRAIN_IMG_SIZE=224,
        USE_LEARNABLE_POS_EMB=False,
        DROP_RATE=0.0,
        ATTN_DROP_RATE=0.0,
        DROP_PATH_RATE=0.2,
        DEPTH=12,
        NUM_HEADS=12,
        MLP_RATIO=4,
        QKV_BIAS=True,
        QK_SCALE=None,
        INIT_VALUES=0.0,
        USE_CHECKPOINT=True,
        LAYER_DECAY=0.75,
        WEIGHT_DECAY=0.05,
        NO_WEIGHT_DECAY=["pos_embed"],
    ),
    new_allowed=True,
)

_C.CONFIG.MATCHER = CN(
    dict(COST_CLASS=4.0, COST_BBOX=5.0, COST_GIOU=2.0, BNY_LOSS=True, BEFORE=False),
    new_allowed=True,
)

_C.CONFIG.LOSS_COFS = CN(
    dict(
        MASK_COF=1.0,
        DICE_COF=4.0,
        BBOX_COF=5.0,
        GIOU_COF=2.0,
        PERSON_COF=1.0,
        EOS_COF=0.1,
        WEIGHT=10.0,
        CLIPS_MAX_NORM=0.1,
    ),
    new_allowed=True,
)

_C.CONFIG.MAMBA = CN(new_allowed=True)

_C.CONFIG.LOG = CN(
    dict(
        BASE_PATH="",
        EXP_NAME="use_time",
        LOG_DIR="tb_log",
        SAVE_DIR="checkpoints",
        EVAL_DIR="",
        RES_DIR="res",
        SAVE_FREQ=1,
        DISPLAY_FREQ=1,
    ),
    new_allowed=True,
)

_C.CONFIG.GRADIENT_CHECKPOINTING = False
_C.CONFIG.AMP = False

# TPU runtime knobs (no reference counterpart; consumed by parallel/).
_C.CONFIG.TPU = CN(
    dict(
        MESH_SHAPE=[-1],          # -1 = all devices on the data axis
        MESH_AXES=["data"],
        COMPUTE_DTYPE="bfloat16", # replaces torch AMP fp16 autocast
        PARAM_DTYPE="float32",
        REMAT=False,              # jax.checkpoint on encoder/decoder layers
    ),
    new_allowed=True,
)


def get_cfg_defaults() -> CN:
    """Return a fresh clone of the default config tree."""
    return _C.clone()


def get_cfg_custom(cfg_file: str | None = None, opts=None) -> CN:
    cfg = get_cfg_defaults()
    if cfg_file:
        cfg.merge_from_file(cfg_file)
    if opts:
        cfg.merge_from_list(list(opts))
    return cfg
