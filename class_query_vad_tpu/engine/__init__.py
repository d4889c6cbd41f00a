from .checkpoint import load_checkpoint, load_pretrained_params, save_checkpoint  # noqa: F401
from .evaluate import run_validation  # noqa: F401
from .train import (  # noqa: F401
    TrainState,
    backbone_freeze_labels,
    create_train_state,
    make_optimizer,
    make_train_step,
)
