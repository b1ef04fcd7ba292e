"""Training engine: masked AdamW, phase machine, jitted steps, trainer."""

from .checkpoint import (load_backbone_only, restore_checkpoint,
                         save_checkpoint)
from .optimizer import (AdamState, Phase, adam_init, adam_update,
                        cosine_annealing, cosine_warm_restarts,
                        group_trainable, label_params, phase_for_epoch)
from .step import (Scalars, StepStatics, TrainState, init_train_state,
                   make_eval_step, make_train_step, reinit_optimizer)
from .trainer import Trainer

__all__ = [
    "AdamState", "Phase", "adam_init", "adam_update", "cosine_annealing",
    "cosine_warm_restarts", "group_trainable", "label_params",
    "phase_for_epoch", "Scalars", "StepStatics", "TrainState",
    "init_train_state", "make_eval_step", "make_train_step",
    "reinit_optimizer", "Trainer", "save_checkpoint", "restore_checkpoint",
    "load_backbone_only",
]
