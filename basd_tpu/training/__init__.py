from basd_tpu.training.schedulefree import (
    ScheduleFreeConfig,
    ScheduleFreeState,
    eval_params,
    train_params,
)
from basd_tpu.training.trainer import Trainer

__all__ = [
    "ScheduleFreeConfig",
    "ScheduleFreeState",
    "Trainer",
    "eval_params",
    "train_params",
]
