"""Training/eval subsystem: optimizer, schedules, steps, checkpoints, metrics."""

from .schedule import lr_at_epoch, make_lr_schedule  # noqa: F401
from .step import TrainState, create_train_state, make_train_step, make_eval_step  # noqa: F401
from .metrics import evaluate_3d, evaluate_2d  # noqa: F401
