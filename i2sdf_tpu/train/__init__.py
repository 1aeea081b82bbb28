from .state import TrainState, create_train_state, make_lr_schedule
from .step import make_eval_render_fn, make_train_step

__all__ = [
    "TrainState", "create_train_state", "make_lr_schedule",
    "make_train_step", "make_eval_render_fn",
]
