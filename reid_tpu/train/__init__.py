from .schedules import (
    warmup_cosine_schedule,
    warmup_multistep_schedule,
    warmup_linear_hold_schedule,
)
from .state import ReIDTrainState, create_train_state
from .steps import eval_step, make_train_step
