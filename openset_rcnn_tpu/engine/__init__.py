from .optimizer import build_optimizer, trainable_mask, warmup_multistep_schedule
from .train_state import TrainState, create_train_state, make_scan_train_step, make_train_step
