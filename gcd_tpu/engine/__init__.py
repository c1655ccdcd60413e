from gcd_tpu.engine.ema import EmaState, ema_init, ema_update, ema_swap
from gcd_tpu.engine import lr_schedule
from gcd_tpu.engine.engine import DiffusionEngine
from gcd_tpu.engine.trainer import (
    TrainState,
    create_train_state,
    train_step,
    make_jitted_train_step,
    setup_sharded_training,
)
