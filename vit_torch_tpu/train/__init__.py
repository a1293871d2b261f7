from vit_torch_tpu.train.trainer import Trainer
from vit_torch_tpu.train.optimizers import get_optimizer, OPTIMIZERS
from vit_torch_tpu.train.schedules import get_lr_factor_fn
from vit_torch_tpu.train.steps import (
    TrainState, create_train_state, make_train_step, make_eval_step,
    set_learning_rate, split_params,
)
