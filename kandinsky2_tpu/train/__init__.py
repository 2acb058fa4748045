from .distill import DistillState, init_distill_state, make_distill_step
from .ema import ema_update
from .train_lora import (
    LoraTrainState,
    init_lora_train_state,
    make_lora_train_step,
    make_sp_lora_train_fn,
    unet22_eps_fn,
)
from .resample import (
    LossAwareState,
    init_loss_aware,
    loss_aware_sample,
    loss_aware_update,
    loss_aware_weights,
    uniform_sample,
)
