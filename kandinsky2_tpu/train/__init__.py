from .ema import ema_update
from .resample import (
    LossAwareState,
    init_loss_aware,
    loss_aware_sample,
    loss_aware_update,
    loss_aware_weights,
    uniform_sample,
)
