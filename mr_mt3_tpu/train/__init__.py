"""Training: losses, optimizer schedules, sharded train step, loop."""

from mr_mt3_tpu.train.losses import (
    cross_entropy_loss,
    weighted_instrument_loss,
)
from mr_mt3_tpu.train.optim import (
    cosine_schedule_with_warmup,
    make_optimizer,
)
from mr_mt3_tpu.train.trainer import TrainState, Trainer, make_train_step
