"""Training subsystem: optimizer factory (reference recipes), pjit-ted
train/eval steps, Orbax checkpoint/resume with reference-parity state, and
the epoch/chunk orchestration loop."""

from cvcs_tpu.train.optim import build_optimizer, OptimizerBundle  # noqa: F401
from cvcs_tpu.train.state import TrainState, create_train_state  # noqa: F401
from cvcs_tpu.train.loop import Trainer, TrainConfig  # noqa: F401
