"""Training: jitted step, optax optimizer/schedule, Orbax checkpoints."""

from .step import TrainState, make_optimizer, make_train_step, make_eval_step  # noqa: F401
from . import checkpoint  # noqa: F401
from .trainer import train  # noqa: F401
