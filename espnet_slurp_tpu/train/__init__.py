"""Training runtime: state, optimizers, reporter, checkpointing, trainer."""
from .checkpoint import CheckpointManager  # noqa: F401
from .optim import OptimConfig, build_optimizer, build_schedule  # noqa: F401
from .reporter import Reporter, SubReporter  # noqa: F401
from .state import TrainState, make_eval_step, make_train_step  # noqa: F401
from .trainer import Trainer, TrainerOptions  # noqa: F401
