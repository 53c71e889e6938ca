from seghiero_tpu.train.optim import make_optimizer
from seghiero_tpu.train.trainer import Trainer, TrainState, make_train_step, make_eval_step
from seghiero_tpu.train.metrics import SegMetrics
from seghiero_tpu.train.checkpoint import CheckpointManager

__all__ = [
    "make_optimizer",
    "Trainer",
    "TrainState",
    "make_train_step",
    "make_eval_step",
    "SegMetrics",
    "CheckpointManager",
]
