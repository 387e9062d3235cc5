"""Training stack: tasks, trainer, checkpoints, YAML CLI."""

from .tasks import Task, make_task
from .trainer import Trainer, TrainerConfig, TrainState
from .checkpoint import save_checkpoint, restore_checkpoint, load_variables

__all__ = [
    "Task",
    "make_task",
    "Trainer",
    "TrainerConfig",
    "TrainState",
    "save_checkpoint",
    "restore_checkpoint",
    "load_variables",
]
