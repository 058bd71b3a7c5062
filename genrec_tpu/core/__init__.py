from .train_state import TrainState, apply_updates, make_optimizer, make_schedule
from .engine import (Engine, StepTimer, device_metrics_to_host, make_eval_step,
                     make_train_step)
from .checkpoint import (CheckpointManager, load_rqvae_artifact,
                         save_rqvae_artifact)
from .logging import MetricLogger, setup_logger

__all__ = [
    "TrainState", "apply_updates", "make_optimizer", "make_schedule",
    "Engine", "StepTimer", "device_metrics_to_host", "make_eval_step",
    "make_train_step",
    "CheckpointManager", "load_rqvae_artifact", "save_rqvae_artifact",
    "MetricLogger", "setup_logger",
]
