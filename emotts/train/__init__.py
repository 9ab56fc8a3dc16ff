from emotts.train.checkpoint import CheckpointManager, load_best_params
from emotts.train.metrics import EpochAverager, MetricsWriter, StepTimer
from emotts.train.state import TrainState, create_train_state, make_optimizer

__all__ = [
    "CheckpointManager",
    "load_best_params",
    "EpochAverager",
    "MetricsWriter",
    "StepTimer",
    "TrainState",
    "create_train_state",
    "make_optimizer",
]
