from scflow_tpu.runtime.optim import build_optimizer, onecycle_lr
from scflow_tpu.runtime.train_state import TrainState

__all__ = ["build_optimizer", "onecycle_lr", "TrainState"]
