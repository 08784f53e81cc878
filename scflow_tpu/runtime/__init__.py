from scflow_tpu.runtime.optim import build_optimizer, onecycle_lr
from scflow_tpu.runtime.train_state import TrainState
from scflow_tpu.runtime.checkpoint import CheckpointManager, save_params, load_params
from scflow_tpu.runtime.runner import (
    IterRunner,
    Hook,
    TextLoggerHook,
    CheckpointHook,
    EvalHook,
    ProfileHook,
    TensorboardHook,
)
from scflow_tpu.runtime.convert_torch import (
    convert_torch_checkpoint,
    convert_state_dict_to_variables,
    duplicate_mmflow_encoder,
    load_torch_state_dict,
)

__all__ = [
    "build_optimizer",
    "onecycle_lr",
    "TrainState",
    "CheckpointManager",
    "save_params",
    "load_params",
    "IterRunner",
    "Hook",
    "TextLoggerHook",
    "CheckpointHook",
    "EvalHook",
    "ProfileHook",
    "TensorboardHook",
    "convert_torch_checkpoint",
    "convert_state_dict_to_variables",
    "duplicate_mmflow_encoder",
    "load_torch_state_dict",
]
