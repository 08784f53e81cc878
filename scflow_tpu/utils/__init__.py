from scflow_tpu.utils.logging import get_logger
from scflow_tpu.utils.timer import StageTimer

__all__ = ["get_logger", "StageTimer"]
