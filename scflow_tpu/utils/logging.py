"""Logger setup (reference: mmcv get_root_logger 'Flow-6D', train.py:112-114)."""

import logging
import os
import time
from typing import Optional

_LOGGERS = {}


def get_logger(name: str = "scflow_tpu", log_file: Optional[str] = None,
               level=logging.INFO):
    if name in _LOGGERS:
        return _LOGGERS[name]
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.propagate = False
    fmt = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
    )
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    _LOGGERS[name] = logger
    return logger


def timestamped_log_file(work_dir: str) -> str:
    ts = time.strftime("%Y%m%d_%H%M%S", time.localtime())
    return os.path.join(work_dir, f"{ts}.log")
