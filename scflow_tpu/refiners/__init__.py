from scflow_tpu.refiners.scflow import SCFlowRefiner
from scflow_tpu.refiners.raft import RAFTRefinerFlow, RAFTRefinerFlowMask
from scflow_tpu.refiners.build import build_refiner_from_config

__all__ = [
    "SCFlowRefiner",
    "RAFTRefinerFlow",
    "RAFTRefinerFlowMask",
    "build_refiner_from_config",
]
