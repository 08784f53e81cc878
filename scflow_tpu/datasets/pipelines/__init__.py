from scflow_tpu.datasets.pipelines.formatting import Compose, Collect, ToArray
from scflow_tpu.datasets.pipelines.loading import LoadImages, LoadMasks
from scflow_tpu.datasets.pipelines.jitter import PoseJitter
from scflow_tpu.datasets.pipelines.geometry import (
    ComputeBbox,
    Crop,
    Resize,
    Pad,
    RemapPose,
    ProjectKeypoints,
)
from scflow_tpu.datasets.pipelines.color import (
    RandomHSV,
    RandomNoise,
    RandomSmooth,
    RandomSharpness,
    RandomGray,
    RandomBackground,
    RandomOcclusion,
    Normalize,
)
from scflow_tpu.registry import PIPELINES

__all__ = [
    "Compose", "Collect", "ToArray",
    "LoadImages", "LoadMasks", "PoseJitter",
    "ComputeBbox", "Crop", "Resize", "Pad", "RemapPose", "ProjectKeypoints",
    "RandomHSV", "RandomNoise", "RandomSmooth", "RandomSharpness",
    "RandomGray", "RandomBackground", "RandomOcclusion", "Normalize",
    "PIPELINES",
]
