from scflow_tpu.datasets.mask import BitmapMasks
from scflow_tpu.datasets.base import BaseDataset, ConcatDataset
from scflow_tpu.datasets.supervise import SuperviseTrainDataset
from scflow_tpu.datasets.refine import RefineDataset, RefineTestDataset
from scflow_tpu.datasets.loader import DataLoader, collate_batch
from scflow_tpu.registry import DATASETS, build_dataset

__all__ = [
    "BitmapMasks",
    "BaseDataset",
    "ConcatDataset",
    "SuperviseTrainDataset",
    "RefineDataset",
    "RefineTestDataset",
    "DataLoader",
    "collate_batch",
    "DATASETS",
    "build_dataset",
]
