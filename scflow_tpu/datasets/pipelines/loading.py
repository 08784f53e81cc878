"""Image/mask loading transforms (reference datasets/pipelines/loadding.py)."""

import cv2
import numpy as np

from scflow_tpu.datasets.mask import BitmapMasks
from scflow_tpu.registry import PIPELINES

_FLAGS = {
    "color": cv2.IMREAD_COLOR,
    "grayscale": cv2.IMREAD_GRAYSCALE,
    "unchanged": cv2.IMREAD_UNCHANGED,
}


@PIPELINES.register_module("LoadImages")
class LoadImages:
    def __init__(self, color_type="color", to_float32=False, file_client_args=None):
        self.color_type = color_type
        self.to_float32 = to_float32

    def __call__(self, results):
        img = cv2.imread(results["img_path"], _FLAGS[self.color_type])
        if img is None:
            raise FileNotFoundError(results["img_path"])
        if img.ndim == 2:
            img = img[..., None].repeat(3, axis=-1)
        if self.to_float32:
            img = img.astype(np.float32)
        results["img"] = img
        results["img_shape"] = img.shape
        results["ori_shape"] = img.shape
        return results


@PIPELINES.register_module("LoadMasks")
class LoadMasks:
    def __init__(self, binarize=True, merge=False, file_client_args=None, eps=1e-5):
        self.binarize = binarize
        self.eps = eps

    def __call__(self, results):
        height, width = results["img_shape"][:2]
        masks = []
        for path in results["gt_mask_path"]:
            m = cv2.imread(path, cv2.IMREAD_UNCHANGED)
            if m is None:
                raise FileNotFoundError(path)
            if m.ndim == 3:
                m = m[..., 0]
            if self.binarize:
                mx = m.max()
                m = np.zeros_like(m) if mx < self.eps else (m / mx).astype(m.dtype)
            masks.append(m)
        results["gt_masks"] = BitmapMasks(masks, height, width)
        return results
