"""Image helpers replacing the mmcv ops used by the reference pipelines
(imcrop with padding, keep-ratio imrescale, impad)."""

from typing import Tuple

import cv2
import numpy as np


def imcrop_pad(img: np.ndarray, bbox, pad_val=0) -> np.ndarray:
    """Crop [x1, y1, x2, y2) (int, exclusive) allowing out-of-image regions,
    filled with pad_val (mmcv.imcrop(pad_fill=...) semantics)."""
    x1, y1, x2, y2 = [int(v) for v in bbox]
    h, w = img.shape[:2]
    ch, cw = max(y2 - y1, 1), max(x2 - x1, 1)
    shape = (ch, cw) + img.shape[2:]
    out = np.full(shape, pad_val, img.dtype)
    sx1, sy1 = max(x1, 0), max(y1, 0)
    sx2, sy2 = min(x2, w), min(y2, h)
    if sx2 > sx1 and sy2 > sy1:
        out[sy1 - y1 : sy2 - y1, sx1 - x1 : sx2 - x1] = img[sy1:sy2, sx1:sx2]
    return out


def rescale_factor(shape_hw: Tuple[int, int], scale) -> float:
    """mmcv.imrescale scale factor: fit the long edge to max(scale) and the
    short edge to min(scale)."""
    h, w = shape_hw
    if isinstance(scale, (tuple, list)):
        max_long, max_short = max(scale), min(scale)
    else:
        max_long = max_short = scale
    return min(max_long / max(h, w), max_short / min(h, w))


def imrescale(img: np.ndarray, scale, interpolation=cv2.INTER_LINEAR):
    f = rescale_factor(img.shape[:2], scale)
    h, w = img.shape[:2]
    new_w, new_h = int(w * f + 0.5), int(h * f + 0.5)
    out = cv2.resize(img, (new_w, new_h), interpolation=interpolation)
    return out, f


def imresize(img: np.ndarray, size_hw, interpolation=cv2.INTER_LINEAR):
    h, w = img.shape[:2]
    out = cv2.resize(img, (size_hw[1], size_hw[0]), interpolation=interpolation)
    return out, size_hw[1] / w, size_hw[0] / h


def impad(img: np.ndarray, padding: Tuple[int, int, int, int], pad_val=0):
    """padding = (left, top, right, bottom)."""
    left, top, right, bottom = [int(p) for p in padding]
    if img.ndim == 2:
        return np.pad(img, ((top, bottom), (left, right)), constant_values=pad_val)
    if isinstance(pad_val, (tuple, list)):
        h, w = img.shape[:2]
        out = np.empty((h + top + bottom, w + left + right, img.shape[2]), img.dtype)
        out[...] = np.asarray(pad_val, img.dtype)
        out[top : top + h, left : left + w] = img
        return out
    return np.pad(
        img, ((top, bottom), (left, right), (0, 0)), constant_values=pad_val
    )
