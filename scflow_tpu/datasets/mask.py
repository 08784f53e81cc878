"""Bitmap instance masks (numpy) — replaces the reference's mmcv-backed
BitmapMasks (datasets/mask.py:12-419) without the roi_align CUDA dependency.
Only the operations exercised by the shipped pipelines are implemented, plus
the utility methods the augmentations need."""

from typing import Tuple

import cv2
import numpy as np


class BitmapMasks:
    """masks: (N, H, W) uint8 array or list of (H, W) arrays."""

    def __init__(self, masks, height: int, width: int):
        self.height = height
        self.width = width
        if len(masks) == 0:
            self.masks = np.empty((0, height, width), dtype=np.uint8)
        else:
            if isinstance(masks, np.ndarray):
                assert masks.ndim == 3
                self.masks = masks.astype(np.uint8)
            else:
                flat = []
                for m in masks:
                    if isinstance(m, BitmapMasks):
                        flat.extend(list(m.masks))
                    else:
                        assert m.shape == (height, width), (m.shape, height, width)
                        flat.append(m)
                self.masks = np.stack(flat).astype(np.uint8)

    def __len__(self):
        return len(self.masks)

    def __getitem__(self, idx):
        m = self.masks[idx]
        if m.ndim == 2:
            return BitmapMasks(m[None], self.height, self.width)
        return BitmapMasks(m, self.height, self.width)

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    @property
    def areas(self) -> np.ndarray:
        return self.masks.sum(axis=(1, 2))

    def crop(self, bbox) -> "BitmapMasks":
        """Crop by [x1, y1, x2, y2]; out-of-image regions are zero-padded
        (clip_border=False crops may extend past the image)."""
        x1, y1, x2, y2 = [int(v) for v in bbox]
        w, h = max(x2 - x1, 1), max(y2 - y1, 1)
        out = np.zeros((len(self.masks), h, w), np.uint8)
        sx1, sy1 = max(x1, 0), max(y1, 0)
        sx2, sy2 = min(x2, self.width), min(y2, self.height)
        if sx2 > sx1 and sy2 > sy1:
            out[:, sy1 - y1 : sy2 - y1, sx1 - x1 : sx2 - x1] = self.masks[
                :, sy1:sy2, sx1:sx2
            ]
        return BitmapMasks(out, h, w)

    def rescale(self, scale, interpolation=cv2.INTER_NEAREST) -> "BitmapMasks":
        """Keep-ratio rescale to fit in `scale` (int or (h, w)), mmcv
        imrescale semantics."""
        if isinstance(scale, (tuple, list)):
            max_long, max_short = max(scale), min(scale)
        else:
            max_long = max_short = scale
        h, w = self.height, self.width
        factor = min(max_long / max(h, w), max_short / min(h, w))
        new_w, new_h = int(w * factor + 0.5), int(h * factor + 0.5)
        return self.resize((new_h, new_w), interpolation)

    def resize(self, out_shape, interpolation=cv2.INTER_NEAREST) -> "BitmapMasks":
        h, w = out_shape if isinstance(out_shape, (tuple, list)) else (out_shape, out_shape)
        if len(self.masks) == 0:
            return BitmapMasks([], h, w)
        resized = np.stack(
            [cv2.resize(m, (w, h), interpolation=interpolation) for m in self.masks]
        )
        return BitmapMasks(resized, h, w)

    def pad(self, padding: Tuple[int, int, int, int], pad_val=0) -> "BitmapMasks":
        """padding = (left, top, right, bottom); negative values crop."""
        left, top, right, bottom = [int(p) for p in padding]
        h = self.height + top + bottom
        w = self.width + left + right
        out = np.full((len(self.masks), h, w), pad_val, np.uint8)
        sy1, sx1 = max(-top, 0), max(-left, 0)
        sy2 = min(self.height, h - top)
        sx2 = min(self.width, w - left)
        dy1, dx1 = max(top, 0), max(left, 0)
        out[:, dy1 : dy1 + (sy2 - sy1), dx1 : dx1 + (sx2 - sx1)] = self.masks[
            :, sy1:sy2, sx1:sx2
        ]
        return BitmapMasks(out, h, w)

    def warpaffine(self, matrix2x3, width, height) -> "BitmapMasks":
        warped = [
            cv2.warpAffine(m, matrix2x3, (width, height), flags=cv2.INTER_NEAREST)
            for m in self.masks
        ]
        return BitmapMasks(warped, height, width)

    def get_bboxes(self) -> np.ndarray:
        boxes = []
        for m in self.masks:
            ys, xs = np.nonzero(m)
            if len(xs) == 0:
                boxes.append([0, 0, 0, 0])
            else:
                boxes.append([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
        return np.asarray(boxes, np.float32)

    def get_background_mask(self) -> np.ndarray:
        """(H, W) bool: True where NO instance is present."""
        return self.masks.sum(axis=0) == 0

    def merge_background_mask(self, occluder: np.ndarray) -> "BitmapMasks":
        """Remove occluded pixels from every instance mask."""
        new = self.masks * (occluder[None] == 0).astype(np.uint8)
        return BitmapMasks(new, self.height, self.width)

    def to_array(self, dtype=np.float32) -> np.ndarray:
        return self.masks.astype(dtype)
