"""Unit tests for pipeline transform value semantics (reference
datasets/pipelines/geometry_transform.py + color_transform.py).

The flagship invariant: the accumulated per-object transform matrix must
faithfully map original-image pixel coordinates to patch coordinates —
`patch[T(p)] == original[p]` — because RemapPose('adapt_intrinsic')
computes K' = T·K from it and every downstream pose is only as correct as
that matrix chain.
"""

import numpy as np
import pytest

from scflow_tpu.datasets.pipelines.color import Normalize
from scflow_tpu.datasets.pipelines.geometry import Crop, Pad, Resize


def coord_image(h, w):
    """Pixel (x, y) encoded in channels 0/1 — sampling it reads back the
    source coordinate."""
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([xx, yy, np.zeros_like(xx)], -1).astype(np.float32)


def make_results(img, bbox):
    return {
        "img": img,
        "labels": np.array([0], np.int32),
        "ref_bboxes": np.array([bbox], np.float32),
        "bbox_fields": [],
        "mask_fields": [],
    }


class TestTransformMatrixChain:
    @pytest.mark.parametrize("center_pad", [False, True])
    def test_crop_resize_pad_matrix_maps_pixels(self, center_pad):
        h, w = 120, 160
        img = coord_image(h, w)
        results = make_results(img, [40, 30, 90, 80])
        results = Crop(size_range=(1.0, 1.0), keep_ratio=False,
                       aspect_ratio=1.0)(results)
        results = Resize(img_scale=64, keep_ratio=True)(results)
        results = Pad(size=(64, 64), center=center_pad,
                      pad_val=dict(img=128, mask=0))(results)
        T = results["transform_matrix"][0]
        patch = results["img"][0]
        assert patch.shape[:2] == (64, 64)
        # probe interior original pixels: T maps them into the patch, and
        # the patch pixel must read back the original coordinate
        for ox, oy in [(50, 40), (65, 55), (80, 70)]:
            u, v, s = T @ np.array([ox, oy, 1.0], np.float32)
            u, v = u / s, v / s
            ui, vi = int(round(u)), int(round(v))
            assert 0 <= ui < 64 and 0 <= vi < 64
            got = patch[vi, ui, :2]
            # the patch was resized: one patch pixel covers 1/scale source
            # pixels, so allow that much coordinate quantization
            scale = T[0, 0]
            assert np.all(np.abs(got - [ox, oy]) <= 1.0 / scale + 1e-3), (
                got, (ox, oy))

    def test_pad_value_and_region(self):
        img = np.full((20, 30, 3), 7, np.float32)
        results = make_results(img, [0, 0, 30, 20])
        results = Crop(size_range=(1.0, 1.0), keep_ratio=False)(results)
        results = Pad(size=(40, 40), center=True,
                      pad_val=dict(img=128, mask=0))(results)
        patch = results["img"][0]
        left, top, right, bottom = results["padding"][0]
        assert patch.shape[:2] == (40, 40)
        # interior keeps values, border is the pad value
        assert np.all(patch[top:40 - bottom, left:40 - right] == 7)
        assert np.all(patch[:top] == 128) and np.all(patch[:, :left] == 128)


class TestNormalize:
    def test_mean_std_and_bgr_to_rgb(self):
        img = np.zeros((2, 2, 3), np.float32)
        img[..., 0] = 10.0  # B
        img[..., 2] = 30.0  # R
        results = {
            "img": [img],
            "labels": np.array([0], np.int32),
        }
        out = Normalize(mean=[1.0, 2.0, 3.0], std=[2.0, 4.0, 5.0],
                        to_rgb=True)(results)
        got = out["img"][0]
        # channel 0 is now R: (30 - 1) / 2; channel 2 is B: (10 - 3) / 5
        np.testing.assert_allclose(got[0, 0], [(30 - 1) / 2.0,
                                               (0 - 2) / 4.0,
                                               (10 - 3) / 5.0])
        assert out["img_norm_cfg"]["to_rgb"] is True
