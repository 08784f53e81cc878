"""Visualization helpers: pose overlays (points/axes/contours/keypoints),
optical-flow color wheels for tensorboard panels (reference tools/visualize.py
and mmcv.flow2rgb)."""

from typing import Sequence

import cv2
import numpy as np

from scflow_tpu.geometry.host import project_3d_point


def flow2rgb(flow: np.ndarray, unknown_thr: float = 1e6) -> np.ndarray:
    """(H, W, 2) flow -> (H, W, 3) float RGB in [0, 1] (mmcv color wheel
    semantics: hue = direction, saturation = magnitude)."""
    fx, fy = flow[..., 0], flow[..., 1]
    unknown = (np.abs(fx) > unknown_thr) | (np.abs(fy) > unknown_thr) | ~np.isfinite(fx) | ~np.isfinite(fy)
    fx = np.where(unknown, 0, fx)
    fy = np.where(unknown, 0, fy)
    mag = np.sqrt(fx**2 + fy**2)
    ang = np.arctan2(-fy, -fx) / np.pi  # [-1, 1]
    hsv = np.zeros(flow.shape[:2] + (3,), np.float32)
    hsv[..., 0] = (ang + 1) * 90  # hue in [0, 180) cv2 convention
    maxm = mag.max() if mag.max() > 0 else 1.0
    hsv[..., 1] = np.clip(mag / maxm, 0, 1) * 255
    hsv[..., 2] = 255
    rgb = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB).astype(np.float32) / 255.0
    rgb[unknown] = 0
    return rgb


def imshow_projected_points(img, points_3d, K, R, t, color=(0, 255, 0),
                            radius: int = 1):
    """Draw mesh points projected under a pose."""
    out = np.ascontiguousarray(img.copy())
    pts = project_3d_point(points_3d, K, R, t)
    h, w = out.shape[:2]
    for x, y in pts.astype(int):
        if 0 <= x < w and 0 <= y < h:
            cv2.circle(out, (int(x), int(y)), radius, color, -1)
    return out


def imshow_pose_axis(img, K, R, t, axis_len: float = 80.0, thickness: int = 2):
    """Draw the object frame axes (x red, y green, z blue)."""
    out = np.ascontiguousarray(img.copy())
    origin_axes = np.array(
        [[0, 0, 0], [axis_len, 0, 0], [0, axis_len, 0], [0, 0, axis_len]],
        np.float32,
    )
    pts = project_3d_point(origin_axes, K, R, t).astype(int)
    colors = [(0, 0, 255), (0, 255, 0), (255, 0, 0)]  # BGR
    for i, c in enumerate(colors):
        cv2.line(out, tuple(pts[0]), tuple(pts[i + 1]), c, thickness)
    return out


def imshow_pose_contour(img, mask: np.ndarray, color=(0, 255, 0), thickness=2):
    """Overlay the silhouette contour of a rendered mask."""
    out = np.ascontiguousarray(img.copy())
    contours, _ = cv2.findContours(
        (mask > 0).astype(np.uint8), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
    )
    cv2.drawContours(out, contours, -1, color, thickness)
    return out


def imshow_2d_keypoints(img, keypoints_2d, color=(255, 0, 0), radius=3,
                        connect_box=True):
    """Draw 2D keypoints; if 8 points, connect them as a 3D box wireframe."""
    out = np.ascontiguousarray(img.copy())
    kps = np.asarray(keypoints_2d).astype(int)
    for x, y in kps:
        cv2.circle(out, (int(x), int(y)), radius, color, -1)
    if connect_box and len(kps) == 8:
        # bbox corner ordering from collect_3d_keypoints: x-major binary
        edges = [
            (0, 1), (0, 2), (3, 1), (3, 2),
            (4, 5), (4, 6), (7, 5), (7, 6),
            (0, 4), (1, 5), (2, 6), (3, 7),
        ]
        for a, b in edges:
            cv2.line(out, tuple(kps[a]), tuple(kps[b]), color, 1)
    return out


def make_grid(images: Sequence[np.ndarray], cols: int = 4, pad: int = 2) -> np.ndarray:
    """Tile images (same HxWx3) into a grid."""
    n = len(images)
    cols = min(cols, n)
    rows = (n + cols - 1) // cols
    h, w = images[0].shape[:2]
    grid = np.zeros((rows * (h + pad), cols * (w + pad), 3), images[0].dtype)
    for i, img in enumerate(images):
        r, c = divmod(i, cols)
        grid[r * (h + pad) : r * (h + pad) + h, c * (w + pad) : c * (w + pad) + w] = img
    return grid


def simple_forward_warp(image, flow, mask, background=(0.5, 0.5, 0.5)):
    """Forward-splat `image` (H, W, 3) by `flow` (H, W, 2) at masked pixels —
    the reference's debug visualization of flow alignment
    (models/utils/utils.py:81-97): nearest-pixel scatter, truncating target
    coordinates like the torch .to(int64) cast, unfilled pixels = background.
    Host-side numpy; debug/TB panels only."""
    h, w = image.shape[:2]
    out = np.empty_like(image)
    out[...] = np.asarray(background, image.dtype)
    ys, xs = np.nonzero(mask > 0.5)
    if len(ys):
        wx = np.clip(xs + flow[ys, xs, 0], 0, w - 1).astype(np.int64)
        wy = np.clip(ys + flow[ys, xs, 1], 0, h - 1).astype(np.int64)
        out[wy, wx] = image[ys, xs]
    return out
