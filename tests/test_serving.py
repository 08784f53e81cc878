"""Serving-pipeline tests: device-side bbox/crop correctness and the full
frame->refined-pose path on synthetic scenes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scflow_tpu.refiners import SCFlowRefiner
from scflow_tpu.refiners.system import RenderAssets
from scflow_tpu.render.meshbank import make_synthetic_bank
from scflow_tpu.render.renderer import Renderer
from scflow_tpu.serving import (
    crop_resize_patches,
    make_serving_fn,
    project_bboxes,
)


@pytest.fixture(scope="module")
def scene():
    bank = make_synthetic_bank(2, kind="sphere", subdivisions=2, size=70.0)
    ra = RenderAssets.from_bank(bank)
    return bank, ra


class TestDevicePreprocessing:
    def test_project_bboxes_contains_render(self, scene):
        bank, ra = scene
        renderer = Renderer(bank=bank, image_size=(128, 160), chunk=16)
        n = 2
        K = np.tile(np.array([[[150.0, 0, 80], [0, 150.0, 64], [0, 0, 1]]], np.float32), (n, 1, 1))
        R = np.tile(np.eye(3, dtype=np.float32)[None], (n, 1, 1))
        t = np.array([[10, 0, 500], [-20, 5, 600]], np.float32)
        labels = np.array([0, 1])
        boxes = np.asarray(
            project_bboxes(ra.verts, ra.vert_valid, jnp.asarray(R), jnp.asarray(t),
                           jnp.asarray(K), jnp.asarray(labels))
        )
        masks = np.asarray(renderer(R, t, K, labels)["masks"])
        for i in range(n):
            ys, xs = np.nonzero(masks[i])
            assert boxes[i, 0] <= xs.min() + 1 and boxes[i, 2] >= xs.max() - 1
            assert boxes[i, 1] <= ys.min() + 1 and boxes[i, 3] >= ys.max() - 1

    def test_crop_resize_matches_cv2(self, rng):
        import cv2

        frame = rng.uniform(0, 1, (120, 160, 3)).astype(np.float32)
        box = np.array([[40.0, 30.0, 90.0, 86.0]], np.float32)
        K = np.array([[[150.0, 0, 80], [0, 150.0, 60], [0, 0, 1]]], np.float32)
        out = 64
        patches, newK = crop_resize_patches(
            jnp.asarray(frame[None]), jnp.asarray(box), jnp.asarray([0]),
            jnp.asarray(K), out_size=out, margin=1.0,
        )
        patches = np.asarray(patches)
        # cv2 oracle: crop the square box and resize (bilinear)
        cx, cy = 65.0, 58.0
        side = 56.0
        x1, y1 = cx - side / 2, cy - side / 2
        # pixel-center sampling convention (cv2.resize-style):
        # src = x1 + (p + 0.5) * side/out - 0.5  ->  dst = a*src + b
        a = out / side
        bx = -(x1 - 0.5) * a - 0.5
        by = -(y1 - 0.5) * a - 0.5
        M = np.array([[a, 0, bx], [0, a, by]], np.float32)
        expect = cv2.warpAffine(frame, M, (out, out), flags=cv2.INTER_LINEAR)
        diff = np.abs(patches[0] - expect)
        # interiors match (borders differ by padding convention)
        assert diff[4:-4, 4:-4].max() < 0.02
        # intrinsic adaptation: projecting with newK lands where the patch shows it
        np.testing.assert_allclose(np.asarray(newK)[0, 0, 0], 150.0 * out / side, rtol=1e-5)

    def test_intrinsic_adaptation_consistency(self, scene):
        """Render with original K on the full frame and with adapted K' on the
        patch: the patch render must match the cropped full render."""
        bank, ra = scene
        n = 1
        K = np.array([[[150.0, 0, 80], [0, 150.0, 64], [0, 0, 1]]], np.float32)
        R = np.tile(np.eye(3, dtype=np.float32)[None], (n, 1, 1))
        t = np.array([[0, 0, 500]], np.float32)
        labels = np.array([0])
        full = Renderer(bank=bank, image_size=(128, 160), chunk=16)(R, t, K, labels)
        frame = np.asarray(full["images"])  # (1, 128, 160, 3)
        boxes = project_bboxes(ra.verts, ra.vert_valid, jnp.asarray(R),
                               jnp.asarray(t), jnp.asarray(K), jnp.asarray(labels))
        patches, newK = crop_resize_patches(
            jnp.asarray(frame), boxes, jnp.asarray([0]), jnp.asarray(K),
            out_size=64, margin=1.1,
        )
        re_render = Renderer(bank=bank, image_size=(64, 64), chunk=16)(
            R, t, np.asarray(newK), labels
        )
        a = np.asarray(patches[0])
        b = np.asarray(re_render["images"][0])
        fg = np.asarray(re_render["masks"][0]) > 0
        # same object, same pose, same intrinsics -> high overlap
        inner = fg[2:-2, 2:-2]
        diff = np.abs(a[2:-2, 2:-2] - b[2:-2, 2:-2])[inner]
        assert np.median(diff) < 0.15


class TestServingEndToEnd:
    def test_serve_full_path(self, scene):
        bank, ra = scene
        model = SCFlowRefiner(
            iters=2,
            pose_head_cfg=dict(type="MultiClassPoseHead", num_class=2, in_channels=224),
        )
        serve = make_serving_fn(
            model, ra, ra.verts, ra.vert_valid, image_size=64,
        )
        rng = np.random.default_rng(0)
        from scipy.spatial.transform import Rotation

        K = np.tile(np.array([[[150.0, 0, 80], [0, 150.0, 64], [0, 0, 1]]], np.float32), (2, 1, 1))
        gt_R = Rotation.random(2, random_state=1).as_matrix().astype(np.float32)
        gt_t = np.array([[15, 0, 500], [-20, 5, 560]], np.float32)
        labels = np.array([0, 1], np.int32)
        frame = Renderer(bank=bank, image_size=(128, 160), chunk=16)(
            gt_R, gt_t, K, labels
        )
        # composite both objects into one frame
        imgs = np.asarray(frame["images"])
        masks = np.asarray(frame["masks"])
        scene_img = np.full((128, 160, 3), 0.4, np.float32)
        for i in range(2):
            m = masks[i] > 0
            scene_img[m] = imgs[i][m]

        ref_R = gt_R.copy()
        ref_t = gt_t + np.array([[3, -3, 10], [-4, 2, -8]], np.float32)
        key = jax.random.PRNGKey(0)
        variables = model.init(
            key, jnp.zeros((2, 64, 64, 3)), jnp.zeros((2, 64, 64, 3)),
            jnp.asarray(ref_R), jnp.asarray(ref_t), jnp.zeros((2, 64, 64)),
            jnp.asarray(K), jnp.asarray(labels),
        )
        out = serve(
            variables,
            jnp.asarray(scene_img[None] * 255.0),
            jnp.zeros((2,), jnp.int32),
            jnp.asarray(ref_R), jnp.asarray(ref_t), jnp.asarray(K),
            jnp.asarray(labels),
        )
        # zero-init pose head -> output == reference poses, in the ORIGINAL
        # camera frame (adapt_intrinsic needs no remap)
        np.testing.assert_allclose(np.asarray(out["rotations"]), ref_R, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out["translations"]), ref_t, rtol=1e-4)
