"""On-device PnP tests: DLT/GN accuracy on clean + noisy data, RANSAC
robustness to outliers, agreement with cv2, and the RAFT flow->pose path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scflow_tpu.geometry.host import solve_pnp_ransac as cv2_pnp
from scflow_tpu.geometry.pnp import (
    pnp_dlt,
    refine_gauss_newton,
    solve_pnp_ransac_jax,
)


def make_pnp_problem(rng, n_points=64, noise_px=0.0, outlier_frac=0.0,
                     z=600.0):
    from scipy.spatial.transform import Rotation

    K = np.array([[320.0, 0, 128], [0, 320.0, 128], [0, 0, 1]], np.float32)
    R = Rotation.random(random_state=int(rng.integers(1 << 30))).as_matrix().astype(np.float32)
    t = np.array([rng.normal() * 30, rng.normal() * 30, z], np.float32)
    pts3d = rng.uniform(-50, 50, size=(n_points, 3)).astype(np.float32)
    cam = pts3d @ R.T + t
    uv = cam @ K.T
    pts2d = (uv[:, :2] / uv[:, 2:3]).astype(np.float32)
    if noise_px:
        pts2d += rng.normal(0, noise_px, pts2d.shape).astype(np.float32)
    n_out = int(outlier_frac * n_points)
    if n_out:
        idx = rng.choice(n_points, n_out, replace=False)
        pts2d[idx] += rng.uniform(30, 120, size=(n_out, 2)).astype(np.float32)
    return pts3d, pts2d, K, R, t


def rot_err_deg(a, b):
    cos = np.clip((np.trace(a.T @ b) - 1) / 2, -1, 1)
    return np.degrees(np.arccos(cos))


class TestDLT:
    def test_clean_exact(self, rng):
        pts3d, pts2d, K, R, t = make_pnp_problem(rng)
        Rp, tp = pnp_dlt(jnp.asarray(pts3d), jnp.asarray(pts2d), jnp.asarray(K))
        assert rot_err_deg(np.asarray(Rp), R) < 0.2
        np.testing.assert_allclose(np.asarray(tp), t, rtol=5e-3, atol=1.0)

    def test_gn_refine_improves_noisy(self, rng):
        pts3d, pts2d, K, R, t = make_pnp_problem(rng, noise_px=1.0)
        Rp, tp = pnp_dlt(jnp.asarray(pts3d), jnp.asarray(pts2d), jnp.asarray(K))
        Rr, tr = refine_gauss_newton(
            Rp, tp, jnp.asarray(pts3d), jnp.asarray(pts2d), jnp.asarray(K)
        )
        assert rot_err_deg(np.asarray(Rr), R) <= rot_err_deg(np.asarray(Rp), R) + 0.1
        assert rot_err_deg(np.asarray(Rr), R) < 1.5
        assert np.linalg.norm(np.asarray(tr) - t) < 10.0


def make_planar_problem(rng, n_points=64, noise_px=0.0):
    """Points on an arbitrary 3D plane — the DLT-degenerate configuration."""
    from scipy.spatial.transform import Rotation

    pts3d, _, K, R, t = make_pnp_problem(rng, n_points=n_points)
    basis = Rotation.random(
        random_state=int(rng.integers(1 << 30))).as_matrix().astype(np.float32)
    uv = rng.uniform(-60, 60, size=(n_points, 2)).astype(np.float32)
    pts3d = uv @ basis[:, :2].T  # plane through the origin, arbitrary tilt
    cam = pts3d @ R.T + t
    proj = cam @ K.T
    pts2d = (proj[:, :2] / proj[:, 2:3]).astype(np.float32)
    if noise_px:
        pts2d += rng.normal(0, noise_px, pts2d.shape).astype(np.float32)
    return pts3d, pts2d, K, R, t


class TestPlanar:
    def test_planar_clean_exact(self, rng):
        from scflow_tpu.geometry.pnp import pnp_planar

        pts3d, pts2d, K, R, t = make_planar_problem(rng)
        Rp, tp = pnp_planar(jnp.asarray(pts3d), jnp.asarray(pts2d),
                            jnp.asarray(K))
        # minimal-solver accuracy: the homography scale recovery is a
        # heuristic (sqrt(|h1||h2|)); RANSAC always GN-refines afterwards
        assert rot_err_deg(np.asarray(Rp), R) < 0.5
        np.testing.assert_allclose(np.asarray(tp), t, rtol=5e-3, atol=2.0)

    def test_ransac_handles_planar_scene(self, rng):
        """The dual-path RANSAC must solve the configuration plain DLT
        cannot (coplanar points)."""
        pts3d, pts2d, K, R, t = make_planar_problem(rng, n_points=128,
                                                    noise_px=0.3)
        res = solve_pnp_ransac_jax(
            jnp.asarray(pts3d), jnp.asarray(pts2d), jnp.asarray(K),
            key=jax.random.PRNGKey(0), num_hypotheses=64,
        )
        assert bool(res.ok)
        assert rot_err_deg(np.asarray(res.rotation), R) < 2.0
        assert np.linalg.norm(np.asarray(res.translation) - t) < 10.0

    def test_planar_solver_not_worse_on_3d(self, rng):
        """On genuinely 3D point sets the dual-path pick must still land on
        the good (general DLT) solution."""
        pts3d, pts2d, K, R, t = make_pnp_problem(rng, n_points=128,
                                                 noise_px=0.5,
                                                 outlier_frac=0.2)
        res = solve_pnp_ransac_jax(
            jnp.asarray(pts3d), jnp.asarray(pts2d), jnp.asarray(K),
            key=jax.random.PRNGKey(0), num_hypotheses=64,
        )
        assert bool(res.ok)
        assert rot_err_deg(np.asarray(res.rotation), R) < 2.0


class TestRansac:
    def test_with_outliers(self, rng):
        pts3d, pts2d, K, R, t = make_pnp_problem(
            rng, n_points=128, noise_px=0.5, outlier_frac=0.3
        )
        res = solve_pnp_ransac_jax(
            jnp.asarray(pts3d), jnp.asarray(pts2d), jnp.asarray(K),
            key=jax.random.PRNGKey(0), num_hypotheses=64,
        )
        assert bool(res.ok)
        assert rot_err_deg(np.asarray(res.rotation), R) < 2.0
        assert np.linalg.norm(np.asarray(res.translation) - t) < 10.0
        # inliers should mostly be the clean points
        assert np.asarray(res.inliers).sum() >= 70

    def test_matches_cv2_quality(self, rng):
        pts3d, pts2d, K, R, t = make_pnp_problem(
            rng, n_points=100, noise_px=1.0, outlier_frac=0.2
        )
        Rc, tc, okc = cv2_pnp(pts3d, pts2d, K)
        res = solve_pnp_ransac_jax(
            jnp.asarray(pts3d), jnp.asarray(pts2d), jnp.asarray(K),
            key=jax.random.PRNGKey(1),
        )
        assert okc and bool(res.ok)
        e_cv = rot_err_deg(Rc, R)
        e_jx = rot_err_deg(np.asarray(res.rotation), R)
        assert e_jx < max(2 * e_cv, 2.0)

    def test_respects_validity_mask(self, rng):
        pts3d, pts2d, K, R, t = make_pnp_problem(rng, n_points=64)
        # append garbage rows marked invalid
        pts3d = np.concatenate([pts3d, rng.normal(size=(64, 3)).astype(np.float32)])
        pts2d = np.concatenate([pts2d, rng.uniform(0, 256, (64, 2)).astype(np.float32)])
        valid = np.zeros(128, bool)
        valid[:64] = True
        res = solve_pnp_ransac_jax(
            jnp.asarray(pts3d), jnp.asarray(pts2d), jnp.asarray(K),
            valid=jnp.asarray(valid), key=jax.random.PRNGKey(2),
        )
        assert bool(res.ok)
        assert rot_err_deg(np.asarray(res.rotation), R) < 1.0


class TestFlowPose:
    def test_solve_poses_from_flow_recovers_gt(self, rng):
        """Render depth at the ref pose, synthesize the exact flow to the GT
        pose, and check PnP recovers the GT."""
        from scflow_tpu.geometry.flow import flow_from_pose_and_depth
        from scflow_tpu.refiners.flow_pose import solve_poses_from_flow
        from scflow_tpu.render.meshbank import make_synthetic_bank
        from scflow_tpu.render.renderer import Renderer
        from scipy.spatial.transform import Rotation

        bank = make_synthetic_bank(2, kind="sphere", subdivisions=2, size=80.0)
        renderer = Renderer(bank=bank, image_size=(96, 96), chunk=16)
        n = 2
        K = np.tile(np.array([[[120.0, 0, 48], [0, 120.0, 48], [0, 0, 1]]], np.float32), (n, 1, 1))
        ref_R = Rotation.random(n, random_state=0).as_matrix().astype(np.float32)
        ref_t = np.array([[5, -5, 500], [0, 10, 550]], np.float32)
        dR = Rotation.from_euler("xyz", [[6, -4, 3], [-5, 2, 8]], degrees=True).as_matrix().astype(np.float32)
        gt_R = np.einsum("nij,njk->nik", dR, ref_R)
        gt_t = ref_t + np.array([[4, -6, 20], [-8, 3, -15]], np.float32)
        labels = np.array([0, 1])
        out = renderer(ref_R, ref_t, K, labels)
        depths = np.asarray(out["depths"])
        flow = np.asarray(
            flow_from_pose_and_depth(
                jnp.asarray(ref_R), jnp.asarray(ref_t),
                jnp.asarray(gt_R), jnp.asarray(gt_t),
                jnp.asarray(depths), jnp.asarray(K), invalid_num=400.0,
            )
        )
        R_out, t_out, ok = solve_poses_from_flow(
            flow, depths, ref_R, ref_t, K,
            sample_points=dict(num=500, mode="random"),
        )
        assert ok.all()
        for i in range(n):
            assert rot_err_deg(R_out[i], gt_R[i]) < 1.0
            assert np.linalg.norm(t_out[i] - gt_t[i]) < 5.0


class TestDeviceFlowPnP:
    """solve_poses_from_flow_device: the jitted batched flow->pose path
    (test_cfg.pnp_backend='device')."""

    def _scene(self, rng, n=2, hw=(96, 96)):
        import jax.numpy as jnp
        from scipy.spatial.transform import Rotation

        from scflow_tpu.geometry.flow import flow_from_pose_and_depth

        h, w = hw
        K = np.tile(np.array([[[120.0, 0, w / 2], [0, 120.0, h / 2],
                               [0, 0, 1]]], np.float32), (n, 1, 1))
        ref_R = np.tile(np.eye(3, dtype=np.float32)[None], (n, 1, 1))
        ref_t = np.tile(np.array([[0, 0, 600.0]], np.float32), (n, 1))
        dR = Rotation.from_euler(
            "xyz", rng.normal(size=(n, 3)) * 5, degrees=True
        ).as_matrix().astype(np.float32)
        gt_R = np.einsum("nij,njk->nik", dR, ref_R)
        gt_t = ref_t + rng.normal(size=(n, 3)).astype(np.float32) * [4, 4, 10]
        # hemisphere depth bump: the 3D-relief case (the planar case has
        # its own test below, via the dual-path solver's homography branch)
        yy, xx = np.mgrid[0:h, 0:w]
        r2 = ((xx - w / 2) / (w * 0.3)) ** 2 + ((yy - h / 2) / (h * 0.3)) ** 2
        bump = np.where(
            r2 < 1, 600.0 - 40.0 * np.sqrt(np.maximum(1 - r2, 0)), 0.0
        ).astype(np.float32)
        depth = np.tile(bump[None], (n, 1, 1))
        flow = np.asarray(flow_from_pose_and_depth(
            jnp.asarray(ref_R), jnp.asarray(ref_t), jnp.asarray(gt_R),
            jnp.asarray(gt_t), jnp.asarray(depth), jnp.asarray(K),
            invalid_num=0.0,
        ))
        return flow, depth, ref_R, ref_t, gt_R, gt_t, K

    def test_recovers_gt_pose(self, rng):
        import jax.numpy as jnp

        from scflow_tpu.refiners.flow_pose import solve_poses_from_flow_device

        flow, depth, ref_R, ref_t, gt_R, gt_t, K = self._scene(rng)
        R, t, ok = solve_poses_from_flow_device(
            jnp.asarray(flow), jnp.asarray(depth), jnp.asarray(ref_R),
            jnp.asarray(ref_t), jnp.asarray(K), num_points=512,
        )
        R, t, ok = np.asarray(R), np.asarray(t), np.asarray(ok)
        assert ok.all()
        for i in range(len(R)):
            assert rot_err_deg(R[i], gt_R[i]) < 0.5
            assert np.linalg.norm(t[i] - gt_t[i]) < 2.0

    def test_recovers_pose_on_near_planar_depth(self, rng):
        """A flat plate with mild slope (DLT-degenerate) must still solve
        via the planar-homography path of the dual-path RANSAC."""
        import jax.numpy as jnp

        from scflow_tpu.geometry.flow import flow_from_pose_and_depth
        from scflow_tpu.refiners.flow_pose import solve_poses_from_flow_device
        from scipy.spatial.transform import Rotation

        n, h, w = 2, 96, 96
        K = np.tile(np.array([[[120.0, 0, 48], [0, 120.0, 48], [0, 0, 1]]],
                             np.float32), (n, 1, 1))
        ref_R = np.tile(np.eye(3, dtype=np.float32)[None], (n, 1, 1))
        ref_t = np.tile(np.array([[0, 0, 600.0]], np.float32), (n, 1))
        dR = Rotation.from_euler(
            "xyz", rng.normal(size=(n, 3)) * 5, degrees=True
        ).as_matrix().astype(np.float32)
        gt_R = np.einsum("nij,njk->nik", dR, ref_R)
        gt_t = ref_t + rng.normal(size=(n, 3)).astype(np.float32) * [4, 4, 10]
        yy, xx = np.mgrid[0:h, 0:w]
        depth = np.zeros((n, h, w), np.float32)
        plate = (slice(None), slice(h // 4, 3 * h // 4),
                 slice(w // 4, 3 * w // 4))
        depth[plate] = 600.0 + (xx + yy)[None][plate] * 0.3
        flow = np.asarray(flow_from_pose_and_depth(
            jnp.asarray(ref_R), jnp.asarray(ref_t), jnp.asarray(gt_R),
            jnp.asarray(gt_t), jnp.asarray(depth), jnp.asarray(K),
            invalid_num=0.0))
        R, t, ok = solve_poses_from_flow_device(
            jnp.asarray(flow), jnp.asarray(depth), jnp.asarray(ref_R),
            jnp.asarray(ref_t), jnp.asarray(K), num_points=512,
        )
        R, t = np.asarray(R), np.asarray(t)
        assert np.asarray(ok).all()
        for i in range(n):
            assert rot_err_deg(R[i], gt_R[i]) < 0.5
            assert np.linalg.norm(t[i] - gt_t[i]) < 2.0

    def test_failed_solve_keeps_ref_pose(self, rng):
        import jax.numpy as jnp

        from scflow_tpu.refiners.flow_pose import solve_poses_from_flow_device

        flow, depth, ref_R, ref_t, gt_R, gt_t, K = self._scene(rng)
        depth[1] = 0.0  # no valid pixels for sample 1
        R, t, ok = solve_poses_from_flow_device(
            jnp.asarray(flow), jnp.asarray(depth), jnp.asarray(ref_R),
            jnp.asarray(ref_t), jnp.asarray(K), num_points=256,
        )
        assert not bool(np.asarray(ok)[1])
        np.testing.assert_array_equal(np.asarray(R)[1], ref_R[1])
        np.testing.assert_array_equal(np.asarray(t)[1], ref_t[1])

    def test_occlusion_confidence_filters_points(self, rng):
        """Corrupt the flow where confidence is low: with occlusion-driven
        selection the solve must still recover the gt pose."""
        import jax.numpy as jnp

        from scflow_tpu.refiners.flow_pose import solve_poses_from_flow_device

        flow, depth, ref_R, ref_t, gt_R, gt_t, K = self._scene(rng)
        flow = np.array(flow)  # np.asarray over a jax array is read-only
        h = depth.shape[1]
        occ = np.where(depth > 0, 1.0, 0.0).astype(np.float32)
        # bottom half: garbage flow, low confidence
        flow[:, h // 2:] += 40.0
        occ[:, h // 2:] *= 0.1
        R, t, ok = solve_poses_from_flow_device(
            jnp.asarray(flow), jnp.asarray(depth), jnp.asarray(ref_R),
            jnp.asarray(ref_t), jnp.asarray(K), occlusion=jnp.asarray(occ),
            occ_thresh=0.5, num_points=512,
        )
        R, t = np.asarray(R), np.asarray(t)
        assert np.asarray(ok).all()
        for i in range(len(R)):
            assert rot_err_deg(R[i], gt_R[i]) < 0.5
