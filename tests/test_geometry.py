"""Geometry numerics vs. independent torch/numpy oracles.

The oracles re-derive the reference formulas (models/utils/pose.py) with
torch so we verify semantics, not implementation."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F
import pytest

from scflow_tpu.geometry import (
    apply_delta_pose,
    axis_angle_from_rotmat,
    cal_epe,
    filter_flow_by_mask,
    flow_from_object_points,
    flow_from_pose_and_depth,
    lift_depth_to_object_points,
    project_points,
    quat_from_rotmat,
    rotmat_from_axis_angle,
    rotmat_from_euler,
    rotmat_from_ortho6d,
    rotmat_from_quat,
)


def random_rotation(rng, n=1):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q.T
    R = np.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    ).reshape(n, 3, 3)
    return R.astype(np.float32)


class TestRotations:
    def test_ortho6d_orthonormal(self, rng):
        o6 = rng.normal(size=(8, 6)).astype(np.float32)
        R = np.asarray(rotmat_from_ortho6d(jnp.asarray(o6)))
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), np.ones(8), atol=1e-5)

    def test_ortho6d_vs_torch_gram_schmidt(self, rng):
        o6 = rng.normal(size=(16, 6)).astype(np.float32)
        t = torch.from_numpy(o6)
        x = F.normalize(t[:, :3], dim=1)
        z = F.normalize(torch.cross(x, t[:, 3:], dim=1), dim=1)
        y = torch.cross(z, x, dim=1)
        expect = torch.stack([x, y, z], dim=2).numpy()
        got = np.asarray(rotmat_from_ortho6d(jnp.asarray(o6)))
        np.testing.assert_allclose(got, expect, atol=1e-5)

    def test_identity_bias_is_identity(self):
        # the pose head zero-init bias must map to the identity rotation
        # (reference pose_head.py:96)
        R = np.asarray(rotmat_from_ortho6d(jnp.asarray([[1, 0, 0, 0, 1, 0.0]])))
        np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)
        Rq = np.asarray(rotmat_from_quat(jnp.asarray([[0, 0, 0, 1.0]])))
        np.testing.assert_allclose(Rq[0], np.eye(3), atol=1e-6)

    def test_quat_roundtrip(self, rng):
        R = random_rotation(rng, 32)
        q = quat_from_rotmat(jnp.asarray(R))
        R2 = np.asarray(rotmat_from_quat(q))
        np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_rodrigues_roundtrip_and_cv2(self, rng):
        import cv2

        rvec = rng.normal(size=(8, 3)).astype(np.float32) * 0.8
        R = np.asarray(rotmat_from_axis_angle(jnp.asarray(rvec)))
        for i in range(8):
            Rcv = cv2.Rodrigues(rvec[i].astype(np.float64))[0]
            np.testing.assert_allclose(R[i], Rcv, atol=1e-5)
        back = np.asarray(axis_angle_from_rotmat(jnp.asarray(R)))
        np.testing.assert_allclose(back, rvec, atol=1e-4)

    def test_euler_vs_scipy(self, rng):
        from scipy.spatial.transform import Rotation

        ang = rng.uniform(-np.pi, np.pi, size=(8, 3)).astype(np.float32)
        got = np.asarray(rotmat_from_euler(jnp.asarray(ang), order="xyz"))
        expect = Rotation.from_euler("xyz", ang).as_matrix()
        np.testing.assert_allclose(got, expect, atol=1e-5)


class TestSE3Update:
    def _oracle(self, o6, dt, R_src, t_src, depth_transform="exp"):
        """torch re-derivation of models/utils/pose.py:124-149."""
        o6t = torch.from_numpy(o6)
        x = F.normalize(o6t[:, :3], dim=1)
        z = F.normalize(torch.cross(x, o6t[:, 3:], dim=1), dim=1)
        y = torch.cross(z, x, dim=1)
        dR = torch.stack([x, y, z], dim=2)
        Rs = torch.from_numpy(R_src)
        ts = torch.from_numpy(t_src)
        dtt = torch.from_numpy(dt)
        R_dst = torch.bmm(dR, Rs)
        if depth_transform == "exp":
            vz = ts[:, 2] / torch.exp(dtt[:, 2])
        else:
            vz = ts[:, 2] * (dtt[:, 2] + 1)
        vx = vz * (dtt[:, 0] / 10.0 + ts[:, 0] / ts[:, 2])
        vy = vz * (dtt[:, 1] / 10.0 + ts[:, 1] / ts[:, 2])
        return R_dst.numpy(), torch.stack([vx, vy, vz], dim=-1).numpy()

    @pytest.mark.parametrize("depth_transform", ["exp", "linear"])
    def test_vs_oracle(self, rng, depth_transform):
        n = 8
        o6 = rng.normal(size=(n, 6)).astype(np.float32)
        dt = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
        R_src = random_rotation(rng, n)
        t_src = np.stack(
            [rng.normal(size=n) * 30, rng.normal(size=n) * 30, rng.uniform(400, 1200, n)],
            axis=-1,
        ).astype(np.float32)
        R_exp, t_exp = self._oracle(o6, dt, R_src, t_src, depth_transform)
        R_got, t_got = apply_delta_pose(
            jnp.asarray(o6), jnp.asarray(dt), jnp.asarray(R_src), jnp.asarray(t_src),
            depth_transform=depth_transform,
        )
        np.testing.assert_allclose(np.asarray(R_got), R_exp, atol=1e-5)
        np.testing.assert_allclose(np.asarray(t_got), t_exp, rtol=1e-5, atol=1e-3)

    def test_zero_delta_is_identity(self, rng):
        n = 4
        R_src = random_rotation(rng, n)
        t_src = np.array([[10, -5, 800.0]] * n, dtype=np.float32)
        o6 = np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), (n, 1))
        dt = np.zeros((n, 3), np.float32)
        R, t = apply_delta_pose(jnp.asarray(o6), jnp.asarray(dt), jnp.asarray(R_src), jnp.asarray(t_src))
        np.testing.assert_allclose(np.asarray(R), R_src, atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), t_src, rtol=1e-5)


def make_scene(rng, n=2, h=24, w=32):
    K = np.tile(
        np.array([[[100.0, 0, w / 2], [0, 100.0, h / 2], [0, 0, 1]]], np.float32),
        (n, 1, 1),
    )
    R = random_rotation(rng, n)
    t = np.stack([rng.normal(size=n) * 5, rng.normal(size=n) * 5, rng.uniform(500, 900, n)], -1).astype(np.float32)
    depth = np.zeros((n, h, w), np.float32)
    # a blob of valid depth in the middle
    depth[:, h // 4 : 3 * h // 4, w // 4 : 3 * w // 4] = rng.uniform(
        500, 900, size=(n, h // 2, w // 2)
    ).astype(np.float32)
    return K, R, t, depth


class TestFlowFromPose:
    def _oracle_flow(self, R_src, t_src, R_dst, t_dst, depth, K, invalid=400.0):
        """torch re-derivation of get_flow_from_delta_pose_and_depth
        (models/utils/pose.py:92-121): ragged lift + scatter."""
        n, h, w = depth.shape
        flow = np.full((n, h, w, 2), invalid, np.float32)
        for i in range(n):
            ys, xs = np.nonzero(depth[i] > 0)
            d = depth[i][ys, xs]
            homo = np.stack([xs, ys, np.ones_like(xs)], -1).astype(np.float64) * d[:, None]
            cam = (np.linalg.inv(K[i].astype(np.float64)) @ homo.T).T
            obj = (np.linalg.inv(R_src[i].astype(np.float64)) @ (cam - t_src[i]).T).T
            dst = (K[i] @ (R_dst[i] @ obj.T + t_dst[i][:, None])).T
            dst2 = dst[:, :2] / dst[:, 2:3]
            flow[i, ys, xs, 0] = dst2[:, 0] - xs
            flow[i, ys, xs, 1] = dst2[:, 1] - ys
        return flow

    def test_dense_equals_ragged_scatter(self, rng):
        K, R_src, t_src, depth = make_scene(rng)
        R_dst = random_rotation(rng, 2)
        t_dst = t_src + rng.normal(size=t_src.shape).astype(np.float32) * 10
        expect = self._oracle_flow(R_src, t_src, R_dst, t_dst, depth, K)
        got = np.asarray(
            flow_from_pose_and_depth(
                jnp.asarray(R_src), jnp.asarray(t_src),
                jnp.asarray(R_dst), jnp.asarray(t_dst),
                jnp.asarray(depth), jnp.asarray(K),
            )
        )
        np.testing.assert_allclose(got, expect, rtol=1e-3, atol=2e-2)

    def test_identity_pose_zero_flow(self, rng):
        K, R, t, depth = make_scene(rng)
        flow = np.asarray(
            flow_from_pose_and_depth(
                jnp.asarray(R), jnp.asarray(t), jnp.asarray(R), jnp.asarray(t),
                jnp.asarray(depth), jnp.asarray(K),
            )
        )
        valid = depth > 0
        assert np.abs(flow[valid]).max() < 1e-2
        assert np.all(flow[~valid] == 400.0)

    def test_tap_blend_equals_dense_downsample(self, rng):
        """The decoder's in-loop low-res pose flow (reproject only the 2x2
        tap pixels, blend h-then-w) must equal bilinearly downsampling the
        dense pose flow — the semantics the reference's recurrence uses
        (scflow_decoder.py:196-227)."""
        from scflow_tpu.geometry.flow import flow_from_object_points_at
        from scflow_tpu.ops.resize import interp_taps, interpolate_bilinear

        n, h, w, scale = 2, 32, 64, 8
        K, R_src, t_src, depth = make_scene(rng, n=n, h=h, w=w)
        R_dst = random_rotation(rng, n)
        t_dst = t_src + rng.normal(size=t_src.shape).astype(np.float32) * 10
        pts, valid = lift_depth_to_object_points(
            jnp.asarray(depth), jnp.asarray(K), jnp.asarray(R_src),
            jnp.asarray(t_src),
        )
        dense = flow_from_object_points(
            pts, valid, jnp.asarray(R_dst), jnp.asarray(t_dst),
            jnp.asarray(K), invalid_num=0.0,
        )
        want = np.asarray(
            (1.0 / scale) * interpolate_bilinear(dense, 1.0 / scale)
        )

        ylo, yhi, wy_lo, wy_hi = interp_taps(h, h // scale, True)
        xlo, xhi, wx_lo, wx_hi = interp_taps(w, w // scale, True)
        ridx = np.concatenate([ylo, yhi])
        cidx = np.concatenate([xlo, xhi])
        gx, gy = np.meshgrid(cidx.astype(np.float32),
                             ridx.astype(np.float32), indexing="xy")
        pix = jnp.asarray(np.stack([gx, gy], axis=-1))
        fv = flow_from_object_points_at(
            pts[:, ridx][:, :, cidx], valid[:, ridx][:, :, cidx],
            jnp.asarray(R_dst), jnp.asarray(t_dst), jnp.asarray(K), pix,
            invalid_num=0.0,
        )
        ho, wo = h // scale, w // scale
        y1 = wy_lo[None, :, None, None] * fv[:, :ho] \
            + wy_hi[None, :, None, None] * fv[:, ho:]
        y2 = wx_lo[None, None, :, None] * y1[:, :, :wo] \
            + wx_hi[None, None, :, None] * y1[:, :, wo:]
        got = np.asarray((1.0 / scale) * y2)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def test_lift_project_roundtrip(self, rng):
        K, R, t, depth = make_scene(rng)
        pts, valid = lift_depth_to_object_points(
            jnp.asarray(depth), jnp.asarray(K), jnp.asarray(R), jnp.asarray(t)
        )
        # reproject with the same pose: must land on the pixel grid
        n, h, w = depth.shape
        proj = project_points(
            pts.reshape(n, -1, 3), jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), eps=1e-8
        ).reshape(n, h, w, 2)
        gx, gy = np.meshgrid(np.arange(w), np.arange(h))
        grid = np.stack([gx, gy], -1)[None].astype(np.float32)
        err = np.abs(np.asarray(proj) - grid)[np.asarray(valid)]
        assert err.max() < 1e-2


class TestFlowFilters:
    def test_filter_by_mask_matches_torch(self, rng):
        n, h, w = 2, 16, 16
        flow = rng.normal(size=(n, h, w, 2)).astype(np.float32) * 3
        flow[:, :2] = 400.0
        mask = (rng.uniform(size=(n, h, w)) > 0.4).astype(np.float32)

        # torch oracle (models/utils/flow.py:6-26 semantics)
        tflow = torch.from_numpy(flow.transpose(0, 3, 1, 2)).clone()
        tmask = torch.from_numpy(mask)[:, None]
        xx = torch.arange(w); yy = torch.arange(h)
        g = torch.stack(torch.meshgrid(yy, xx, indexing="ij")[::-1], 0).float()
        grid = g[None].repeat(n, 1, 1, 1) + tflow
        grid[:, 0] = grid[:, 0] * 2 / max(w - 1, 1) - 1
        grid[:, 1] = grid[:, 1] * 2 / max(h - 1, 1) - 1
        sampled = F.grid_sample(tmask, grid.permute(0, 2, 3, 1), mode="bilinear",
                                padding_mode="zeros", align_corners=False)
        not_valid = (sampled < 0.9) | (
            (tflow[:, 0] >= 400) & (tflow[:, 1] >= 400)
        )[:, None]
        expect = tflow.clone()
        expect[not_valid.expand_as(tflow)] = 400.0
        expect = expect.numpy().transpose(0, 2, 3, 1)

        got = np.asarray(filter_flow_by_mask(jnp.asarray(flow), jnp.asarray(mask)))
        np.testing.assert_allclose(got, expect, atol=1e-4)

    def test_filter_by_depth_invalidates_inconsistent(self, rng):
        """Pixels whose warped target depth disagrees with the source depth
        are invalidated (documented LoFTR intent; the reference's own
        `&` combination is a silent no-op, flow.py:42)."""
        from scflow_tpu.geometry.flow import filter_flow_by_depth

        n, h, w = 1, 8, 8
        flow = np.zeros((n, h, w, 2), np.float32)  # identity flow
        depth0 = np.full((n, h, w), 500.0, np.float32)
        depth1 = depth0.copy()
        depth1[0, 2, 3] = 900.0  # >20% relative disagreement at one pixel
        got = np.asarray(
            filter_flow_by_depth(
                jnp.asarray(flow), jnp.asarray(depth1), jnp.asarray(depth0)
            )
        )
        assert (got[0, 2, 3] == 400.0).all()
        # consistent neighbours keep their (zero) flow
        assert (got[0, 5, 5] == 0.0).all()

    def test_cal_epe(self, rng):
        n, h, w = 2, 8, 8
        gt = rng.normal(size=(n, h, w, 2)).astype(np.float32)
        pred = gt + rng.normal(size=(n, h, w, 2)).astype(np.float32) * 0.5
        mask = np.ones((n, h, w), np.float32)
        out = cal_epe(jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(mask))
        err = np.sqrt(((gt - pred) ** 2).sum(-1))
        np.testing.assert_allclose(np.asarray(out["mean"]), err.mean(axis=(1, 2)), rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(out["3px"]), (err < 3).mean(axis=(1, 2)), rtol=1e-4
        )


class TestPoseRemap:
    """Host remap of patch-frame poses to the original image
    (geometry/host.py::remap_pose_to_origin_resolution; reference
    models/utils/pose.py:264-309)."""

    def _pose_and_kp(self, rng):
        from scipy.spatial.transform import Rotation

        R = Rotation.random(
            random_state=int(rng.integers(1 << 30))).as_matrix().astype(np.float32)
        t = np.array([15.0, -8.0, 550.0], np.float32)
        kp3d = rng.uniform(-40, 40, size=(8, 3)).astype(np.float32)
        return R, t, kp3d

    def test_adapt_intrinsic_is_identity(self, rng):
        from scflow_tpu.geometry.host import remap_pose_to_origin_resolution

        R, t, kp3d = self._pose_and_kp(rng)
        K = np.array([[300.0, 0, 128], [0, 300.0, 128], [0, 0, 1]], np.float32)
        outR, outT = remap_pose_to_origin_resolution(
            R[None], t[None], K[None],
            {"geometry_transform_mode": "adapt_intrinsic"})
        np.testing.assert_array_equal(outR[0], R)
        np.testing.assert_array_equal(outT[0], t)

    def test_keep_intrinsic_identity_transform_preserves_pose(self, rng):
        """With T=I and dstK=srcK the exact solution is the input pose."""
        from scflow_tpu.geometry.host import remap_pose_to_origin_resolution

        R, t, kp3d = self._pose_and_kp(rng)
        srcK = np.array([[300.0, 0, 128], [0, 300.0, 128], [0, 0, 1]],
                        np.float32)
        meta = {
            "geometry_transform_mode": "keep_intrinsic",
            "transform_matrix": np.eye(3, dtype=np.float32)[None],
            "keypoints_3d": kp3d[None],
        }
        outR, outT = remap_pose_to_origin_resolution(
            R[None], t[None], srcK[None], meta)
        np.testing.assert_allclose(outR[0], R, atol=1e-4)
        np.testing.assert_allclose(outT[0], t, rtol=1e-4, atol=0.05)

    def test_target_intrinsic_pure_k_change_preserves_pose(self, rng):
        """When the patch transform is exactly the intrinsic change
        (T = srcK @ inv(oriK)) the same pose under oriK is the exact
        solution — the remap must recover it."""
        from scflow_tpu.geometry.host import remap_pose_to_origin_resolution

        R, t, kp3d = self._pose_and_kp(rng)
        srcK = np.array([[300.0, 0, 128], [0, 300.0, 128], [0, 0, 1]],
                        np.float32)
        oriK = np.array([[280.0, 0, 320], [0, 280.0, 240], [0, 0, 1]],
                        np.float32)
        T = srcK @ np.linalg.inv(oriK)
        meta = {
            "geometry_transform_mode": "target_intrinsic",
            "transform_matrix": T[None].astype(np.float32),
            "keypoints_3d": kp3d[None],
            "ori_k": oriK,
        }
        outR, outT = remap_pose_to_origin_resolution(
            R[None], t[None], srcK[None], meta)
        np.testing.assert_allclose(outR[0], R, atol=1e-3)
        np.testing.assert_allclose(outT[0], t, rtol=1e-3, atol=0.5)

    @pytest.mark.parametrize("mode", ["keep_intrinsic", "target_intrinsic"])
    def test_generic_crop_reprojects_approximately(self, rng, mode):
        """For a generic crop transform no exact SE(3) solution exists (the
        reference tracks the residual as diff_pixel); the EPnP best fit
        must still reproject the keypoints within a few pixels."""
        from scflow_tpu.geometry.host import (
            project_3d_point,
            remap_pose_to_origin_resolution,
        )

        R, t, kp3d = self._pose_and_kp(rng)
        srcK = np.array([[300.0, 0, 128], [0, 300.0, 128], [0, 0, 1]],
                        np.float32)
        oriK = np.array([[280.0, 0, 320], [0, 280.0, 240], [0, 0, 1]],
                        np.float32)
        T = np.array([[2.0, 0, -100.0], [0, 2.0, -60.0], [0, 0, 1.0]],
                     np.float32)
        meta = {
            "geometry_transform_mode": mode,
            "transform_matrix": T[None],
            "keypoints_3d": kp3d[None],
            "ori_k": oriK,
        }
        outR, outT = remap_pose_to_origin_resolution(
            R[None], t[None], srcK[None], meta)
        dstK = srcK if mode == "keep_intrinsic" else oriK
        want = project_3d_point(kp3d, srcK, R, t,
                                transform_matrix=np.linalg.inv(T))
        got = project_3d_point(kp3d, dstK, outR[0], outT[0])
        assert np.linalg.norm(got - want, axis=1).mean() < 3.0
