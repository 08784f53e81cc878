"""Direct unit tests for the loss functions against hand-computed values
and a numpy oracle transcribed independently from the reference
(models/loss/sequence_loss.py, flow_loss.py, point_matching_loss.py).
Previously losses were covered only indirectly (train-step loss decrease),
which cannot catch a wrong weighting or a dropped mask.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from scflow_tpu.losses.basic import (
    endpoint_error,
    l1_loss,
    raft_loss,
    sequence_loss,
)
from scflow_tpu.losses.point_matching import (
    disentangle_point_matching_loss,
    point_matching_loss,
    sym_mask_from_types,
)


class TestBasicLosses:
    def test_raft_loss_masks_invalid_and_large_flow(self):
        gt = np.zeros((1, 2, 2, 2), np.float32)
        gt[0, 1, 1] = 500.0  # |gt| >= max_flow -> excluded
        pred = gt + 1.0
        valid = np.ones((1, 2, 2), np.float32)
        valid[0, 0, 0] = 0.0  # mask-excluded
        # remaining valid pixels: (0,1), (1,0); per-pixel L1 = 2 channels * 1
        out = float(raft_loss(jnp.asarray(pred), jnp.asarray(gt),
                              jnp.asarray(valid), max_flow=400.0))
        assert np.isclose(out, (2.0 + 2.0) / 2.0, atol=1e-6)

    def test_l1_loss_ignores_valid_by_design(self):
        """Reference defect §2.4-8 replicated: the mask loss is an
        unmasked mean (sequence_loss.py:35-37)."""
        pred = np.zeros((1, 2, 2), np.float32)
        gt = np.ones((1, 2, 2), np.float32)
        valid = np.zeros((1, 2, 2), np.float32)  # would zero a masked loss
        assert float(l1_loss(jnp.asarray(pred), jnp.asarray(gt),
                             jnp.asarray(valid))) == 1.0

    def test_sequence_loss_gamma_weighting(self):
        """weight_i = gamma^(T-1-i) (sequence_loss.py:42-82)."""
        preds = [jnp.full((2,), v) for v in (1.0, 2.0, 4.0)]
        gamma = 0.5
        total, per_iter = sequence_loss(
            lambda p: p.mean(), preds, gamma=gamma)
        assert [float(x) for x in per_iter] == [1.0, 2.0, 4.0]
        assert np.isclose(float(total), 0.25 * 1 + 0.5 * 2 + 1.0 * 4)

    def test_endpoint_error_q_requires_eps(self):
        """(err + eps)^q applies only when BOTH are set (flow_loss.py:47)."""
        pred = np.zeros((1, 1, 1, 2), np.float32)
        gt = np.full((1, 1, 1, 2), 3.0, np.float32)

        def emap(**kw):  # endpoint_error returns the (N, H, W) error MAP
            return float(np.asarray(
                endpoint_error(jnp.asarray(pred), jnp.asarray(gt), **kw)
            )[0, 0, 0])

        raw = emap()
        assert np.isclose(raw, np.sqrt(18.0))
        assert np.isclose(emap(q=0.4), raw)  # q alone: unchanged
        assert np.isclose(emap(q=0.4, eps=0.01), (raw + 0.01) ** 0.4,
                          rtol=1e-6)


def reference_disentangle_pm(pred_r, pred_t, gt_r, gt_t, labels, meshes,
                             diameters, sym_classes, loss_type=1,
                             disentangle_z=True, scale_depth_factor=1.0):
    """Numpy transcription of the reference per-sample loop
    (point_matching_loss.py:160-218), including the always-applied
    scale_depth_factor on z."""

    def vnorm(d):
        return (np.abs(d).sum(-1) if loss_type == 1
                else np.sqrt((d ** 2).sum(-1)))

    sp = pred_t.copy()
    sg = gt_t.copy()
    sp[:, 2] *= scale_depth_factor
    sg[:, 2] *= scale_depth_factor
    total = 0.0
    for i in range(len(pred_r)):
        pts = meshes[labels[i]]
        p_gt_rot = pts @ gt_r[i].T
        p_gt_rt = p_gt_rot + sg[i]
        p_pred_rot = pts @ pred_r[i].T + sg[i]
        if labels[i] in sym_classes:
            d = np.linalg.norm(
                p_gt_rt[:, None] - p_pred_rot[None], axis=-1)
            p_pred_rot = p_pred_rot[np.argmin(d, axis=1)]
        loss_rot = vnorm(p_pred_rot - p_gt_rt).mean()
        if disentangle_z:
            tz = sg[i].copy()
            tz[2] = sp[i, 2]
            loss_z = vnorm(p_gt_rot + tz - p_gt_rt).mean()
            txy = sp[i].copy()
            txy[2] = sg[i, 2]
            loss_xy = vnorm(p_gt_rot + txy - p_gt_rt).mean()
            loss_trans = loss_z + loss_xy
        else:
            loss_trans = vnorm(p_gt_rot + sp[i] - p_gt_rt).mean()
        total += (loss_rot + loss_trans) / diameters[labels[i]]
    return total / len(pred_r)


@pytest.fixture
def pm_setup(rng):
    from scipy.spatial.transform import Rotation

    nclass, v = 3, 40
    meshes = [rng.uniform(-40, 40, size=(v, 3)).astype(np.float32)
              for _ in range(nclass)]
    diam = np.array([80.0, 100.0, 120.0], np.float32)
    n = 4
    labels = rng.integers(0, nclass, n).astype(np.int32)
    gt_r = Rotation.random(n, rng).as_matrix().astype(np.float32)
    gt_t = np.stack([rng.normal(size=n) * 20, rng.normal(size=n) * 20,
                     rng.uniform(400, 600, n)], -1).astype(np.float32)
    dR = Rotation.from_euler("xyz", rng.normal(size=(n, 3)) * 10,
                             degrees=True).as_matrix().astype(np.float32)
    pred_r = np.einsum("nij,njk->nik", dR, gt_r)
    pred_t = gt_t + rng.normal(size=(n, 3)).astype(np.float32) * 8
    bank = jnp.asarray(np.stack(meshes))
    valid = jnp.ones((nclass, v), bool)
    return meshes, diam, labels, gt_r, gt_t, pred_r, pred_t, bank, valid


class TestPointMatchingLosses:
    @pytest.mark.parametrize("disentangle_z", [True, False])
    @pytest.mark.parametrize("sym", [False, True])
    def test_disentangle_matches_reference_oracle(self, pm_setup, sym,
                                                  disentangle_z):
        meshes, diam, labels, gt_r, gt_t, pred_r, pred_t, bank, valid = pm_setup
        sym_classes = {1} if sym else set()
        sym_mask = sym_mask_from_types(
            {"cls_2": {}} if sym else {}, 3)
        want = reference_disentangle_pm(
            pred_r, pred_t, gt_r, gt_t, labels, meshes, diam, sym_classes,
            loss_type=1, disentangle_z=disentangle_z,
            scale_depth_factor=0.5,
        )
        got = float(disentangle_point_matching_loss(
            jnp.asarray(pred_r), jnp.asarray(pred_t), jnp.asarray(gt_r),
            jnp.asarray(gt_t), jnp.asarray(labels), bank, valid, sym_mask,
            jnp.asarray(diam), loss_type=1, disentangle_z=disentangle_z,
            scale_depth_factor=0.5,
        ))
        assert np.isclose(got, want, rtol=1e-5), (got, want)

    def test_plain_pm_symmetric_nn_reduces_loss(self, pm_setup):
        """For a symmetric class, NN matching must not increase the loss
        vs the unmatched pairing (it picks the nearest point per target)."""
        meshes, diam, labels, gt_r, gt_t, pred_r, pred_t, bank, valid = pm_setup
        args = (jnp.asarray(pred_r), jnp.asarray(pred_t), jnp.asarray(gt_r),
                jnp.asarray(gt_t), jnp.asarray(labels), bank, valid)
        no_sym = float(point_matching_loss(
            *args, sym_mask_from_types({}, 3), jnp.asarray(diam)))
        all_sym = float(point_matching_loss(
            *args,
            sym_mask_from_types(
                {"cls_1": {}, "cls_2": {}, "cls_3": {}}, 3),
            jnp.asarray(diam)))
        assert all_sym <= no_sym + 1e-6

    def test_pm_zero_at_gt(self, pm_setup):
        meshes, diam, labels, gt_r, gt_t, pred_r, pred_t, bank, valid = pm_setup
        out = float(point_matching_loss(
            jnp.asarray(gt_r), jnp.asarray(gt_t), jnp.asarray(gt_r),
            jnp.asarray(gt_t), jnp.asarray(labels), bank, valid,
            sym_mask_from_types({}, 3), jnp.asarray(diam)))
        assert out < 1e-5
