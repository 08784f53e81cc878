"""SCFlow decoder — the shape-constraint recurrent update loop.

Reference: models/decoder/scflow_decoder.py:18-251.  Each iteration:
corr lookup at the (downsampled) pose-induced flow -> motion encoder ->
ConvGRU -> delta-flow + occlusion-mask heads -> delta-pose head on
[h, enc(dflow), enc(mask)] -> SE(3) update (detached previous pose) ->
dense pose-induced flow for the next iteration.

TPU-first re-design (SURVEY.md §7.1): object-frame points are lifted ONCE
densely (every pixel, masked) instead of ragged per-image lists; the
pose-induced flow is a dense reproject + where-select (no scatter, no host
loop).  Iteration count is static (train and test iters are separate jit
specializations, replacing the reference's mutable `decoder.iters`,
scflow_refiner.py:154-162).

The recurrence itself runs entirely at 1/8 resolution: the reference
computes the pose-induced flow densely at H x W and bilinearly downsamples
it for the next lookup (scflow_decoder.py:196-227); since that downsample
reads at most 2x2 full-res pixels per low-res cell (separable 2-tap
interpolation), the loop reprojects ONLY those tap pixels and applies the
same tap weights in the same h-then-w order — value-identical to
downsampling the dense flow, at 1/16 of the reprojection and none of the
full-res HBM traffic.  Full-resolution flow/mask sequences are
reconstructed from the per-iteration poses AFTER the loop (and only for
the iterations actually requested — one, for inference).

Two loop modes over the SAME parameter tree (`decoder/update/...`),
selectable per call (measured v5e, batch 16, 256², 8 iters):
- unroll=True: statically-unrolled python loop — best TRAIN step (182 vs
  195 ms; XLA schedules the backward across iterations) but slow compiles.
- unroll=False: `nn.scan`/lax.scan — best INFERENCE (54.5 vs 61.2 ms end to
  end) and 2-6x faster compiles; the inference/serving paths default to it.
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from scflow_tpu.geometry.camera import (coords_grid,
                                        lift_depth_to_object_points,
                                        lift_depth_to_object_points_at)
from scflow_tpu.geometry.flow import flow_from_object_points_at
from scflow_tpu.geometry.se3 import apply_delta_pose
from scflow_tpu.models.layers import ConvModule
from scflow_tpu.models.motion import ConvGRU, MotionEncoder, XHead
from scflow_tpu.models.pose_head import MultiClassPoseHead, SingleClassPoseHead
from scflow_tpu.ops.corr import (
    corr_lookup_dispatch,
    correlation_pyramid,
    correlation_pyramid_flat,
    resolve_lookup_backend,
)
from scflow_tpu.ops.resize import interp_taps, interpolate_bilinear
from scflow_tpu.registry import DECODERS

_H_CHANNELS = {"Basic": 128, "Small": 96}
_CXT_CHANNELS = {"Basic": 128, "Small": 64}


class _SCFlowUpdate(nn.Module):
    """One recurrent update step (the body shared by both loop modes)."""

    net_type: str = "Basic"
    num_levels: int = 4
    radius: int = 4
    detach_flow: bool = True
    detach_mask: bool = True
    detach_pose: bool = True
    detach_depth_for_xy: bool = False
    mask_flow: bool = False
    mask_corr: bool = False
    depth_transform: str = "exp"
    gru_type: str = "SeqConv"
    gru_fuse_gates: bool = False
    feat_channels: int = 256
    invalid_flow_num: float = 0.0
    pose_head_cfg: Optional[dict] = None
    dtype: Any = None
    lookup_backend: str = "xla"

    def _build_pose_head(self):
        cfg = dict(self.pose_head_cfg or {"type": "MultiClassPoseHead"})
        head_type = cfg.pop("type")
        kw = {}
        for k in ("num_class", "in_channels", "rotation_mode"):
            if k in cfg:
                kw[k] = cfg[k]
        if head_type == "MultiClassPoseHead":
            return MultiClassPoseHead(name="pose_pred", dtype=self.dtype, **kw)
        elif head_type == "SingleClassPoseHead":
            kw.pop("num_class", None)
            return SingleClassPoseHead(name="pose_pred", dtype=self.dtype, **kw)
        raise KeyError(head_type)

    @nn.compact
    def __call__(self, carry, pyramid, cxt_feat, lowres, internal_k, label):
        """carry = (flow_small (N, h, w, 2) — the ALREADY downsampled+scaled
        pose flow — mask, h_feat, R, t).  lowres bundles the static
        tap-pixel geometry: (sub_points (N, 2h, 2w, 3), sub_valid, pix_sub
        (2h, 2w, 2), wy_lo, wy_hi (h,), wx_lo, wx_hi (w,))."""
        flow_small, mask, h_feat, R, t = carry
        scale = 2 ** (self.num_levels - 1)
        h_ch = _H_CHANNELS[self.net_type]

        motion_enc = MotionEncoder(net_type=self.net_type, dtype=self.dtype,
                                   name="encoder")
        gru = ConvGRU(h_ch, net_type=self.gru_type, dtype=self.dtype,
                      fuse_gates=self.gru_fuse_gates, name="gru")
        flow_head = XHead((self.feat_channels,), 2, kind="flow",
                          dtype=self.dtype, name="flow_pred")
        mask_head = XHead((self.feat_channels,), 1, kind="mask",
                          dtype=self.dtype, name="mask_pred")
        pose_head = self._build_pose_head()
        dfe0 = ConvModule(128, 7, padding=3, act="relu", dtype=self.dtype,
                          name="delta_flow_enc0")
        dfe1 = ConvModule(64, 3, padding=1, act="relu", dtype=self.dtype,
                          name="delta_flow_enc1")
        me0 = ConvModule(64, 3, padding=1, act="relu", dtype=self.dtype,
                         name="mask_enc0")
        me1 = ConvModule(32, 3, padding=1, act="relu", dtype=self.dtype,
                         name="mask_enc1")

        if self.detach_flow:
            flow_small = jax.lax.stop_gradient(flow_small)
        if self.detach_mask:
            mask = jax.lax.stop_gradient(mask)
        corr = corr_lookup_dispatch(
            pyramid, flow_small, self.radius, backend=self.lookup_backend
        )
        if self.mask_corr:
            corr = corr * mask
        motion_feat = motion_enc(
            corr, flow_small * mask if self.mask_flow else flow_small
        )
        x = jnp.concatenate([cxt_feat, motion_feat], axis=-1)
        h_feat = gru(h_feat, x)

        delta_flow = flow_head(h_feat)
        mask = nn.sigmoid(mask_head(h_feat))

        dff = dfe1(dfe0(delta_flow))
        mf = me1(me0(mask))
        d_rot, d_trans = pose_head(
            jnp.concatenate([h_feat, dff, mf], axis=-1), label
        )
        d_rot = d_rot.astype(jnp.float32)
        d_trans = d_trans.astype(jnp.float32)

        R_prev = jax.lax.stop_gradient(R) if self.detach_pose else R
        t_prev = jax.lax.stop_gradient(t) if self.detach_pose else t
        R, t = apply_delta_pose(
            d_rot, d_trans, R_prev, t_prev,
            depth_transform=self.depth_transform,
            detach_depth_for_xy=self.detach_depth_for_xy,
        )

        # pose-induced flow for the next lookup, at tap pixels only, then
        # the same 2-tap h-then-w blend + 1/scale the dense downsample does
        sub_points, sub_valid, pix_sub, wy_lo, wy_hi, wx_lo, wx_hi = lowres
        fv = flow_from_object_points_at(
            sub_points, sub_valid, R, t, internal_k, pix_sub,
            self.invalid_flow_num,
        )  # (N, 2h, 2w, 2)
        ho = wy_lo.shape[0]
        wo = wx_lo.shape[0]
        y1 = (wy_lo[None, :, None, None] * fv[:, :ho]
              + wy_hi[None, :, None, None] * fv[:, ho:])
        y2 = (wx_lo[None, None, :, None] * y1[:, :, :wo]
              + wx_hi[None, None, :, None] * y1[:, :, wo:])
        new_flow_small = (1.0 / scale) * y2

        new_carry = (new_flow_small, mask, h_feat, R, t)
        ys = (flow_small, delta_flow, mask, R, t, d_rot, d_trans)
        return new_carry, ys


_SEQ_KEYS = (
    "flow_from_pose", "flow_from_pred", "rotations", "translations",
    "masks", "delta_rotations", "delta_translations",
)


def _flow_seq_from_poses(points_obj, valid, R_seq, t_seq, K, invalid_num):
    """Dense pose-induced flow for a sequence of poses: (I, N, H, W, 2).
    Same arithmetic as geometry.flow.flow_from_object_points with a leading
    iteration axis (avoids materializing I copies of the point cloud)."""
    pts_cam = (
        jnp.einsum("snij,nhwj->snhwi", R_seq, points_obj)
        + t_seq[:, :, None, None, :]
    )
    uvw = jnp.einsum("nij,snhwj->snhwi", K, pts_cam)
    z = jnp.where(valid[None, ..., None], uvw[..., 2:3], 1.0)
    xy_dst = uvw[..., :2] / z
    h, w = points_obj.shape[1:3]
    flow = xy_dst - coords_grid(h, w, points_obj.dtype)[None, None]
    return jnp.where(
        valid[None, ..., None], flow,
        jnp.asarray(invalid_num, points_obj.dtype),
    )


@DECODERS.register_module("SCFlowDecoder")
class SCFlowDecoder(nn.Module):
    net_type: str = "Basic"
    num_levels: int = 4
    radius: int = 4
    iters: int = 8
    detach_flow: bool = True
    detach_mask: bool = True
    detach_pose: bool = True
    detach_depth_for_xy: bool = False
    mask_flow: bool = False
    mask_corr: bool = False
    depth_transform: str = "exp"
    gru_type: str = "SeqConv"
    gru_fuse_gates: bool = False
    feat_channels: int = 256
    pose_head_cfg: Optional[dict] = None
    dtype: Any = None
    unroll: bool = True
    scan_unroll: int = 1
    lookup_backend: str = "xla"

    @property
    def h_channels(self):
        return _H_CHANNELS[self.net_type]

    @property
    def cxt_channels(self):
        return _CXT_CHANNELS[self.net_type]

    def _update_cfg(self, invalid_flow_num: float,
                    lookup_backend: Optional[str] = None) -> dict:
        return dict(
            lookup_backend=lookup_backend or self.lookup_backend,
            net_type=self.net_type,
            num_levels=self.num_levels,
            radius=self.radius,
            detach_flow=self.detach_flow,
            detach_mask=self.detach_mask,
            detach_pose=self.detach_pose,
            detach_depth_for_xy=self.detach_depth_for_xy,
            mask_flow=self.mask_flow,
            mask_corr=self.mask_corr,
            depth_transform=self.depth_transform,
            gru_type=self.gru_type,
            gru_fuse_gates=self.gru_fuse_gates,
            feat_channels=self.feat_channels,
            invalid_flow_num=invalid_flow_num,
            pose_head_cfg=self.pose_head_cfg,
            dtype=self.dtype,
        )

    @nn.compact
    def __call__(
        self,
        feat_render: jnp.ndarray,  # (N, h, w, C)
        feat_real: jnp.ndarray,  # (N, h, w, C)
        h_feat: jnp.ndarray,  # (N, h, w, 128)
        cxt_feat: jnp.ndarray,  # (N, h, w, 128)
        ref_rotation: jnp.ndarray,  # (N, 3, 3)
        ref_translation: jnp.ndarray,  # (N, 3)
        depth: jnp.ndarray,  # (N, H, W) rendered depth
        internal_k: jnp.ndarray,  # (N, 3, 3)
        label: jnp.ndarray,  # (N,)
        init_flow: Optional[jnp.ndarray] = None,  # (N, H, W, 2)
        invalid_flow_num: float = 0.0,
        iters: Optional[int] = None,
        output_sequences: bool = True,
        unroll: Optional[bool] = None,
        scan_unroll: Optional[int] = None,
        lookup_backend: Optional[str] = None,
        pose_only: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        iters = self.iters if iters is None else iters
        unroll = self.unroll if unroll is None else unroll
        if iters == 1:
            # a length-1 lax.scan is pure overhead: measured +9.4 ms vs the
            # linear iters trend at the flagship shapes (docs/PERFORMANCE.md
            # "Recurrence marginal cost") — XLA lowers it through a worse
            # specialization.  The unrolled body is the same computation on
            # the same param tree (tests/test_models.py::
            # test_scan_matches_unroll), so route 1-iteration calls there.
            unroll = True
        scan_unroll = (self.scan_unroll if scan_unroll is None
                       else scan_unroll)
        scale = 2 ** (self.num_levels - 1)
        n, img_h, img_w = depth.shape

        # the pallas lookup consumes lane-dense flat maps directly (no
        # per-iteration relayout); the XLA tent path keeps (B, S, S, 1)
        backend = resolve_lookup_backend(lookup_backend or self.lookup_backend)
        square = feat_render.shape[1] == feat_render.shape[2]
        pyr_fn = (correlation_pyramid_flat if backend == "pallas" and square
                  else correlation_pyramid)
        pyramid = tuple(
            pyr_fn(feat_render, feat_real, self.num_levels,
                   out_dtype=self.dtype)
        )

        # static tap-pixel geometry for the in-loop low-res pose flow: the
        # 1/scale bilinear downsample reads rows ylo/yhi and cols xlo/xhi
        h_out, w_out = img_h // scale, img_w // scale
        ylo, yhi, wy_lo, wy_hi = interp_taps(img_h, h_out, True)
        xlo, xhi, wx_lo, wx_hi = interp_taps(img_w, w_out, True)
        ridx = np.concatenate([ylo, yhi])
        cidx = np.concatenate([xlo, xhi])
        gx, gy = np.meshgrid(cidx.astype(np.float32),
                             ridx.astype(np.float32), indexing="xy")
        pix_sub = jnp.asarray(np.stack([gx, gy], axis=-1))  # (2h, 2w, 2)
        if pose_only:
            # pose-only output surface (the reference's test-time forward,
            # models/refiner/scflow_refiner.py:174-179, returns only
            # pose/labels/scores): the full-res reconstructions below are
            # skipped, so lift only the tap pixels the in-loop downsample
            # reads — (2h', 2w') instead of (H, W), a scale²/4 reduction
            sub_points, sub_valid = lift_depth_to_object_points_at(
                depth[:, ridx][:, :, cidx], internal_k, ref_rotation,
                ref_translation, pix_sub,
            )
        else:
            # dense lift of the rendered depth under the ref pose (once)
            points_obj, points_valid = lift_depth_to_object_points(
                depth, internal_k, ref_rotation, ref_translation
            )
            sub_points = points_obj[:, ridx][:, :, cidx]
            sub_valid = points_valid[:, ridx][:, :, cidx]
        lowres = (
            sub_points, sub_valid, pix_sub,
            jnp.asarray(wy_lo), jnp.asarray(wy_hi),
            jnp.asarray(wx_lo), jnp.asarray(wx_hi),
        )

        if init_flow is None:
            flow_small0 = jnp.zeros((n, h_out, w_out, 2), jnp.float32)
        else:
            flow_small0 = (1.0 / scale) * interpolate_bilinear(
                init_flow, 1.0 / scale
            )
        carry = (
            flow_small0,
            jnp.ones((n, h_out, w_out, 1), feat_render.dtype),
            h_feat,
            ref_rotation,
            ref_translation,
        )
        cfg = self._update_cfg(invalid_flow_num, lookup_backend)

        if unroll:
            update = _SCFlowUpdate(name="update", **cfg)
            collected = []
            for it in range(iters):
                carry, ys = update(
                    carry, pyramid, cxt_feat, lowres, internal_k, label,
                )
                if output_sequences or it == iters - 1:
                    collected.append(ys)
            stacked = tuple(
                jnp.stack([c[i] for c in collected], axis=0)
                for i in range(len(collected[0]))
            )
        else:
            # scan_unroll > 1 asks lax.scan to unroll that many update
            # steps per loop body — same semantics.  A/B'd on v5e at the
            # flagship shapes: factors 2/4/8 all LOSE ~7% vs 1 (the body is
            # already one fused region per iteration, and the larger body
            # schedules worse — docs/PERFORMANCE.md "scan_unroll A/B");
            # keep 1 unless re-measured on other shapes/hardware
            scan_cls = nn.scan(
                _SCFlowUpdate,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=(nn.broadcast,) * 5,
                length=iters,
                unroll=scan_unroll,
            )
            carry, stacked = scan_cls(name="update", **cfg)(
                carry, pyramid, cxt_feat, lowres, internal_k, label,
            )
            if not output_sequences:
                stacked = tuple(y[-1:] for y in stacked)

        fs, df, ms, Rs, ts, drs, dts = stacked
        if pose_only:
            return {
                "rotations": Rs,
                "translations": ts,
                "delta_rotations": drs,
                "delta_translations": dts,
            }
        seq = fs.shape[0]
        # full-res reconstructions, only for the requested iterations
        flow_from_pose = _flow_seq_from_poses(
            points_obj, points_valid, Rs, ts, internal_k, invalid_flow_num
        )
        flow_from_pred = scale * interpolate_bilinear(
            (fs + df).astype(jnp.float32).reshape(seq * n, h_out, w_out, 2),
            scale,
        ).reshape(seq, n, img_h, img_w, 2)
        masks = interpolate_bilinear(
            ms.reshape(seq * n, h_out, w_out, 1), scale
        ).reshape(seq, n, img_h, img_w)

        return dict(zip(_SEQ_KEYS, (
            flow_from_pose, flow_from_pred, Rs, ts, masks, drs, dts,
        )))
