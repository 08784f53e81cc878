"""SCFlow refiner network: encoder pair + context encoder + SCFlow decoder.

Reference: models/refiner/scflow_refiner.py (network part).  Rendering,
normalization, loss composition and the train/test steps live outside the
nn.Module (scflow_tpu.runtime / scflow_tpu.refiners.system) — the module is
a pure function of (images, poses) -> prediction sequences.
"""

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from scflow_tpu.models.raft_encoder import RAFTEncoder
from scflow_tpu.models.scflow_decoder import SCFlowDecoder
from scflow_tpu.registry import REFINERS


@REFINERS.register_module("SCFlowRefiner")
class SCFlowRefiner(nn.Module):
    seperate_encoder: bool = False
    h_channels: int = 128
    cxt_channels: int = 128
    encoder_out_channels: int = 256
    encoder_norm: str = "IN"
    cxt_norm: str = "BN"
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
    pose_head_cfg: Optional[dict] = None
    max_flow: float = 400.0
    dtype: Any = None
    unroll: bool = True
    scan_unroll: int = 1

    def setup(self):
        self.render_encoder = RAFTEncoder(
            out_channels=self.encoder_out_channels,
            net_type=self.net_type,
            norm=self.encoder_norm,
            dtype=self.dtype,
            name="render_encoder",
        )
        if self.seperate_encoder:
            self.real_encoder = RAFTEncoder(
                out_channels=self.encoder_out_channels,
                net_type=self.net_type,
                norm=self.encoder_norm,
                dtype=self.dtype,
                name="real_encoder",
            )
        else:
            self.real_encoder = self.render_encoder
        self.context = RAFTEncoder(
            out_channels=self.h_channels + self.cxt_channels,
            net_type=self.net_type,
            norm=self.cxt_norm,
            dtype=self.dtype,
            name="context",
        )
        self.decoder = SCFlowDecoder(
            net_type=self.net_type,
            num_levels=self.num_levels,
            radius=self.radius,
            iters=self.iters,
            detach_flow=self.detach_flow,
            detach_mask=self.detach_mask,
            detach_pose=self.detach_pose,
            detach_depth_for_xy=self.detach_depth_for_xy,
            mask_flow=self.mask_flow,
            mask_corr=self.mask_corr,
            depth_transform=self.depth_transform,
            gru_type=self.gru_type,
            gru_fuse_gates=self.gru_fuse_gates,
            pose_head_cfg=self.pose_head_cfg,
            dtype=self.dtype,
            unroll=self.unroll,
            scan_unroll=self.scan_unroll,
            name="decoder",
        )

    def extract_feat(self, render_images, real_images, train: bool = False):
        """Feature + context extraction (scflow_refiner.py:88-110).  With a
        shared feature encoder, both images run as ONE doubled batch — one
        conv dispatch with better MXU utilization than two half-size passes.
        (InstanceNorm is per-sample, so the fusion is numerically exact.)"""
        if not self.seperate_encoder:
            n = render_images.shape[0]
            both = jnp.concatenate([render_images, real_images], axis=0)
            feats = self.render_encoder(both, train)
            render_feat, real_feat = feats[:n], feats[n:]
        else:
            render_feat = self.render_encoder(render_images, train)
            real_feat = self.real_encoder(real_images, train)
        cxt = self.context(render_images, train)
        h_feat = nn.tanh(cxt[..., : self.h_channels])
        cxt_feat = nn.relu(cxt[..., self.h_channels :])
        return render_feat, real_feat, h_feat, cxt_feat

    def __call__(
        self,
        render_images: jnp.ndarray,  # (N, H, W, 3) normalized
        real_images: jnp.ndarray,  # (N, H, W, 3) normalized
        ref_rotation: jnp.ndarray,  # (N, 3, 3)
        ref_translation: jnp.ndarray,  # (N, 3)
        depth: jnp.ndarray,  # (N, H, W) rendered depth
        internal_k: jnp.ndarray,  # (N, 3, 3)
        label: jnp.ndarray,  # (N,)
        init_flow: Optional[jnp.ndarray] = None,
        iters: Optional[int] = None,
        train: bool = False,
        output_sequences: bool = True,
        unroll: Optional[bool] = None,
        lookup_backend: Optional[str] = None,
        pose_only: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        feat_render, feat_real, h_feat, cxt_feat = self.extract_feat(
            render_images, real_images, train
        )
        return self.decoder(
            feat_render,
            feat_real,
            h_feat,
            cxt_feat,
            ref_rotation,
            ref_translation,
            depth,
            internal_k,
            label,
            init_flow=init_flow,
            invalid_flow_num=0.0,
            iters=iters,
            output_sequences=output_sequences,
            unroll=unroll,
            lookup_backend=lookup_backend,
            pose_only=pose_only,
        )
