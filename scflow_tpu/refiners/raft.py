"""RAFT baseline refiners (flow-only and flow+occlusion).

Reference: models/refiner/raft_refiner_flow.py and
raft_refiner_flow_mask.py (network part).  Pose recovery from flow (PnP on
2D-3D correspondences) lives in scflow_tpu.geometry.pnp / the eval pipeline.
"""

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from scflow_tpu.models.raft_decoder import RAFTDecoder
from scflow_tpu.models.raft_encoder import RAFTEncoder
from scflow_tpu.registry import REFINERS


class _RAFTRefinerBase(nn.Module):
    seperate_encoder: bool = False
    h_channels: int = 128
    cxt_channels: int = 128
    encoder_out_channels: int = 256
    encoder_norm: str = "IN"
    cxt_norm: str = "BN"
    net_type: str = "Basic"
    num_levels: int = 4
    radius: int = 4
    iters: int = 12
    gru_type: str = "SeqConv"
    gru_fuse_gates: bool = False
    convex_upsample_flow: bool = True
    max_flow: float = 400.0
    predict_occlusion: bool = False
    dtype: Any = None

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
        self.decoder = RAFTDecoder(
            net_type=self.net_type,
            num_levels=self.num_levels,
            radius=self.radius,
            iters=self.iters,
            gru_type=self.gru_type,
            gru_fuse_gates=self.gru_fuse_gates,
            convex_upsample_flow=self.convex_upsample_flow,
            predict_occlusion=self.predict_occlusion,
            dtype=self.dtype,
            name="decoder",
        )

    def extract_feat(self, render_images, real_images, train: bool = False):
        """Multi-view broadcast (raft_refiner_flow_mask.py:88-118): a single
        unbatched (H, W, 3) image on either side is encoded once and expanded
        across the other side's views."""
        if real_images.ndim == 3:
            real_feat = self.real_encoder(real_images[None], train)
            real_feat = jnp.broadcast_to(
                real_feat, (render_images.shape[0],) + real_feat.shape[1:]
            )
        else:
            real_feat = self.real_encoder(real_images, train)
        if render_images.ndim == 3:
            views = real_images.shape[0]
            render_feat = self.render_encoder(render_images[None], train)
            cxt = self.context(render_images[None], train)
            render_feat = jnp.broadcast_to(
                render_feat, (views,) + render_feat.shape[1:]
            )
            cxt = jnp.broadcast_to(cxt, (views,) + cxt.shape[1:])
            h_feat = nn.tanh(cxt[..., : self.h_channels])
            cxt_feat = nn.relu(cxt[..., self.h_channels :])
            return render_feat, real_feat, h_feat, cxt_feat
        render_feat = self.render_encoder(render_images, train)
        cxt = self.context(render_images, train)
        h_feat = nn.tanh(cxt[..., : self.h_channels])
        cxt_feat = nn.relu(cxt[..., self.h_channels :])
        return render_feat, real_feat, h_feat, cxt_feat

    def __call__(
        self,
        render_images: jnp.ndarray,
        real_images: jnp.ndarray,
        init_flow: Optional[jnp.ndarray] = None,
        iters: Optional[int] = None,
        train: bool = False,
        lookup_backend: Optional[str] = None,
    ) -> Dict[str, jnp.ndarray]:
        feat_render, feat_real, h_feat, cxt_feat = self.extract_feat(
            render_images, real_images, train
        )
        if init_flow is None:
            n, h, w, _ = feat_real.shape
            init_flow = jnp.zeros((n, h, w, 2), feat_real.dtype)
        return self.decoder(
            feat_render, feat_real, init_flow, h_feat, cxt_feat, iters=iters,
            lookup_backend=lookup_backend,
        )


@REFINERS.register_module("RAFTRefinerFlow")
class RAFTRefinerFlow(_RAFTRefinerBase):
    predict_occlusion: bool = False


@REFINERS.register_module("RAFTRefinerFlowMask")
class RAFTRefinerFlowMask(_RAFTRefinerBase):
    predict_occlusion: bool = True
