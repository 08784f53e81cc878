"""RAFT iterative decoders (flow-only and flow+occlusion variants).

Reference: models/decoder/raft_decoder.py:299-456 and
models/decoder/raft_decoder_mask.py:21-208.  Flow lives at 1/8 resolution
inside the loop; each iteration emits a convex-upsampled full-resolution
prediction (learned 9-way softmax over a 3x3 neighborhood per 8x8 subpixel).
The loop is statically unrolled inside a single jit scope.
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from scflow_tpu.models.motion import ConvGRU, MotionEncoder, XHead
from scflow_tpu.ops.corr import (
    corr_lookup_dispatch,
    correlation_pyramid,
    correlation_pyramid_flat,
    resolve_lookup_backend,
)
from scflow_tpu.ops.resize import interpolate_bilinear
from scflow_tpu.ops.upsample import convex_upsample
from scflow_tpu.registry import DECODERS

_H_CHANNELS = {"Basic": 128, "Small": 96}
_CXT_CHANNELS = {"Basic": 128, "Small": 64}


@DECODERS.register_module("RAFTDecoder")
class RAFTDecoder(nn.Module):
    net_type: str = "Basic"
    num_levels: int = 4
    radius: int = 4
    iters: int = 12
    gru_type: str = "SeqConv"
    gru_fuse_gates: bool = False
    feat_channels: int = 256
    mask_channels: int = 64
    convex_upsample_flow: bool = True
    predict_occlusion: bool = False  # True -> RAFTDecoderMask behavior
    dtype: Any = None
    lookup_backend: str = "xla"

    @property
    def h_channels(self):
        return _H_CHANNELS[self.net_type]

    @property
    def cxt_channels(self):
        return _CXT_CHANNELS[self.net_type]

    @nn.compact
    def __call__(
        self,
        feat1: jnp.ndarray,
        feat2: jnp.ndarray,
        flow: jnp.ndarray,  # (N, h, w, 2) at 1/8 resolution (warm start)
        h_feat: jnp.ndarray,
        cxt_feat: jnp.ndarray,
        iters: Optional[int] = None,
        lookup_backend: Optional[str] = None,
    ) -> Dict[str, jnp.ndarray]:
        iters = self.iters if iters is None else iters
        lookup_backend = resolve_lookup_backend(
            lookup_backend or self.lookup_backend
        )
        scale = 2 ** (self.num_levels - 1)
        square = feat1.shape[1] == feat1.shape[2]
        pyr_fn = (correlation_pyramid_flat
                  if lookup_backend == "pallas" and square
                  else correlation_pyramid)
        pyramid = pyr_fn(feat1, feat2, self.num_levels, out_dtype=self.dtype)

        motion_enc = MotionEncoder(net_type=self.net_type, dtype=self.dtype,
                                   name="encoder")
        gru = ConvGRU(self.h_channels, net_type=self.gru_type, dtype=self.dtype,
                      fuse_gates=self.gru_fuse_gates, name="gru")
        flow_head = XHead((self.feat_channels,), 2, kind="flow",
                          dtype=self.dtype, name="flow_pred")
        up_mask_head = None
        if self.net_type == "Basic":
            up_mask_head = XHead(
                (self.feat_channels,),
                self.mask_channels * (2 * self.radius + 1),
                kind="mask",
                dtype=self.dtype,
                name="mask_pred",
            )
        occ_head = None
        if self.predict_occlusion:
            occ_head = XHead((self.feat_channels,), 1, kind="mask",
                             dtype=self.dtype, name="occlusion_pred")

        upflows, upoccs = [], []
        for _ in range(iters):
            flow = jax.lax.stop_gradient(flow)
            corr = corr_lookup_dispatch(pyramid, flow, self.radius,
                                        backend=lookup_backend)
            motion_feat = motion_enc(corr, flow)
            x = jnp.concatenate([cxt_feat, motion_feat], axis=-1)
            h_feat = gru(h_feat, x)
            delta_flow = flow_head(h_feat).astype(jnp.float32)
            flow = flow + delta_flow

            mask = None
            if up_mask_head is not None and self.convex_upsample_flow:
                mask = 0.25 * up_mask_head(h_feat)
            if mask is None:
                upflow = scale * interpolate_bilinear(flow, scale)
            else:
                upflow = convex_upsample(flow, mask, scale, multiplier=scale)
            upflows.append(upflow)

            if occ_head is not None:
                occ = nn.sigmoid(occ_head(h_feat))
                if mask is None:
                    upocc = interpolate_bilinear(occ, scale)
                else:
                    upocc = convex_upsample(occ, mask, scale, multiplier=1.0)
                upoccs.append(upocc[..., 0])

        out = {"flow": jnp.stack(upflows, axis=0)}
        if occ_head is not None:
            out["occlusion"] = jnp.stack(upoccs, axis=0)
        return out


@DECODERS.register_module("RAFTDecoderMask")
class RAFTDecoderMask(RAFTDecoder):
    predict_occlusion: bool = True
