"""Motion encoder, convolutional GRU, and prediction heads (XHead).

Reference: models/decoder/raft_decoder.py:61-294.  All convs are bias+ReLU
(no norm), matching the shipped configs (conv_cfg/norm_cfg None, act ReLU).
"""

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from scflow_tpu.models.layers import ConvModule

_MOTION_ARCH = {
    # net_type: (corr (ch, k, p) list, flow list, out list)
    "Basic": (
        [(256, 1, 0), (192, 3, 1)],
        [(128, 7, 3), (64, 3, 1)],
        [(126, 3, 1)],
    ),
    "Large": (
        [(256, 1, 0), (192, 3, 1)],
        [(128, 7, 3), (64, 3, 1)],
        [(126, 3, 1)],
    ),
    "Small": (
        [(96, 1, 0)],
        [(64, 7, 3), (32, 3, 1)],
        [(80, 3, 1)],
    ),
}


class MotionEncoder(nn.Module):
    """(corr, flow) -> motion feature; output = concat[out_net(...), flow]."""

    net_type: str = "Basic"
    dtype: Any = None

    @property
    def out_channels(self) -> int:
        return _MOTION_ARCH[self.net_type][2][-1][0] + 2

    @nn.compact
    def __call__(self, corr: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
        corr_arch, flow_arch, out_arch = _MOTION_ARCH[self.net_type]
        c = corr
        for i, (ch, k, p) in enumerate(corr_arch):
            c = ConvModule(ch, k, padding=p, act="relu", dtype=self.dtype,
                           name=f"corr_net{i}")(c)
        f = flow
        for i, (ch, k, p) in enumerate(flow_arch):
            f = ConvModule(ch, k, padding=p, act="relu", dtype=self.dtype,
                           name=f"flow_net{i}")(f)
        out = jnp.concatenate([c, f], axis=-1)
        for i, (ch, k, p) in enumerate(out_arch):
            out = ConvModule(ch, k, padding=p, act="relu", dtype=self.dtype,
                             name=f"out_net{i}")(out)
        return jnp.concatenate([out, flow], axis=-1)


class _ConvParam(nn.Module):
    """Bare kernel+bias with nn.Conv's param names/inits — declared (not
    run) so a caller can fuse several convs into one dispatch."""

    features: int
    ksize: Tuple[int, int]

    @nn.compact
    def __call__(self, cin: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.ksize, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _ConvHolder(nn.Module):
    """Param scope shaped exactly like ConvModule (child named 'conv') so
    checkpoints and the torch converter see an identical tree whether the
    gates run fused or not."""

    features: int
    ksize: Tuple[int, int]

    @nn.compact
    def __call__(self, cin: int):
        return _ConvParam(self.features, self.ksize, name="conv")(cin)


def _conv2d(x, kernel, bias, pad, dtype):
    if dtype is not None:
        x, kernel, bias = (x.astype(dtype), kernel.astype(dtype),
                           bias.astype(dtype))
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1),
        padding=((pad[0], pad[0]), (pad[1], pad[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias


class ConvGRU(nn.Module):
    """GRU cell with convolutions; SeqConv = two passes with (1,5)/(5,1) kernels.

    h' = (1 - z) * h + z * q,  z/r sigmoid convs, q tanh conv on [r*h, x].

    fuse_gates=True runs z and r as ONE conv dispatch (kernels concatenated
    along output channels at apply time): per-output-channel dot products
    are independent, so the fusion computes the same reductions while
    reading the (N, H, W, h+x) operand once instead of twice — the GRU is
    the recurrence's bandwidth hot spot at 1/8 resolution.  The param tree
    is identical either way (conv_z{i}/conv, conv_r{i}/conv, ...), so
    checkpoints convert and load interchangeably.
    """

    h_channels: int
    net_type: str = "SeqConv"
    dtype: Any = None
    fuse_gates: bool = False

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        if self.net_type == "Conv":
            kernels, paddings = [(3, 3)], [(1, 1)]
        else:
            kernels, paddings = [(1, 5), (5, 1)], [(0, 2), (2, 0)]
        for i, (k, p) in enumerate(zip(kernels, paddings)):
            hx = jnp.concatenate([h, x], axis=-1)
            if self.fuse_gates:
                kk = (k, k) if isinstance(k, int) else k
                cin = hx.shape[-1]
                kz, bz = _ConvHolder(self.h_channels, kk,
                                     name=f"conv_z{i}")(cin)
                kr, br = _ConvHolder(self.h_channels, kk,
                                     name=f"conv_r{i}")(cin)
                kq, bq = _ConvHolder(self.h_channels, kk,
                                     name=f"conv_q{i}")(cin)
                zr = _conv2d(hx, jnp.concatenate([kz, kr], axis=-1),
                             jnp.concatenate([bz, br]), p, self.dtype)
                z = nn.sigmoid(zr[..., : self.h_channels])
                r = nn.sigmoid(zr[..., self.h_channels :])
                q = nn.tanh(_conv2d(
                    jnp.concatenate([r * h, x], axis=-1), kq, bq, p,
                    self.dtype))
            else:
                z = ConvModule(
                    self.h_channels, k, padding=p, act="sigmoid",
                    dtype=self.dtype, name=f"conv_z{i}",
                )(hx)
                r = ConvModule(
                    self.h_channels, k, padding=p, act="sigmoid",
                    dtype=self.dtype, name=f"conv_r{i}",
                )(hx)
                q = ConvModule(
                    self.h_channels, k, padding=p, act="tanh",
                    dtype=self.dtype, name=f"conv_q{i}",
                )(jnp.concatenate([r * h, x], axis=-1))
            h = (1.0 - z) * h + z * q
        return h


class XHead(nn.Module):
    """Two-conv prediction head for flow/mask/upsample-mask outputs."""

    feat_channels: Sequence[int]
    x_channels: int
    kind: str = "flow"  # 'flow' | 'mask'
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, ch in enumerate(self.feat_channels):
            x = ConvModule(ch, 3, padding=1, act="relu", dtype=self.dtype,
                           name=f"layer{i}")(x)
        if self.kind == "flow":
            return nn.Conv(
                self.x_channels, (3, 3), padding=((1, 1), (1, 1)),
                dtype=self.dtype, name="predict",
            )(x)
        elif self.kind == "mask":
            return nn.Conv(self.x_channels, (1, 1), dtype=self.dtype,
                           name="predict")(x)
        raise ValueError(self.kind)
