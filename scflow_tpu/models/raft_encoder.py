"""RAFT feature/context encoder (reference models/encoder/raft_encoder.py).

'Basic' arch: 7x7 stride-2 stem + 3 residual stages of 2 BasicBlocks
(channels 64/96/128, strides 1/2/2 -> 1/8 scale) + 1x1 output conv.
BasicBlocks keep the mmcv layout (conv3x3+bias -> norm -> relu -> conv3x3+bias
-> norm, 1x1+norm downsample on stride/channel change, residual add -> relu;
reference models/backbone/resnet.py:14-95).
"""

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from scflow_tpu.models.layers import InstanceNorm
from scflow_tpu.registry import ENCODERS


class _Norm(nn.Module):
    kind: Optional[str]
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind is None:
            return x
        if self.kind == "BN":
            # dtype keeps the compute dtype through the norm (stats are
            # fp32 in flax regardless); without it a bf16 encoder's BN
            # outputs promote to fp32 and every consumer pays a cast —
            # see the same note in models/layers.ConvModule
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="n"
            )(x)
        if self.kind == "IN":
            return InstanceNorm(name="n")(x)
        if self.kind == "GN":
            return nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                dtype=self.dtype, name="n")(x)
        raise ValueError(self.kind)


def _downsample_branch(x, out_ch, stride, norm, avg_down, dtype, train):
    """Identity-branch projection (reference ResLayer, resnet.py:697-732):
    1x1 conv WITH bias (the reference keeps `bias=True` with an unresolved
    TODO — load-bearing for checkpoint conversion) + norm; with avg_down
    (V1d) a stride-s avg-pool precedes a stride-1 conv, shifting the torch
    Sequential indices to downsample.1/.2 (flax names avgdown_*)."""
    if avg_down and stride != 1:
        # reference pools with ceil_mode=True + count_include_pad=False
        # (resnet.py:716-720): pad the high edges up to a multiple of the
        # stride and exclude the padding from each window's divisor, so odd
        # spatial sizes keep matching the main branch's ceil(H/s) shape
        ph = (-x.shape[1]) % stride
        pw = (-x.shape[2]) % stride
        x = nn.avg_pool(x, (stride, stride), strides=(stride, stride),
                        padding=((0, ph), (0, pw)), count_include_pad=False)
        x = nn.Conv(out_ch, (1, 1), use_bias=True, dtype=dtype,
                    name="avgdown_conv")(x)
        return _Norm(norm, dtype=dtype, name="avgdown_norm")(x, train)
    x = nn.Conv(out_ch, (1, 1), strides=(stride, stride), use_bias=True,
                dtype=dtype, name="downsample_conv")(x)
    return _Norm(norm, dtype=dtype, name="downsample_norm")(x, train)


class Bottleneck(nn.Module):
    """mmcv Bottleneck, 'pytorch' style: stride on conv2, expansion 4,
    convs bias-free (reference models/backbone/resnet.py:97-260)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    norm: Optional[str] = "BN"
    with_downsample: bool = False
    avg_down: bool = False
    dtype: Any = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        d = self.dilation
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = _Norm(self.norm, dtype=self.dtype, name="norm1")(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((d, d), (d, d)), kernel_dilation=(d, d),
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = _Norm(self.norm, dtype=self.dtype, name="norm2")(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = _Norm(self.norm, dtype=self.dtype, name="norm3")(out, train)
        if self.with_downsample:
            identity = _downsample_branch(
                x, self.planes * self.expansion, self.stride, self.norm,
                self.avg_down, self.dtype, train,
            )
        return nn.relu(out + identity)


class BasicBlock(nn.Module):
    """mmcv-modified BasicBlock: 3x3 convs WITH bias (reference
    resnet.py:36-48 — this repo's resnet.py diverges from stock mmcv
    here), dilation on conv1."""

    planes: int
    stride: int = 1
    dilation: int = 1
    norm: Optional[str] = "BN"
    with_downsample: bool = False
    avg_down: bool = False
    dtype: Any = None
    expansion: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        d = self.dilation
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=((d, d), (d, d)), kernel_dilation=(d, d), use_bias=True,
            dtype=self.dtype, name="conv1",
        )(x)
        out = _Norm(self.norm, dtype=self.dtype, name="norm1")(out, train)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
            dtype=self.dtype, name="conv2",
        )(out)
        out = _Norm(self.norm, dtype=self.dtype, name="norm2")(out, train)
        if self.with_downsample:
            identity = _downsample_branch(
                x, self.planes, self.stride, self.norm, self.avg_down,
                self.dtype, train,
            )
        return nn.relu(out + identity)


@ENCODERS.register_module("RAFTEncoder")
class RAFTEncoder(nn.Module):
    """Input (N, H, W, in_channels) -> (N, H/8, W/8, out_channels)."""

    in_channels: int = 3
    out_channels: int = 256
    net_type: str = "Basic"
    norm: Optional[str] = "BN"
    scale: float = 1.0 / 8
    dtype: Any = None

    _base_channels = {"Basic": (64, 96, 128), "Large": (64, 96),
                      "Small": (8, 16, 24)}
    _strides = {"Basic": (1, 2, 2), "Large": (1, 2), "Small": (1, 2, 2)}
    _stem_channels = {"Basic": 64, "Large": 64, "Small": 32}
    _stage_blocks = {"Basic": (2, 2, 2), "Large": (2, 2), "Small": (2, 2, 2)}

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.net_type not in self._base_channels:
            raise KeyError(f"net_type {self.net_type} unsupported")
        stem_stride = 1 if self.scale == 1.0 / 4 else 2
        stem_ch = self._stem_channels[self.net_type]
        x = nn.Conv(
            stem_ch, (7, 7), strides=(stem_stride, stem_stride),
            padding=((3, 3), (3, 3)), use_bias=True, dtype=self.dtype,
            name="stem_conv",
        )(x)
        x = _Norm(self.norm, dtype=self.dtype, name="stem_norm")(x, train)
        x = nn.relu(x)

        inplanes = stem_ch
        for i, (planes, stride, blocks) in enumerate(
            zip(
                self._base_channels[self.net_type],
                self._strides[self.net_type],
                self._stage_blocks[self.net_type],
            )
        ):
            block_cls = Bottleneck if self.net_type == "Small" else BasicBlock
            expansion = 4 if self.net_type == "Small" else 1
            for b in range(blocks):
                s = stride if b == 0 else 1
                need_ds = (s != 1) or (inplanes != planes * expansion)
                x = block_cls(
                    planes=planes, stride=s, norm=self.norm,
                    with_downsample=need_ds, dtype=self.dtype,
                    name=f"layer{i + 1}_block{b}",
                )(x, train)
                inplanes = planes * expansion
        x = nn.Conv(
            self.out_channels, (1, 1), use_bias=True, dtype=self.dtype,
            name="out_conv",
        )(x)
        return x
