"""Building-block layers (flax.linen, NHWC).

`ConvModule` mirrors the mmcv ConvModule used everywhere in the reference
(conv -> norm -> act order), with norm in {None, 'BN', 'IN', 'GN'} and act in
{None, 'relu', 'sigmoid', 'tanh'}.  Param layout is flax-native (HWIO
kernels); the torch checkpoint converter transposes OIHW -> HWIO.
"""

from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

KernelArg = Union[int, Tuple[int, int]]


def _pair(k: KernelArg) -> Tuple[int, int]:
    return (k, k) if isinstance(k, int) else tuple(k)


_ACTS: dict = {
    None: lambda x: x,
    "relu": nn.relu,
    "sigmoid": nn.sigmoid,
    "tanh": nn.tanh,
}


class InstanceNorm(nn.Module):
    """InstanceNorm2d (per-sample, per-channel over H, W), NHWC.

    Defaults match torch nn.InstanceNorm2d: affine=False, eps=1e-5, no
    running stats (the reference's RAFT feature encoder, scflow.py:28).
    """

    affine: bool = False
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # single-pass statistics (var = E[x^2] - mean^2, flax's
        # 'fast variance'): jnp.var re-reads x after the mean reduction,
        # an extra HBM pass over every 128^2 feature map — this form lets
        # XLA fuse both moments into one read (encoder -22% on v5e; same
        # distance from the fp64 oracle at activation scales, ~9e-7).
        # Stats always accumulate in fp32: a bf16 mean over 16k pixels
        # loses most of its mantissa (the upcast fuses into the reduce).
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=(1, 2), keepdims=True)
        sq = (xf * xf).mean(axis=(1, 2), keepdims=True)
        var = jnp.maximum(sq - mean * mean, 0.0)
        y = ((xf - mean) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        if self.affine:
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            y = y * scale + bias
        return y


class ConvModule(nn.Module):
    """conv -> norm -> act (mmcv ConvModule order)."""

    out_channels: int
    kernel_size: KernelArg = 3
    stride: int = 1
    padding: Union[int, Tuple[int, int]] = 0
    norm: Optional[str] = None
    act: Optional[str] = "relu"
    use_bias: Optional[bool] = None
    num_groups: int = 32
    dtype: Any = None  # computation dtype (params stay float32)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # mmcv disables conv bias when a norm follows
        bias = self.use_bias if self.use_bias is not None else self.norm is None
        kh, kw = _pair(self.kernel_size)
        ph, pw = _pair(self.padding)
        x = nn.Conv(
            self.out_channels,
            (kh, kw),
            strides=(self.stride, self.stride),
            padding=((ph, ph), (pw, pw)),
            use_bias=bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.norm == "BN":
            # dtype: keep the module's compute dtype through the norm — flax
            # computes the statistics in fp32 regardless (normalization.
            # _compute_stats "always at least float32"), so only the affine
            # output math runs reduced; without this the BN output silently
            # promotes to fp32 and every bf16 consumer pays a cast + the
            # fp32 elementwise bandwidth
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="norm"
            )(x)
        elif self.norm == "IN":
            x = InstanceNorm(name="norm")(x)
        elif self.norm == "GN":
            x = nn.GroupNorm(
                num_groups=self.num_groups, epsilon=1e-5, dtype=self.dtype,
                name="norm",
            )(x)
        elif self.norm is not None:
            raise ValueError(f"unknown norm {self.norm}")
        return _ACTS[self.act](x)
