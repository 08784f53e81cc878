"""Dense blocks (reference models/backbone/densenet.py:10-110 — registered
by the reference but unused by its shipped configs; provided for parity and
for custom encoder configs)."""

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from scflow_tpu.registry import BACKBONES


class DenseLayer(nn.Module):
    feat_channels: int
    norm: Optional[str] = None
    negative_slope: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out = nn.Conv(
            self.feat_channels, (3, 3), padding=((1, 1), (1, 1)),
            use_bias=self.norm is None, dtype=self.dtype, name="conv",
        )(x)
        if self.norm == "BN":
            out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, name="norm")(out)
        elif self.norm == "GN":
            out = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="norm")(out)
        out = nn.leaky_relu(out, self.negative_slope)
        return jnp.concatenate([out, x], axis=-1)


@BACKBONES.register_module("BasicDenseBlock")
class BasicDenseBlock(nn.Module):
    feat_channels: Sequence[int] = (128, 128, 96, 64, 32)
    norm: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, ch in enumerate(self.feat_channels):
            x = DenseLayer(ch, norm=self.norm, dtype=self.dtype,
                           name=f"layer{i}")(x, train)
        return x
