"""Full ResNet / ResNetV1d backbones (reference models/backbone/resnet.py:
306-773 — registered in the reference but unused by its shipped configs;
ported for inventory completeness so custom configs can reach them).

TPU notes: NHWC layout throughout; the stem maxpool is a reduce_window
(nn.max_pool); `frozen_stages` freezes by stop_gradient on the stage
OUTPUT (the functional analog of requires_grad=False + eval-mode norm —
with use_running_average the norm is already stateless).  Checkpoint
conversion: module names map onto the torch layout via
runtime/convert_torch.py (stage{i}_block{b} -> layer{i}.{b}, deep-stem
stem{j} -> stem.{j}, V1d avgdown_* -> downsample.{1,2}).
"""

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from scflow_tpu.models.raft_encoder import BasicBlock, Bottleneck, _Norm
from scflow_tpu.registry import BACKBONES


_ARCH_SETTINGS = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


@BACKBONES.register_module("ResNet")
class ResNet(nn.Module):
    """Input (N, H, W, C) -> tuple of stage features at `out_indices`
    (1/4, 1/8, 1/16, 1/32 scales for the default strides)."""

    depth: int = 50
    in_channels: int = 3
    stem_channels: Optional[int] = None
    base_channels: int = 64
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    deep_stem: bool = False
    avg_down: bool = False
    frozen_stages: int = -1
    norm: Optional[str] = "BN"
    dtype: Any = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, ...]:
        if self.depth not in _ARCH_SETTINGS:
            raise KeyError(f"invalid depth {self.depth} for ResNet")
        assert 1 <= self.num_stages <= 4
        assert len(self.strides) == len(self.dilations) == self.num_stages
        assert max(self.out_indices) < self.num_stages
        block_cls, stage_blocks = _ARCH_SETTINGS[self.depth]
        stage_blocks = stage_blocks[: self.num_stages]
        stem_ch = self.stem_channels or self.base_channels
        expansion = block_cls.expansion

        # frozen stages run with eval-mode norms (reference _freeze_stages
        # calls .eval(), resnet.py:613-629): without this, BN batch_stats of
        # a "frozen" stage would keep updating from new data in train mode
        stem_train = train and self.frozen_stages < 0
        if self.deep_stem:
            half = stem_ch // 2
            for j, (ch, s) in enumerate(((half, 2), (half, 1), (stem_ch, 1))):
                x = nn.Conv(ch, (3, 3), strides=(s, s),
                            padding=((1, 1), (1, 1)), use_bias=False,
                            dtype=self.dtype, name=f"stem{3 * j}")(x)
                x = _Norm(self.norm, name=f"stem{3 * j + 1}")(x, stem_train)
                x = nn.relu(x)
        else:
            x = nn.Conv(stem_ch, (7, 7), strides=(2, 2),
                        padding=((3, 3), (3, 3)), use_bias=False,
                        dtype=self.dtype, name="conv1")(x)
            x = _Norm(self.norm, name="norm1")(x, stem_train)
            x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        inplanes = stem_ch
        for i, num_blocks in enumerate(stage_blocks):
            planes = self.base_channels * 2**i
            stage_train = train and self.frozen_stages < i + 1
            for b in range(num_blocks):
                s = self.strides[i] if b == 0 else 1
                need_ds = (s != 1) or (inplanes != planes * expansion)
                x = block_cls(
                    planes=planes, stride=s, dilation=self.dilations[i],
                    norm=self.norm, with_downsample=need_ds,
                    avg_down=self.avg_down, dtype=self.dtype,
                    name=f"stage{i + 1}_block{b}",
                )(x, stage_train)
                inplanes = planes * expansion
            if self.frozen_stages >= i + 1:
                x = jax.lax.stop_gradient(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


@BACKBONES.register_module("ResNetV1d")
class ResNetV1d(ResNet):
    """ResNetV1d (reference resnet.py:736-773): deep 3x3 stem + avg-pool
    downsampling in the identity branches."""

    deep_stem: bool = True
    avg_down: bool = True
