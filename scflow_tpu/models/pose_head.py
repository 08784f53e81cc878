"""Delta-pose regression heads (reference models/head/pose_head.py).

3 stride-2 GN+ReLU convs -> flatten -> FC 1024 -> 256 -> rotation (ortho6d 6
or quaternion 4) + translation (3) linears, zero-init with identity-rotation
bias — load-bearing for training stability (pose_head.py:86-96).

MultiClassPoseHead predicts per-class outputs and gathers per *sample* label
(fixing the reference's batch-wide `label[0]` indexing defect, SURVEY.md
§2.4 item 3).

Flatten note: conv output is flattened in torch NCHW channel-major order so
converted torch FC weights apply unchanged.
"""

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from scflow_tpu.models.layers import ConvModule
from scflow_tpu.registry import HEADS

_ID_BIAS = {
    "ortho6d": (1.0, 0.0, 0.0, 0.0, 1.0, 0.0),
    "quaternion": (0.0, 0.0, 0.0, 1.0),
}


class _PoseTrunk(nn.Module):
    """Shared conv+fc trunk."""

    conv_channels: Tuple[int, ...] = (128, 128, 128)
    fc_channels: Tuple[int, ...] = (1024, 256)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, ch in enumerate(self.conv_channels):
            x = ConvModule(
                ch, 3, stride=2, padding=1, norm="GN", act="relu",
                dtype=self.dtype, name=f"conv{i}",
            )(x)
        # flatten in NCHW order for torch-weight compatibility
        n = x.shape[0]
        x = x.transpose(0, 3, 1, 2).reshape(n, -1)
        for i, ch in enumerate(self.fc_channels):
            x = nn.relu(nn.Dense(ch, dtype=self.dtype, name=f"fc{i}")(x))
        return x


def _zero_init_heads(rotation_mode: str, num_class: int = 1):
    rot_dim = len(_ID_BIAS[rotation_mode])

    def rot_bias_init(key, shape, dtype=jnp.float32):
        return jnp.tile(jnp.asarray(_ID_BIAS[rotation_mode], dtype), num_class)

    rot = nn.Dense(
        rot_dim * num_class,
        kernel_init=nn.initializers.zeros,
        bias_init=rot_bias_init,
        name="rotation_pred",
    )
    trans = nn.Dense(
        3 * num_class,
        kernel_init=nn.initializers.zeros,
        bias_init=nn.initializers.zeros,
        name="translation_pred",
    )
    return rot, trans, rot_dim


@HEADS.register_module("SingleClassPoseHead")
class SingleClassPoseHead(nn.Module):
    in_channels: int = 224
    rotation_mode: str = "ortho6d"
    dtype: Any = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, label: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        feat = _PoseTrunk(dtype=self.dtype, name="trunk")(x)
        rot, trans, _ = _zero_init_heads(self.rotation_mode, 1)
        return rot(feat), trans(feat)


@HEADS.register_module("MultiClassPoseHead")
class MultiClassPoseHead(nn.Module):
    num_class: int = 21
    in_channels: int = 224
    rotation_mode: str = "ortho6d"
    dtype: Any = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, label: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        feat = _PoseTrunk(dtype=self.dtype, name="trunk")(x)
        rot, trans, rot_dim = _zero_init_heads(self.rotation_mode, self.num_class)
        n = feat.shape[0]
        rot_all = rot(feat).reshape(n, self.num_class, rot_dim)
        trans_all = trans(feat).reshape(n, self.num_class, 3)
        idx = label.astype(jnp.int32)[:, None, None]
        rot_sel = jnp.take_along_axis(rot_all, jnp.broadcast_to(idx, (n, 1, rot_dim)), axis=1)[:, 0]
        trans_sel = jnp.take_along_axis(trans_all, jnp.broadcast_to(idx, (n, 1, 3)), axis=1)[:, 0]
        return rot_sel, trans_sel
