"""SE(3) pose update from a predicted delta pose.

Numerics match the reference `get_pose_from_delta_pose`
(models/utils/pose.py:124-149) exactly, including the 'exp' depth
parameterization and the optional stop-gradient of depth for x/y.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from scflow_tpu.geometry.rotation import rotmat_from_ortho6d, rotmat_from_quat


def apply_delta_pose(
    rotation_delta: jnp.ndarray,
    translation_delta: jnp.ndarray,
    rotation_src: jnp.ndarray,
    translation_src: jnp.ndarray,
    weight: float = 10.0,
    depth_transform: str = "exp",
    detach_depth_for_xy: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compose a predicted delta pose onto a source pose.

    rotation_delta: (N, 6) ortho6d or (N, 4) scalar-last quaternion.
    translation_delta: (N, 3) = (dx, dy, dz) in the reference's
    scale-invariant parameterization:
        R_dst = dR @ R_src
        v_z   = t_z / exp(dz)              ('exp')   |  t_z * (dz + 1)
        v_xy  = v_z * (d_xy / weight + t_xy / t_z)
    """
    if rotation_delta.shape[-1] == 4:
        dR = rotmat_from_quat(rotation_delta)
    else:
        dR = rotmat_from_ortho6d(rotation_delta)
    rotation_dst = dR @ rotation_src

    tx, ty, tz = translation_src[:, 0], translation_src[:, 1], translation_src[:, 2]
    dx, dy, dz = translation_delta[:, 0], translation_delta[:, 1], translation_delta[:, 2]

    if depth_transform == "exp":
        vz = tz / jnp.exp(dz)
    else:
        vz = tz * (dz + 1.0)
    vz_for_xy = jax.lax.stop_gradient(vz) if detach_depth_for_xy else vz
    vx = vz_for_xy * (dx / weight + tx / tz)
    vy = vz_for_xy * (dy / weight + ty / tz)
    translation_dst = jnp.stack([vx, vy, vz], axis=-1)
    return rotation_dst, translation_dst
