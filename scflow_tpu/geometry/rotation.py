"""Rotation parameterizations (pure JAX, batched over leading axes).

Numerics mirror the reference implementations:
  - ortho6d Gram-Schmidt: reference models/utils/pose.py:153-169
  - quaternion (scalar-last, matching the pose head identity bias
    [0,0,0,1]): reference models/head/pose_head.py:94
"""

import jax.numpy as jnp

_EPS = 1e-12


def _normalize(v, axis=-1, eps=_EPS):
    # matches torch.nn.functional.normalize: v / max(||v||, eps)
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


def rotmat_from_ortho6d(o6d: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) -> (..., 3, 3) via Gram-Schmidt (Zhou et al. continuity rep).

    Columns of the result are (x, y, z), exactly as the reference's
    `get_rotation_matrix_from_ortho6d` (models/utils/pose.py:153-169).
    """
    x_raw, y_raw = o6d[..., 0:3], o6d[..., 3:6]
    x = _normalize(x_raw)
    z = _normalize(jnp.cross(x, y_raw))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


def rotmat_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Scalar-last quaternion (x, y, z, w) -> rotation matrix, (..., 4) -> (..., 3, 3)."""
    q = _normalize(q)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def quat_from_rotmat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> scalar-last quaternion (x, y, z, w), branchless."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate solutions, pick numerically best by largest pivot
    qw = jnp.sqrt(jnp.maximum(0.0, 1 + tr)) / 2
    qx = jnp.sqrt(jnp.maximum(0.0, 1 + m00 - m11 - m22)) / 2
    qy = jnp.sqrt(jnp.maximum(0.0, 1 - m00 + m11 - m22)) / 2
    qz = jnp.sqrt(jnp.maximum(0.0, 1 - m00 - m11 + m22)) / 2
    qx = jnp.copysign(qx, m21 - m12)
    qy = jnp.copysign(qy, m02 - m20)
    qz = jnp.copysign(qz, m10 - m01)
    q = jnp.stack([qx, qy, qz, qw], axis=-1)
    return _normalize(q)


def rotmat_from_euler(angles: jnp.ndarray, order: str = "xyz", degrees: bool = False):
    """Euler angles (..., 3) -> rotation matrix, extrinsic axes applied in `order`.

    Matches scipy.spatial.transform.Rotation.from_euler(order.upper()) for
    intrinsic / from_euler(order) for extrinsic composition; used by PoseJitter
    (reference datasets/pipelines/jitter.py:62).
    """
    if degrees:
        angles = jnp.deg2rad(angles)

    def axis_rot(axis, a):
        c, s = jnp.cos(a), jnp.sin(a)
        o, i = jnp.zeros_like(a), jnp.ones_like(a)
        if axis == "x":
            rows = [i, o, o, o, c, -s, o, s, c]
        elif axis == "y":
            rows = [c, o, s, o, i, o, -s, o, c]
        else:
            rows = [c, -s, o, s, c, o, o, o, i]
        return jnp.stack(rows, axis=-1).reshape(a.shape + (3, 3))

    R = None
    for idx, ax in enumerate(order):
        Ri = axis_rot(ax, angles[..., idx])
        R = Ri if R is None else Ri @ R  # extrinsic: later axes multiply from left
    return R


def rotmat_from_axis_angle(rvec: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: axis-angle vector (..., 3) -> rotation matrix (cv2.Rodrigues
    equivalent, used by the in-graph PnP replacing models/utils/pose.py:223)."""
    theta = jnp.linalg.norm(rvec, axis=-1, keepdims=True)
    axis = rvec / jnp.maximum(theta, _EPS)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1).reshape(
        rvec.shape[:-1] + (3, 3)
    )
    t = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    return eye + jnp.sin(t) * K + (1 - jnp.cos(t)) * (K @ K)


def axis_angle_from_rotmat(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse Rodrigues, (..., 3, 3) -> (..., 3). Stable away from theta=pi."""
    cos = jnp.clip((jnp.trace(R, axis1=-2, axis2=-1) - 1) / 2, -1.0, 1.0)
    theta = jnp.arccos(cos)
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin = jnp.sin(theta)
    scale = jnp.where(sin[..., None] > 1e-6, theta[..., None] / jnp.maximum(2 * sin[..., None], _EPS), 0.5)
    return v * scale
