"""Batched on-device PnP: weighted DLT + Gauss-Newton refinement + fixed-
iteration RANSAC, pure JAX.

TPU-native replacement for the cv2.solvePnPRansac host path the reference
uses for the RAFT-baseline test (models/utils/pose.py:203-249; SURVEY.md
§2.3): fixed-size padded point sets with validity weights, `vmap` over
RANSAC hypotheses and over the batch — no host sync inside eval.  The host
cv2 path (geometry/host.py) remains available for exact reference parity.
"""

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from scflow_tpu.geometry.rotation import axis_angle_from_rotmat, rotmat_from_axis_angle


class PnPResult(NamedTuple):
    rotation: jnp.ndarray  # (..., 3, 3)
    translation: jnp.ndarray  # (..., 3)
    inliers: jnp.ndarray  # (..., P) bool
    ok: jnp.ndarray  # (...,) bool


def _normalize_points(points_2d: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pixel coords -> normalized camera-plane coords via K^-1."""
    homo = jnp.concatenate(
        [points_2d, jnp.ones_like(points_2d[..., :1])], axis=-1
    )
    return jnp.einsum("ij,pj->pi", jnp.linalg.inv(K), homo)[..., :2]


def pnp_dlt(
    points_3d: jnp.ndarray,  # (P, 3)
    points_2d: jnp.ndarray,  # (P, 2) pixels
    K: jnp.ndarray,  # (3, 3)
    weights: Optional[jnp.ndarray] = None,  # (P,) >= 0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Direct linear transform for the projection [R|t] from >=6 points.

    Solves A m = 0 (2 rows per point in normalized coords) by SVD, projects
    the 3x3 part onto SO(3), recovers scale from the singular values, and
    fixes the cheirality sign so points sit in front of the camera.
    """
    p = points_3d.shape[0]
    xn = _normalize_points(points_2d, K)  # (P, 2)
    if weights is None:
        weights = jnp.ones((p,), points_3d.dtype)
    w = jnp.sqrt(jnp.maximum(weights, 0.0))[:, None]

    X = jnp.concatenate([points_3d, jnp.ones((p, 1), points_3d.dtype)], axis=-1)
    zeros = jnp.zeros_like(X)
    u = xn[:, 0:1]
    v = xn[:, 1:2]
    row_u = jnp.concatenate([X, zeros, -u * X], axis=-1) * w  # (P, 12)
    row_v = jnp.concatenate([zeros, X, -v * X], axis=-1) * w
    A = jnp.concatenate([row_u, row_v], axis=0)  # (2P, 12)

    # smallest right-singular vector of A via eigh of A^T A (12x12, cheap)
    ata = A.T @ A
    evals, evecs = jnp.linalg.eigh(ata)
    m = evecs[:, 0].reshape(3, 4)

    M = m[:, :3]
    tvec = m[:, 3]
    # cheirality: majority of depths must be positive
    depths = points_3d @ M[2] + tvec[2]
    sign = jnp.where(jnp.sum(jnp.sign(depths) * weights) < 0, -1.0, 1.0)
    M = M * sign
    tvec = tvec * sign
    # project onto SO(3): M = U S V^T -> R = U V^T, scale = mean(S)
    U, S, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0])).at[2, 2].set(det)
    R = U @ D @ Vt
    scale = jnp.mean(S) * det  # det=-1 flips handedness back
    t = tvec / jnp.where(jnp.abs(scale) > 1e-12, scale, 1e-12)
    return R, t


def pnp_planar(
    points_3d: jnp.ndarray,  # (P, 3)
    points_2d: jnp.ndarray,  # (P, 2) pixels
    K: jnp.ndarray,  # (3, 3)
    weights: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Planar-capable pose solve: fit the best plane through the 3D points
    (weighted PCA), express them in plane coordinates, estimate the
    plane->image homography by DLT, and decompose it into [R|t]
    (IPPE/Zhang-style).  Exact complement of `pnp_dlt`, whose 3x4 DLT is
    rank-deficient for coplanar points; for genuinely 3D point sets the
    plane projection discards depth and this solve is the weaker one —
    `solve_pnp_ransac_jax` runs both and keeps whichever reprojects better.
    """
    p = points_3d.shape[0]
    xn = _normalize_points(points_2d, K)
    if weights is None:
        weights = jnp.ones((p,), points_3d.dtype)
    w = jnp.maximum(weights, 0.0)
    wsum = jnp.maximum(w.sum(), 1e-8)

    # weighted plane fit: centroid + principal axes
    c = (points_3d * w[:, None]).sum(0) / wsum
    X = points_3d - c
    cov = (X * w[:, None]).T @ X / wsum
    _, evecs = jnp.linalg.eigh(cov)  # ascending: evecs[:, 0] = normal
    e1, e2 = evecs[:, 2], evecs[:, 1]
    q = jnp.stack([X @ e1, X @ e2], axis=-1)  # (P, 2) plane coords

    # homography DLT: [u, v, 1] -> xn, rows scaled by sqrt weights
    sw = jnp.sqrt(w)[:, None]
    Q = jnp.concatenate([q, jnp.ones((p, 1), q.dtype)], axis=-1)
    zeros = jnp.zeros_like(Q)
    u = xn[:, 0:1]
    v = xn[:, 1:2]
    row_u = jnp.concatenate([Q, zeros, -u * Q], axis=-1) * sw
    row_v = jnp.concatenate([zeros, Q, -v * Q], axis=-1) * sw
    A = jnp.concatenate([row_u, row_v], axis=0)  # (2P, 9)
    _, hvecs = jnp.linalg.eigh(A.T @ A)
    H = hvecs[:, 0].reshape(3, 3)

    # x_n ~ [R e1, R e2, R c + t] [u, v, 1]^T  =>  H ≅ [a1, a2, b]
    h1, h2, b = H[:, 0], H[:, 1], H[:, 2]
    scale = jnp.sqrt(jnp.maximum(
        jnp.linalg.norm(h1) * jnp.linalg.norm(h2), 1e-12))
    # cheirality: the plane centroid must sit at positive depth
    sign = jnp.where(b[2] < 0, -1.0, 1.0)
    a1 = h1 * sign / scale
    a2 = h2 * sign / scale
    b = b * sign / scale
    # orthonormalize [a1 a2 a1xa2] -> A_rot; R maps [e1 e2 n] onto it
    A_rot = jnp.stack([a1, a2, jnp.cross(a1, a2)], axis=-1)
    U, _, Vt = jnp.linalg.svd(A_rot)
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0])).at[2, 2].set(
        jnp.linalg.det(U @ Vt))
    A_rot = U @ D @ Vt
    E = jnp.stack([e1, e2, jnp.cross(e1, e2)], axis=-1)
    R = A_rot @ E.T
    t = b - R @ c
    return R, t


def _reproject_residual(rvec, t, points_3d, xn):
    R = rotmat_from_axis_angle(rvec)
    cam = points_3d @ R.T + t
    z = jnp.where(jnp.abs(cam[:, 2]) > 1e-8, cam[:, 2], 1e-8)
    proj = cam[:, :2] / z[:, None]
    return (proj - xn).reshape(-1)


def refine_gauss_newton(
    R: jnp.ndarray,
    t: jnp.ndarray,
    points_3d: jnp.ndarray,
    points_2d: jnp.ndarray,
    K: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    iters: int = 8,
    damping: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Levenberg-damped Gauss-Newton on the normalized reprojection error."""
    xn = _normalize_points(points_2d, K)
    p = points_3d.shape[0]
    if weights is None:
        weights = jnp.ones((p,), points_3d.dtype)
    wr = jnp.sqrt(jnp.maximum(jnp.repeat(weights, 2), 0.0))

    def step(carry, _):
        rvec, t = carry
        res = _reproject_residual(rvec, t, points_3d, xn) * wr
        Jr = jax.jacfwd(
            lambda rv, tt: _reproject_residual(rv, tt, points_3d, xn) * wr,
            argnums=(0, 1),
        )(rvec, t)
        J = jnp.concatenate([Jr[0], Jr[1]], axis=-1)  # (2P, 6)
        H = J.T @ J + damping * jnp.eye(6)
        g = J.T @ res
        delta = jnp.linalg.solve(H, g)
        return (rvec - delta[:3], t - delta[3:]), None

    rvec0 = axis_angle_from_rotmat(R)
    (rvec, t), _ = jax.lax.scan(step, (rvec0, t), None, length=iters)
    return rotmat_from_axis_angle(rvec), t


def solve_pnp_ransac_jax(
    points_3d: jnp.ndarray,  # (P, 3) padded
    points_2d: jnp.ndarray,  # (P, 2)
    K: jnp.ndarray,  # (3, 3)
    valid: Optional[jnp.ndarray] = None,  # (P,) bool
    key: Optional[jax.Array] = None,
    num_hypotheses: int = 64,
    sample_size: int = 6,
    inlier_thresh_px: float = 3.0,
    refine_iters: int = 8,
) -> PnPResult:
    """Fixed-shape RANSAC-PnP: vmap `num_hypotheses` minimal DLT solves,
    score by pixel reprojection inliers, refit+GN-refine on the best
    hypothesis' inliers."""
    p = points_3d.shape[0]
    if valid is None:
        valid = jnp.ones((p,), bool)
    key = key if key is not None else jax.random.PRNGKey(0)

    # hypothesis sampling: gumbel top-k over valid points (without replacement)
    def sample_idx(k):
        g = jax.random.gumbel(k, (p,)) + jnp.where(valid, 0.0, -1e9)
        return jax.lax.top_k(g, sample_size)[1]

    keys = jax.random.split(key, num_hypotheses)
    idxs = jax.vmap(sample_idx)(keys)  # (H, S)

    fx, fy = K[0, 0], K[1, 1]

    def reproj_err_px(R, t):
        cam = points_3d @ R.T + t
        z = jnp.where(jnp.abs(cam[:, 2]) > 1e-8, cam[:, 2], 1e-8)
        uvw = cam @ K.T
        proj = uvw[:, :2] / z[:, None]
        return jnp.linalg.norm(proj - points_2d, axis=-1)

    def best_of_both(p3, p2, weights):
        """General DLT and planar-homography solves side by side; keep the
        one that reprojects better (DLT is degenerate for coplanar points,
        the planar path is weak for 3D relief — together they cover both).

        The pick metric is the median error over the points the solve was
        FITTED on (the weights' support during refit; all valid points for
        minimal-sample hypotheses, where the full set is the consensus
        measure) — scoring a refit on outliers could out-vote the correct
        planar solution.
        """
        R_g, t_g = pnp_dlt(p3, p2, K, weights=weights)
        R_p, t_p = pnp_planar(p3, p2, K, weights=weights)
        score_on = valid if weights is None else (weights > 0) & valid

        def med_err(R, t):
            cam = points_3d @ R.T + t
            z = jnp.where(jnp.abs(cam[:, 2]) > 1e-8, cam[:, 2], 1e-8)
            proj = (cam @ K.T)[:, :2] / z[:, None]
            err = jnp.linalg.norm(proj - points_2d, axis=-1)
            big = jnp.float32(1e9)
            err = jnp.where(score_on, jnp.nan_to_num(err, nan=big), big)
            # median of the scored errors: excluded entries sort last
            return jnp.sort(err)[score_on.sum() // 2]

        pick_g = med_err(R_g, t_g) <= med_err(R_p, t_p)
        R = jnp.where(pick_g, R_g, R_p)
        t = jnp.where(pick_g, t_g, t_p)
        return R, t

    def hypothesis(idx):
        R, t = best_of_both(points_3d[idx], points_2d[idx], None)
        err = reproj_err_px(R, t)
        inl = (err < inlier_thresh_px) & valid
        return R, t, inl, inl.sum()

    Rs, ts, inls, scores = jax.vmap(hypothesis)(idxs)
    best = jnp.argmax(scores)
    R_best, t_best, inl_best = Rs[best], ts[best], inls[best]
    enough = scores[best] >= sample_size

    # refit on inliers (weighted dual-path) then Gauss-Newton refine
    w = inl_best.astype(points_3d.dtype)
    R_fit, t_fit = best_of_both(points_3d, points_2d, w)
    R_ref, t_ref = refine_gauss_newton(
        R_fit, t_fit, points_3d, points_2d, K, weights=w, iters=refine_iters
    )
    err = reproj_err_px(R_ref, t_ref)
    inliers = (err < inlier_thresh_px) & valid
    finite = jnp.isfinite(t_ref).all() & jnp.isfinite(R_ref).all()
    return PnPResult(
        rotation=R_ref, translation=t_ref, inliers=inliers, ok=enough & finite
    )


batched_pnp_ransac = jax.vmap(
    solve_pnp_ransac_jax, in_axes=(0, 0, 0, 0, 0), out_axes=0
)
