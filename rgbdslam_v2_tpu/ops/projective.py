"""Projective two-view pose refinement over (u, v, depth) measurements.

Capability parity: the reference's g2o_transformation_refinement path,
getTransformFromMatchesG2O (reference: src/transformation_estimation.cpp:
37-170): each matched feature becomes a 3D landmark observed by both
cameras through EdgeSE3PointXYZDepth measurement edges (u, v, z) with
information diag(1, 1, 1/sigma_z^2), sigma_z = sigma_depth * z^2
(point_information_matrix, src/misc2.h:37-47); the newer camera is fixed
at identity and Gauss-Newton refines the earlier camera's pose jointly
with the landmarks (:126-170).

Why it beats 3D-space Kabsch refitting for far features: the pixel-space
residual keeps its ~1 px information content at any range, while the 3D
Mahalanobis residual's lateral terms degrade with z (covariance grows as
z^2/f) and its depth term as z^4 — distant correspondences barely
constrain a 3D refit but still constrain bearing exactly.

TPU re-design: no sparse graph, no Cholmod. Landmarks appear in exactly
two measurements each, so the structure is eliminated analytically each
round: alternate (a) batched per-landmark 3x3 GN updates (all M landmarks
at once) with (b) one 6x6 GN pose update accumulated over all residuals —
fixed iteration count, branch-free, vmaps cleanly over the candidate
batch inside compare_to_candidates.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import se3


def _proj_residual_jac(q, meas_uvz, fx, fy, cx, cy):
    """Residual of one camera observation and its Jacobian wrt the point in
    that camera's frame.

    q: (..., 3) point in camera frame; meas_uvz: (..., 3).
    Returns r (..., 3) = (u(q)-u, v(q)-v, qz-z) and J (..., 3, 3) = dr/dq.
    """
    qz = jnp.where(jnp.abs(q[..., 2]) < 1e-6, 1e-6, q[..., 2])
    u = fx * q[..., 0] / qz + cx
    v = fy * q[..., 1] / qz + cy
    r = jnp.stack(
        [u - meas_uvz[..., 0], v - meas_uvz[..., 1], q[..., 2] - meas_uvz[..., 2]],
        axis=-1,
    )
    z0 = jnp.zeros_like(qz)
    J = jnp.stack(
        [
            jnp.stack([fx / qz, z0, -fx * q[..., 0] / (qz * qz)], axis=-1),
            jnp.stack([z0, fy / qz, -fy * q[..., 1] / (qz * qz)], axis=-1),
            jnp.stack([z0, z0, jnp.ones_like(qz)], axis=-1),
        ],
        axis=-2,
    )
    return r, J


def refine_projective(
    T0: jnp.ndarray,  # (4, 4) initial cand_T_new (dst_T_src)
    src_uvz: jnp.ndarray,  # (M, 3) measured (u, v, z) in the NEW frame
    dst_uvz: jnp.ndarray,  # (M, 3) measured (u, v, z) in the CAND frame
    weights: jnp.ndarray,  # (M,) float — 0 excludes a match (RANSAC outliers)
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    iterations: int = 4,
    sigma_depth: float = 0.01,
    damping: float = 1e-6,
) -> jnp.ndarray:
    """Jointly refine the relative pose + per-match landmarks; returns the
    refined dst_T_src. Landmarks are parameterized in the NEW (src) camera
    frame (the reference fixes the newer camera, transformation_estimation
    .cpp:66-76); only the cand camera's residuals depend on the pose."""
    w = jnp.maximum(weights, 0.0)
    # information diag(1, 1, 1/sigma_z^2) per observation (misc2.h:37-47)
    def info3(z):
        sz = sigma_depth * jnp.maximum(z, 0.3) ** 2
        return jnp.stack(
            [jnp.ones_like(z), jnp.ones_like(z), 1.0 / (sz * sz)], axis=-1
        )

    W_src = info3(src_uvz[..., 2]) * w[..., None]  # (M, 3)
    W_dst = info3(dst_uvz[..., 2]) * w[..., None]

    # landmark init: backproject the src measurement
    p = jnp.stack(
        [
            (src_uvz[..., 0] - cx) * src_uvz[..., 2] / fx,
            (src_uvz[..., 1] - cy) * src_uvz[..., 2] / fy,
            src_uvz[..., 2],
        ],
        axis=-1,
    )  # (M, 3)

    eye3 = jnp.eye(3, dtype=T0.dtype)

    def body(carry, _):
        T, p = carry
        R, t = T[:3, :3], T[:3, 3]

        # ---- (a) landmark update, all M at once (3x3 GN each) -------------
        r_s, J_s = _proj_residual_jac(p, src_uvz, fx, fy, cx, cy)
        q = p @ R.T + t
        r_d, J_dq = _proj_residual_jac(q, dst_uvz, fx, fy, cx, cy)
        J_d = J_dq @ R  # dr_d/dp = dr/dq * dq/dp, dq/dp = R
        H = (
            jnp.einsum("mki,mk,mkj->mij", J_s, W_src, J_s)
            + jnp.einsum("mki,mk,mkj->mij", J_d, W_dst, J_d)
            + damping * eye3
        )
        b = jnp.einsum("mki,mk,mk->mi", J_s, W_src, r_s) + jnp.einsum(
            "mki,mk,mk->mi", J_d, W_dst, r_d
        )
        p = p - jnp.linalg.solve(H, b[..., None])[..., 0]

        # ---- (b) pose update (6x6 GN over cand residuals) ------------------
        q = p @ R.T + t
        r_d, J_dq = _proj_residual_jac(q, dst_uvz, fx, fy, cx, cy)
        # left-multiplicative twist: q' = exp(xi) * q -> dq/dxi = [I | -[q]x]
        Jq_xi = jnp.concatenate(
            [jnp.broadcast_to(eye3, q.shape[:-1] + (3, 3)), -se3.hat(q)], axis=-1
        )  # (M, 3, 6)
        J6 = J_dq @ Jq_xi  # (M, 3, 6)
        H6 = jnp.einsum("mki,mk,mkj->ij", J6, W_dst, J6) + damping * jnp.eye(
            6, dtype=T0.dtype
        )
        b6 = jnp.einsum("mki,mk,mk->i", J6, W_dst, r_d)
        xi = -jnp.linalg.solve(H6, b6)
        # guard: a degenerate system (few/collinear inliers) must not blow up
        ok = jnp.isfinite(xi).all() & (jnp.linalg.norm(xi) < 1.0)
        xi = jnp.where(ok, xi, 0.0)
        T = se3.exp_se3(xi) @ T
        return (T, p), None

    (T, _p), _ = jax.lax.scan(body, (T0, p), None, length=iterations)
    return T


def uvz_from_xyz(xyz: jnp.ndarray, fx: float, fy: float, cx: float, cy: float):
    """(M, 3) camera-frame points -> (u, v, z) measurement triplets (the
    inverse of the keypoint backprojection, so uv are the original pixel
    coordinates)."""
    z = jnp.where(jnp.abs(xyz[..., 2]) < 1e-6, 1e-6, xyz[..., 2])
    return jnp.stack(
        [
            fx * xyz[..., 0] / z + cx,
            fy * xyz[..., 1] / z + cy,
            xyz[..., 2],
        ],
        axis=-1,
    )
