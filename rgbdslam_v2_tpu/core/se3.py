"""SE(3) / SO(3) geometry for TPU: batched, closed-form, numerically safe.

Canonical pose representation is a homogeneous (..., 4, 4) float32 matrix
(world_T_cam unless stated otherwise). Twist coordinates are 6-vectors
``xi = [v, w]`` — translation part first, rotation part second.

Capability parity: the reference converts between tf/Eigen/g2o pose types
(reference: src/misc.cpp:96-120) and relies on g2o's SE3Quat internals; here
everything is jnp with small-angle-safe exp/log maps so the pose-graph
optimizer can take minimal 6-DoF steps on-device.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: (..., 3) -> (..., 3, 3) skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc(x):
    """sin(x)/x, safe at 0."""
    return jnp.where(jnp.abs(x) < 1e-5, 1.0 - x * x / 6.0, jnp.sin(x) / jnp.where(jnp.abs(x) < 1e-5, 1.0, x))


def _cosc(x):
    """(1-cos(x))/x^2, safe at 0."""
    x2 = x * x
    return jnp.where(jnp.abs(x) < 1e-4, 0.5 - x2 / 24.0, (1.0 - jnp.cos(x)) / jnp.where(jnp.abs(x) < 1e-4, 1.0, x2))


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (..., 3) axis-angle -> (..., 3, 3) rotation."""
    theta = jnp.linalg.norm(w, axis=-1)
    W = hat(w)
    W2 = W @ W
    a = _sinc(theta)[..., None, None]
    b = _cosc(theta)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * W2


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3).

    Uses the quaternion route for stability near pi.
    """
    q = rot_to_quat(R)  # (..., 4) as (x, y, z, w)
    return quat_to_axis_angle(q)


def quat_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    xyz, qw = q[..., :3], q[..., 3]
    # Make w >= 0 for the short rotation.
    sign = jnp.where(qw < 0, -1.0, 1.0)
    xyz = xyz * sign[..., None]
    qw = qw * sign
    sn = jnp.linalg.norm(xyz, axis=-1)
    theta = 2.0 * jnp.arctan2(sn, qw)
    scale = jnp.where(sn < _EPS, 2.0, theta / jnp.where(sn < _EPS, 1.0, sn))
    return xyz * scale[..., None]


def exp_se3(xi: jnp.ndarray) -> jnp.ndarray:
    """Twist (..., 6) [v, w] -> homogeneous transform (..., 4, 4)."""
    v, w = xi[..., :3], xi[..., 3:]
    theta = jnp.linalg.norm(w, axis=-1)
    W = hat(w)
    W2 = W @ W
    R = exp_so3(w)
    # Left Jacobian V = I + (1-cos)/th^2 W + (th - sin)/th^3 W^2
    b = _cosc(theta)
    th2 = theta * theta
    c = jnp.where(
        theta < 1e-4,
        1.0 / 6.0 - th2 / 120.0,
        (theta - jnp.sin(theta)) / jnp.where(theta < 1e-4, 1.0, th2 * theta),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), R.shape)
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    t = (V @ v[..., None])[..., 0]
    return from_rt(R, t)


def log_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous transform (..., 4, 4) -> twist (..., 6) [v, w]."""
    R, t = to_rt(T)
    w = log_so3(R)
    theta = jnp.linalg.norm(w, axis=-1)
    W = hat(w)
    W2 = W @ W
    # V^{-1} = I - W/2 + (1/th^2 - (1+cos)/(2 th sin)) W^2
    half = 0.5
    th2 = theta * theta
    small = theta < 1e-4
    safe_th2 = jnp.where(small, 1.0, th2)
    safe_den = jnp.where(small, 1.0, 2.0 * theta * jnp.sin(theta))
    coef = jnp.where(
        small,
        1.0 / 12.0 + th2 / 720.0,
        1.0 / safe_th2 - (1.0 + jnp.cos(theta)) / safe_den,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), R.shape)
    Vinv = eye - half * W + coef[..., None, None] * W2
    v = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([v, w], axis=-1)


def from_rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) + (..., 3) -> (..., 4, 4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def to_rt(T: jnp.ndarray):
    return T[..., :3, :3], T[..., :3, 3]


def identity(batch_shape=(), dtype=jnp.float32) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), tuple(batch_shape) + (4, 4))


def inv(T: jnp.ndarray) -> jnp.ndarray:
    R, t = to_rt(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return from_rt(Rt, -(Rt @ t[..., None])[..., 0])


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


def relative(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """A^{-1} B — the motion taking frame A to frame B."""
    return inv(A) @ B


def apply(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Transform points: T (..., 4, 4), pts (..., N, 3) -> (..., N, 3)."""
    R, t = to_rt(T)
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation (..., 3, 3) -> quaternion (..., 4) as (x, y, z, w), w >= 0.

    Branch-free Shepperd-style: compute all four candidate quaternions and
    select the one keyed by the largest denominator (stable everywhere).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot is the max.
    qw_w = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) * 0.5
    q_w = jnp.stack(
        [(m21 - m12), (m02 - m20), (m10 - m01), 4.0 * qw_w * qw_w], axis=-1
    ) / (4.0 * qw_w[..., None])

    qx_x = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 0.5
    q_x = jnp.stack(
        [4.0 * qx_x * qx_x, (m01 + m10), (m02 + m20), (m21 - m12)], axis=-1
    ) / (4.0 * qx_x[..., None])

    qy_y = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) * 0.5
    q_y = jnp.stack(
        [(m01 + m10), 4.0 * qy_y * qy_y, (m12 + m21), (m02 - m20)], axis=-1
    ) / (4.0 * qy_y[..., None])

    qz_z = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) * 0.5
    q_z = jnp.stack(
        [(m02 + m20), (m12 + m21), 4.0 * qz_z * qz_z, (m10 - m01)], axis=-1
    ) / (4.0 * qz_z[..., None])

    # Pick by largest pivot.
    pivots = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    qs = jnp.stack([q_w, q_x, q_y, q_z], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(qs, idx[..., None, None], axis=-2)[..., 0, :]
    # Normalize and fix sign (w >= 0).
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    sign = jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    return q * sign


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) as (x, y, z, w) -> rotation (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def pose_to_tum(T: jnp.ndarray):
    """(..., 4, 4) -> ((..., 3) translation, (..., 4) quaternion xyzw)."""
    R, t = to_rt(T)
    return t, rot_to_quat(R)


def tum_to_pose(t: jnp.ndarray, q_xyzw: jnp.ndarray) -> jnp.ndarray:
    return from_rt(quat_to_rot(q_xyzw), t)


def rotation_angle(T: jnp.ndarray) -> jnp.ndarray:
    """Rotation magnitude (radians) of (..., 4, 4) or (..., 3, 3)."""
    R = T[..., :3, :3]
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    return jnp.arccos(jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0))


def translation_norm(T: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.norm(T[..., :3, 3], axis=-1)
