"""Landmark bundle adjustment: feature points as first-class variables.

Capability parity: the reference's DO_FEATURE_OPTIMIZATION mode — features
become g2o VertexPointXYZ landmarks observed by EdgeSE3PointXYZDepth
(pixel u, v + depth) edges with depth-dependent information, optimized
jointly with the poses (reference: src/landmark.{h,cpp},
src/graph_manager.cpp:137-143,188-200; per-feature edge construction
src/transformation_estimation.cpp:91-124).

TPU re-design: fixed-capacity observation table + alternating (resection /
intersection) Gauss-Newton — each half-step is an embarrassingly batched
solve (per-landmark 3x3 and per-pose 6x6 normal equations assembled by
segment-sum), which maps to the VPU/MXU far better than a joint sparse
Schur factorization at this problem size.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3
from ..core.camera import Intrinsics
from ..core.noise import point_covariance_diag


class LandmarkGraph(NamedTuple):
    """Fixed-capacity BA problem.

    poses:      (N, 4, 4) world_T_cam
    pose_fixed: (N,) bool
    landmarks:  (L, 3) world positions
    lm_active:  (L,) bool
    obs_lm:     (O,) int32 landmark index
    obs_pose:   (O,) int32 pose index
    obs_uvz:    (O, 3) measured (u, v, depth)
    obs_active: (O,) bool
    """

    poses: jnp.ndarray
    pose_fixed: jnp.ndarray
    landmarks: jnp.ndarray
    lm_active: jnp.ndarray
    obs_lm: jnp.ndarray
    obs_pose: jnp.ndarray
    obs_uvz: jnp.ndarray
    obs_active: jnp.ndarray


def _residuals(g: LandmarkGraph, cam: Intrinsics, sigma_depth: float):
    """Per-observation residual r = (u_pred - u, v_pred - v, z_pred - z) and
    diagonal information weights (pixel noise + quadratic depth noise —
    the EdgeSE3PointXYZDepth measurement model)."""
    Tcw = se3.inv(g.poses[g.obs_pose])  # cam_T_world
    p_cam = se3.apply(Tcw, g.landmarks[g.obs_lm][:, None, :])[:, 0, :]
    z = jnp.maximum(p_cam[:, 2], 1e-6)
    u = p_cam[:, 0] / z * cam.fx + cam.cx
    v = p_cam[:, 1] / z * cam.fy + cam.cy
    r = jnp.stack(
        [u - g.obs_uvz[:, 0], v - g.obs_uvz[:, 1], p_cam[:, 2] - g.obs_uvz[:, 2]],
        axis=-1,
    )
    # info: 1 px^2 lateral, depth variance from the noise model
    z_meas = jnp.maximum(g.obs_uvz[:, 2], 0.1)
    var_z = point_covariance_diag(z_meas, cam.fx, cam.fy, sigma_depth)[:, 2]
    w = jnp.stack(
        [jnp.ones_like(var_z), jnp.ones_like(var_z), 1.0 / var_z], axis=-1
    )
    w = w * g.obs_active[:, None]
    return r, w, p_cam


def chi2(g: LandmarkGraph, cam: Intrinsics, sigma_depth: float = 0.01):
    r, w, _ = _residuals(g, cam, sigma_depth)
    return jnp.sum(r * r * w)


@functools.partial(jax.jit, static_argnames=("cam", "iterations", "sigma_depth"))
def optimize_landmarks(g: LandmarkGraph, cam: Intrinsics, iterations: int = 5,
                       sigma_depth: float = 0.01) -> LandmarkGraph:
    """Alternating BA: landmark intersection + pose resection per round."""

    def jac_obs(g):
        """Jacobian of r wrt landmark world position: (O, 3, 3)."""
        Tcw = se3.inv(g.poses[g.obs_pose])
        R = Tcw[:, :3, :3]
        p_cam = se3.apply(Tcw, g.landmarks[g.obs_lm][:, None, :])[:, 0, :]
        z = jnp.maximum(p_cam[:, 2], 1e-6)
        # d(u,v,z)/dp_cam
        zero = jnp.zeros_like(z)
        Jproj = jnp.stack(
            [
                jnp.stack([cam.fx / z, zero, -cam.fx * p_cam[:, 0] / (z * z)], -1),
                jnp.stack([zero, cam.fy / z, -cam.fy * p_cam[:, 1] / (z * z)], -1),
                jnp.stack([zero, zero, jnp.ones_like(z)], -1),
            ],
            -2,
        )  # (O, 3, 3)
        return Jproj @ R, Jproj, p_cam

    def step(g, _):
        # ---- intersection: update landmarks, poses fixed ----------------
        r, w, _ = _residuals(g, cam, sigma_depth)
        Jl, _, _ = jac_obs(g)
        L = g.landmarks.shape[0]
        JTw = Jl * w[:, :, None]  # (O, 3, 3) row-weighted
        H = jnp.einsum("oki,okj->oij", JTw, Jl)
        b = jnp.einsum("oki,ok->oi", JTw, r)
        Hl = jnp.zeros((L, 3, 3)).at[g.obs_lm].add(H, mode="drop")
        bl = jnp.zeros((L, 3)).at[g.obs_lm].add(b, mode="drop")
        Hl = Hl + jnp.eye(3) * 1e-4
        delta = -jnp.linalg.solve(Hl, bl[..., None])[..., 0]
        ok = g.lm_active & (jnp.linalg.norm(delta, axis=-1) < 1.0)
        landmarks = g.landmarks + jnp.where(ok[:, None], delta, 0.0)
        g = g._replace(landmarks=landmarks)

        # ---- resection: update poses, landmarks fixed -------------------
        r, w, _ = _residuals(g, cam, sigma_depth)
        _, Jproj, p_cam = jac_obs(g)
        # pose perturbation world_T_cam <- world_T_cam @ exp(xi):
        # dp_cam/dxi = [-I | hat(p_cam)] ... derived from cam_T_world update
        # cam_T_world <- exp(-xi) cam_T_world => dp_cam = -v - w x p_cam
        Jx = jnp.concatenate(
            [-jnp.broadcast_to(jnp.eye(3), (r.shape[0], 3, 3)), se3.hat(p_cam)],
            axis=-1,
        )  # (O, 3, 6)
        Jp = Jproj @ Jx  # (O, 3, 6)
        N = g.poses.shape[0]
        JTw = Jp * w[:, :, None]
        H = jnp.einsum("oki,okj->oij", JTw, Jp)  # (O, 6, 6)
        b = jnp.einsum("oki,ok->oi", JTw, r)
        Hp = jnp.zeros((N, 6, 6)).at[g.obs_pose].add(H, mode="drop")
        bp = jnp.zeros((N, 6)).at[g.obs_pose].add(b, mode="drop")
        free = ~g.pose_fixed
        Hp = Hp + jnp.eye(6) * 1e-3 + (~free)[:, None, None] * jnp.eye(6)
        delta = -jnp.linalg.solve(Hp, bp[..., None])[..., 0]
        delta = delta * free[:, None]
        poses = g.poses @ se3.exp_se3(delta)
        return g._replace(poses=poses), None

    g, _ = jax.lax.scan(step, g, None, length=iterations)
    return g


def make_landmark_graph(n_poses, n_landmarks, n_obs) -> LandmarkGraph:
    return LandmarkGraph(
        poses=jnp.broadcast_to(jnp.eye(4), (n_poses, 4, 4)),
        pose_fixed=jnp.zeros(n_poses, bool),
        landmarks=jnp.zeros((n_landmarks, 3)),
        lm_active=jnp.zeros(n_landmarks, bool),
        obs_lm=jnp.zeros(n_obs, jnp.int32),
        obs_pose=jnp.zeros(n_obs, jnp.int32),
        obs_uvz=jnp.zeros((n_obs, 3)),
        obs_active=jnp.zeros(n_obs, bool),
    )
