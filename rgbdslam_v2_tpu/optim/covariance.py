"""Empirical edge covariance re-estimation from residual statistics.

Capability parity: the reference's setEmpiricalCovariances — after
optimization, recompute each edge's information matrix from
similarity-weighted error statistics of comparable edges
(reference: src/graph_manager2.cpp:111-144, src/covariance_estimation.cpp:41-77).

TPU re-design: per-edge residuals come from optim.pose_graph.edge terms in
one batch; each edge's covariance is a kernel-weighted average of the outer
products of residuals of *similar* edges (similarity = inverse distance in
(translation, rotation) measurement-magnitude space), computed as one
(E, E)-weighted einsum instead of per-edge loops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import se3
from .pose_graph import GraphState


@functools.partial(jax.jit, static_argnames=("bandwidth", "min_info", "max_info"))
def empirical_information(
    g: GraphState,
    bandwidth: float = 0.1,
    min_info: float = 1.0,
    max_info: float = 1e6,
) -> jnp.ndarray:
    """New (E, 6, 6) information matrices from residual statistics."""
    Xi = g.poses[g.edge_i]
    Xj = g.poses[g.edge_j]
    r = se3.log_se3(se3.inv(g.edge_meas) @ se3.inv(Xi) @ Xj)  # (E, 6)
    act = g.edge_active.astype(jnp.float32)

    # Edge descriptors: measurement magnitudes (trans, rot).
    t_mag = se3.translation_norm(g.edge_meas)
    r_mag = se3.rotation_angle(g.edge_meas)
    feat = jnp.stack([t_mag, r_mag], -1)  # (E, 2)
    d2 = jnp.sum((feat[:, None, :] - feat[None, :, :]) ** 2, -1)
    w = jnp.exp(-d2 / (2.0 * bandwidth * bandwidth)) * act[None, :]
    wsum = jnp.sum(w, -1, keepdims=True) + 1e-9

    outer = r[:, :, None] * r[:, None, :]  # (E, 6, 6)
    cov = jnp.einsum("ef,fij->eij", w / wsum, outer)
    cov = cov + jnp.eye(6) * 1e-8
    info = jnp.linalg.inv(cov)
    # symmetrize + clamp eigen-scale via diagonal clipping
    info = 0.5 * (info + jnp.swapaxes(info, -1, -2))
    diag = jnp.clip(jnp.einsum("eii->e", info) / 6.0, min_info, max_info)
    # normalize to a bounded overall scale while keeping structure
    scale = diag / (jnp.einsum("eii->e", info) / 6.0 + 1e-12)
    info = info * scale[:, None, None]
    return jnp.where(act[:, None, None] > 0, info, g.edge_info)
