"""Dense ICP refinement: point-to-plane Gauss-Newton on TPU.

Capability parity: the reference's GICP / PCL-ICP fallback refinement of
pairwise transforms when feature RANSAC is weak (reference:
external/gicp/ AlignScan; src/node.cpp:396-425
getRelativeTransformationTo_ICP_code; src/icp.cpp:47-89 icpAlignment with
5 cm max correspondence, uniform subsampling to gicp_max_cloud_size).

TPU re-design: brute-force nearest neighbors as one (N x M) distance matmul
per iteration (exact, MXU-friendly — no ANN kd-tree), normals from the
organized point grid (cross products of grid neighbors — the RGB-D
equivalent of GICP's local plane fits), point-to-plane residuals, and a
6x6 normal-equation solve per Gauss-Newton step inside lax.scan.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3


class IcpResult(NamedTuple):
    transform: jnp.ndarray  # (4, 4) refined dst_T_src
    rmse: jnp.ndarray  # () point-to-plane rms of used pairs
    n_pairs: jnp.ndarray  # () int32 used correspondences (last iteration)
    converged: jnp.ndarray  # () bool


def grid_normals(points: jnp.ndarray, valid: jnp.ndarray,
                 max_edge: float = 0.1) -> jnp.ndarray:
    """Normals from an organized (H, W, 3) point grid via neighbor crosses.

    Depth-discontinuity pixels (neighbor spacing > max_edge meters) get zero
    normals — their local plane is meaningless and biases point-to-plane ICP.
    """
    dx = jnp.roll(points, -1, 1) - jnp.roll(points, 1, 1)
    dy = jnp.roll(points, -1, 0) - jnp.roll(points, 1, 0)
    n = jnp.cross(dx, dy)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-9)
    # orient towards the camera (points are in camera frame; flip if n.z > 0)
    flip = jnp.sum(n * points, axis=-1, keepdims=True) > 0
    n = jnp.where(flip, -n, n)
    smooth = (
        (jnp.linalg.norm(dx, axis=-1) < max_edge)
        & (jnp.linalg.norm(dy, axis=-1) < max_edge)
    )
    nb_valid = (
        jnp.roll(valid, -1, 1) & jnp.roll(valid, 1, 1)
        & jnp.roll(valid, -1, 0) & jnp.roll(valid, 1, 0)
    )
    ok = valid & nb_valid & smooth & (norm[..., 0] > 1e-9)
    return jnp.where(ok[..., None], n, 0.0)


def _subsample(points, valid, stride: int):
    return points[::stride, ::stride].reshape(-1, 3), valid[::stride, ::stride].reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "iterations", "max_corr_dist", "src_stride", "dst_stride", "prior_weight"
    ),
)
def icp_point_to_plane(
    T0: jnp.ndarray,
    src_points: jnp.ndarray,  # (H, W, 3) organized grid, src camera frame
    src_valid: jnp.ndarray,
    dst_points: jnp.ndarray,  # (H, W, 3) organized grid, dst camera frame
    dst_valid: jnp.ndarray,
    iterations: int = 10,
    max_corr_dist: float = 0.05,
    src_stride: int = 4,
    dst_stride: int = 2,
    prior_weight: float = 10.0,
) -> IcpResult:
    """Refine T0 (dst_T_src) by point-to-plane ICP between two RGB-D grids.

    prior_weight adds a weak quadratic prior pulling the estimate toward the
    seed T0. Point-to-plane cost has an exact null space when the view is
    dominated by one plane (normal spectrum collapses); the prior pins those
    unconstrained directions to the seed (identity/RANSAC — already close at
    frame rate) while the data term, orders of magnitude stronger along
    constrained directions, dominates everywhere else. This is the practical
    stand-in for GICP's plane-to-plane covariance regularization
    (external/gicp/gicp.h AlignScan capability)."""
    src, sv = _subsample(src_points, src_valid, src_stride)
    dst, dv = _subsample(dst_points, dst_valid, dst_stride)
    normals = grid_normals(dst_points, dst_valid)
    nrm, _ = _subsample(normals, dst_valid, dst_stride)
    dst_masked = jnp.where(dv[:, None], dst, 1e6)  # park invalid far away
    d2_dst = jnp.sum(dst_masked * dst_masked, axis=-1)

    def nn(moved):
        # (N, M) squared distances via matmul
        m2 = jnp.sum(moved * moved, axis=-1, keepdims=True)
        cross = moved @ dst_masked.T
        d2 = m2 + d2_dst[None, :] - 2.0 * cross
        j = jnp.argmin(d2, axis=-1)
        return j, jnp.take_along_axis(d2, j[:, None], axis=-1)[:, 0]

    def step(carry, k):
        T, _, _, _ = carry
        moved = se3.apply(T, src)
        j, d2 = nn(moved)
        q = dst[j]
        n = nrm[j]
        # annealed correspondence gate (coarse-to-fine): the first iterations
        # accept matches out to 4x the final radius so an initial offset
        # larger than max_corr_dist still finds correspondences, then the
        # radius shrinks geometrically to max_corr_dist (pcl ICP analog of
        # a multi-resolution schedule without an explicit pyramid)
        corr = jnp.maximum(
            jnp.asarray(max_corr_dist, jnp.float32),
            4.0 * max_corr_dist * (0.7 ** k.astype(jnp.float32)),
        )
        ok = (
            sv
            & (d2 < corr * corr)
            & (jnp.linalg.norm(n, axis=-1) > 0.5)
        )
        r = jnp.sum((moved - q) * n, axis=-1)  # point-to-plane residual
        # robust (Cauchy) weights with scale tracking the current residual
        # distribution: damps occlusion outliers without freezing large
        # initial misalignments (coarse-to-fine without an explicit pyramid)
        absr = jnp.where(ok, jnp.abs(r), 0.0)
        sigma = jnp.maximum(jnp.percentile(absr, 80.0), 0.003)
        w = ok.astype(jnp.float32) / (1.0 + (r / sigma) ** 2)
        # Jacobian of r wrt twist [v, w_rot] at identity around current T:
        # dr/dv = n ; dr/dw = (moved x n)
        J = jnp.concatenate([n, jnp.cross(moved, n)], axis=-1)  # (N, 6)
        Jw = J * w[:, None]
        # seed prior: penalize ||log(T T0^-1)||^2 (left-multiplicative frame,
        # matching the update below); Jacobian ~ I near the seed
        r_prior = se3.log_se3(T @ se3.inv(T0))
        H = Jw.T @ J + (prior_weight + 1e-6) * jnp.eye(6)
        b = Jw.T @ r + prior_weight * r_prior
        delta = -jnp.linalg.solve(H, b)
        # trust region: cap the step (GN overshoots into point-to-plane null
        # spaces on planar scenes; small steps keep NN assignments valid)
        tn = jnp.linalg.norm(delta[:3])
        rn = jnp.linalg.norm(delta[3:])
        scale = jnp.minimum(
            jnp.where(tn > 0.05, 0.05 / tn, 1.0),
            jnp.where(rn > 0.1, 0.1 / rn, 1.0),
        )
        delta = delta * scale
        T_new = se3.exp_se3(delta) @ T  # left-multiplicative update
        n_ok = jnp.sum(ok.astype(jnp.int32))
        rmse = jnp.sqrt(jnp.sum(w * r * r) / jnp.maximum(n_ok, 1))
        # guard: keep update only with enough correspondences
        enough = n_ok >= 50
        T_out = jnp.where(enough, T_new, T)
        return (T_out, rmse, n_ok, enough), None

    init = (T0, jnp.asarray(jnp.inf, jnp.float32), jnp.asarray(0), jnp.asarray(False))
    (T, rmse, n_ok, enough), _ = jax.lax.scan(
        step, init, jnp.arange(iterations)
    )
    return IcpResult(transform=T, rmse=rmse, n_pairs=n_ok, converged=enough)
