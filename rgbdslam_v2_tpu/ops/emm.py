"""Environment Measurement Model: dense depth-reprojection validation.

Capability parity: the reference's observationLikelihood + observation
criterion (reference: src/misc.cpp:814-969, :1136-1148) run bidirectionally
by pairwiseObservationLikelihood (src/node.cpp:1520-1554): project one
frame's points into the other camera and classify each as inlier / occluded
/ outlier using a Gaussian depth-noise test with a small neighborhood search;
reject candidate transforms whose inlier fraction is too low.

TPU re-design: this is a dense gather + elementwise kernel over a strided
point grid — embarrassingly parallel, no loops. The reference's OpenMP
sections become one batched call per direction.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3
from ..core.camera import Intrinsics
from ..core.noise import depth_covariance


class EmmResult(NamedTuple):
    inliers: jnp.ndarray  # () int32
    outliers: jnp.ndarray  # () int32
    occluded: jnp.ndarray  # () int32
    all_projected: jnp.ndarray  # () int32 — valid points landing in-frame
    quality: jnp.ndarray  # () float32 = inliers / (inliers + outliers)


def observation_likelihood(
    old_T_new: jnp.ndarray,
    new_points: jnp.ndarray,  # (H, W, 3) camera-frame point grid of the NEW frame
    new_valid: jnp.ndarray,  # (H, W) bool
    old_depth: jnp.ndarray,  # (H, W) float32, 0 where invalid
    cam: Intrinsics,
    skip_step: int = 2,
    sigma_depth: float = 0.01,
    gate_sigmas: float = 2.5,
) -> EmmResult:
    """Project new-frame points into the old camera, classify depth agreement.

    For each strided valid point: predicted depth z_p in the old camera vs
    observed old_depth at the projected pixel (best over a 3x3 neighborhood
    with stride 2 — the reference's local search, misc.cpp:889-929):
      inlier   |z_obs - z_p| < gate * sigma(z)
      occluded z_obs < z_p - gate * sigma   (something closer blocks the view)
      outlier  z_obs > z_p + gate * sigma   (we predicted matter the old
                                             camera saw through — contradiction)
    """
    pts = new_points[::skip_step, ::skip_step].reshape(-1, 3)
    val = new_valid[::skip_step, ::skip_step].reshape(-1)
    moved = se3.apply(old_T_new, pts)  # (N, 3) in old camera frame
    z_pred = moved[:, 2]
    safe_z = jnp.where(jnp.abs(z_pred) < 1e-6, 1e-6, z_pred)
    u = moved[:, 0] / safe_z * cam.fx + cam.cx
    v = moved[:, 1] / safe_z * cam.fy + cam.cy
    in_img = (
        val
        & (z_pred > 0.1)
        & (u >= 1.0)
        & (u <= cam.width - 2.0)
        & (v >= 1.0)
        & (v <= cam.height - 2.0)
    )
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, cam.width - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, cam.height - 1)

    # Neighborhood search via min/max depth pooling: the 5x5 window's best
    # explanation of z_pred is clip(z_pred, min, max) when window depths fill
    # their [min, max] range. Two dense reduce_windows + 2 gathers replace
    # 9 random gathers per point (the gathers dominated the kernel on TPU).
    r = 2
    d_inf = jnp.where(old_depth > 0, old_depth, jnp.inf)
    lo_map = -jax.lax.reduce_window(
        -d_inf, -jnp.inf, jax.lax.max, (2 * r + 1, 2 * r + 1), (1, 1),
        [(r, r), (r, r)]
    )
    d_neg = jnp.where(old_depth > 0, old_depth, -jnp.inf)
    hi_map = jax.lax.reduce_window(
        d_neg, -jnp.inf, jax.lax.max, (2 * r + 1, 2 * r + 1), (1, 1),
        [(r, r), (r, r)]
    )
    lo = lo_map[vi, ui]
    hi = hi_map[vi, ui]
    has_obs = jnp.isfinite(lo)
    best_obs = jnp.clip(z_pred, lo, hi)
    best_obs = jnp.where(has_obs, best_obs, 0.0)
    counted = in_img & has_obs
    sigma2 = depth_covariance(z_pred, sigma_depth) + depth_covariance(
        best_obs, sigma_depth
    )
    gate = gate_sigmas * jnp.sqrt(sigma2)
    diff = best_obs - z_pred
    is_inlier = counted & (jnp.abs(diff) <= gate)
    is_occluded = counted & (diff < -gate)
    is_outlier = counted & (diff > gate)

    n_in = jnp.sum(is_inlier.astype(jnp.int32))
    n_out = jnp.sum(is_outlier.astype(jnp.int32))
    n_occ = jnp.sum(is_occluded.astype(jnp.int32))
    n_all = jnp.sum(counted.astype(jnp.int32))
    quality = n_in.astype(jnp.float32) / jnp.maximum(n_in + n_out, 1).astype(jnp.float32)
    return EmmResult(n_in, n_out, n_occ, n_all, quality)


def pairwise_observation_likelihood(
    new_T_old: jnp.ndarray,
    new_points,
    new_valid,
    new_depth,
    old_points,
    old_valid,
    old_depth,
    cam: Intrinsics,
    skip_step: int = 2,
    sigma_depth: float = 0.01,
) -> EmmResult:
    """Bidirectional EMM (node.cpp:1520-1554): sum both directions' counts."""
    a = observation_likelihood(
        se3.inv(new_T_old), new_points, new_valid, old_depth, cam, skip_step, sigma_depth
    )
    b = observation_likelihood(
        new_T_old, old_points, old_valid, new_depth, cam, skip_step, sigma_depth
    )
    n_in = a.inliers + b.inliers
    n_out = a.outliers + b.outliers
    quality = n_in.astype(jnp.float32) / jnp.maximum(n_in + n_out, 1).astype(
        jnp.float32
    )
    return EmmResult(
        inliers=n_in,
        outliers=n_out,
        occluded=a.occluded + b.occluded,
        all_projected=a.all_projected + b.all_projected,
        quality=quality,
    )


def observation_criterion_met(
    res: EmmResult, observability_threshold: float
) -> jnp.ndarray:
    """quality > threshold AND inliers/all > 0.25 (misc.cpp:1136-1148)."""
    if observability_threshold <= 0:
        return jnp.asarray(True)
    frac = res.inliers.astype(jnp.float32) / jnp.maximum(
        res.all_projected, 1
    ).astype(jnp.float32)
    return (res.quality > observability_threshold) & (frac > 0.25)
