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


def emm_pool_maps(depth: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """(H, W) depth -> (H, W) uint32 packed [lo | hi << 16] f16 pool maps.

    lo/hi are the window min/max depth over the (2r+1)² neighborhood,
    float16-encoded and packed into ONE uint32 plane so the per-candidate
    EMM kernel needs a single gather per projected point (gathers run on the
    TPU scalar path at ~90M/s — they dominate EMM; reduce_windows run once
    at node-commit time instead of B times per frame). f16 quantization
    (≤0.1% relative) is far below the ≥2.5σ(z) ≥ 6 mm acceptance gate."""
    d_inf = jnp.where(depth > 0, depth, jnp.inf)
    lo = -jax.lax.reduce_window(
        -d_inf, -jnp.inf, jax.lax.max, (2 * r + 1, 2 * r + 1), (1, 1),
        [(r, r), (r, r)]
    )
    d_neg = jnp.where(depth > 0, depth, -jnp.inf)
    hi = jax.lax.reduce_window(
        d_neg, -jnp.inf, jax.lax.max, (2 * r + 1, 2 * r + 1), (1, 1),
        [(r, r), (r, r)]
    )
    lo16 = jax.lax.bitcast_convert_type(lo.astype(jnp.float16), jnp.uint16)
    hi16 = jax.lax.bitcast_convert_type(hi.astype(jnp.float16), jnp.uint16)
    return lo16.astype(jnp.uint32) | (hi16.astype(jnp.uint32) << 16)


def emm_unpack(packed: jnp.ndarray):
    """uint32 packed pools -> (lo, hi) float32."""
    lo = jax.lax.bitcast_convert_type(
        (packed & 0xFFFF).astype(jnp.uint16), jnp.float16
    ).astype(jnp.float32)
    hi = jax.lax.bitcast_convert_type(
        (packed >> 16).astype(jnp.uint16), jnp.float16
    ).astype(jnp.float32)
    return lo, hi


def observation_likelihood(
    old_T_new: jnp.ndarray,
    new_points: jnp.ndarray,  # (H, W, 3) camera-frame point grid of the NEW frame
    new_valid: jnp.ndarray,  # (H, W) bool
    old_depth: jnp.ndarray,  # (H, W) float32, 0 where invalid
    cam: Intrinsics,
    skip_step: int = 2,
    sigma_depth: float = 0.01,
    gate_sigmas: float = 2.5,
    old_lohi: jnp.ndarray | None = None,  # optional precomputed emm_pool_maps
    old_lohi_row: jnp.ndarray | None = None,  # with (N, h*w) old_lohi: row id
) -> EmmResult:
    """Project new-frame points into the old camera, classify depth agreement.

    For each strided valid point: predicted depth z_p in the old camera vs
    observed old_depth at the projected pixel (best over a 3x3 neighborhood
    with stride 2 — the reference's local search, misc.cpp:889-929):
      inlier   |z_obs - z_p| < gate * sigma(z)
      occluded z_obs < z_p - gate * sigma   (something closer blocks the view)
      outlier  z_obs > z_p + gate * sigma   (we predicted matter the old
                                             camera saw through — contradiction)

    old_lohi_row: when the pool maps live in a store-shaped (N, h*w) buffer,
    pass the buffer as old_lohi and the node id here — the lookup becomes
    ONE combined 2-D gather straight from the store. Gathering the row
    first (old_lohi=store[row]) makes XLA fuse the row gather into the
    point gather as a full-buffer kLoop (~0.65 ms/frame more at B=8;
    tools/gather_probe.py F vs H).
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
    # their [min, max] range. Two dense reduce_windows + 1 paired gather
    # replace 9 random gathers per point (gathers dominated the kernel on
    # TPU); with old_lohi precomputed the reduce_windows vanish too.
    if old_lohi_row is not None:
        packed = old_lohi[old_lohi_row, vi * cam.width + ui]
    else:
        if old_lohi is None:
            old_lohi = emm_pool_maps(old_depth)
        packed = old_lohi[vi, ui]
    lo, hi = emm_unpack(packed)  # ONE gather per point
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


def observation_likelihood_exact(
    old_T_new: jnp.ndarray,
    new_points: jnp.ndarray,
    new_valid: jnp.ndarray,
    old_depth: jnp.ndarray,
    cam: Intrinsics,
    skip_step: int = 2,
    sigma_depth: float = 0.01,
    gate_sigmas: float = 3.09,
    cov_scale: float = 1.0,
) -> EmmResult:
    """Exact 9-sample neighborhood EMM — the reference's semantics verbatim
    (misc.cpp:889-929): sample the 5x5 window at stride 2 (9 gathers) and
    classify with the reference's priority — inlier if ANY sample explains
    z_pred within the gate, else occluded if ANY sample lies in front
    (z_obs < z_pred - gate), else outlier if ANY sample lies behind.

    gate_sigmas defaults to 3.09: the reference accepts when the normal cdf
    of the depth difference lies in (0.001, 0.999) — the two-sided ±3.09σ
    interval (misc.cpp:911-923). cov_scale mirrors the reference's
    `cloud_creation_skip_step * depth_covariance(z)` variance inflation for
    strided clouds (misc.cpp:903-905); pass the cloud stride for verbatim
    acceptance regions.

    This is the validation oracle for the pooled fast path
    (observation_likelihood): the pool's clip(z_pred, lo, hi) accepts every
    point the exact search accepts, plus points whose prediction falls in a
    depth-discontinuity gap [lo, hi] with no sample nearby — those the exact
    search calls occluded (in front) or outlier. Since neither occluded nor
    an unexplained gap point should veto a transform by itself, the paths
    agree on the criterion for well-behaved scenes (tested in
    tests/test_emm.py); the exact path is available for precision studies.
    """
    pts = new_points[::skip_step, ::skip_step].reshape(-1, 3)
    val = new_valid[::skip_step, ::skip_step].reshape(-1)
    moved = se3.apply(old_T_new, pts)
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

    any_good = jnp.zeros_like(in_img)
    any_front = jnp.zeros_like(in_img)
    any_behind = jnp.zeros_like(in_img)
    any_obs = jnp.zeros_like(in_img)
    sig_new = cov_scale * depth_covariance(z_pred, sigma_depth)
    for dv in (-2, 0, 2):
        for du in (-2, 0, 2):
            uu = jnp.clip(ui + du, 0, cam.width - 1)
            vv = jnp.clip(vi + dv, 0, cam.height - 1)
            z_obs = old_depth[vv, uu]
            ok = z_obs > 0
            gate = gate_sigmas * jnp.sqrt(
                sig_new + cov_scale * depth_covariance(z_obs, sigma_depth)
            )
            diff = z_obs - z_pred
            any_good |= ok & (jnp.abs(diff) <= gate)
            any_front |= ok & (diff < -gate)
            any_behind |= ok & (diff > gate)
            any_obs |= ok
    counted = in_img & any_obs
    is_inlier = counted & any_good
    is_occluded = counted & ~any_good & any_front
    is_outlier = counted & ~any_good & ~any_front & any_behind
    n_in = jnp.sum(is_inlier.astype(jnp.int32))
    n_out = jnp.sum(is_outlier.astype(jnp.int32))
    n_occ = jnp.sum(is_occluded.astype(jnp.int32))
    n_all = jnp.sum(counted.astype(jnp.int32))
    quality = n_in.astype(jnp.float32) / jnp.maximum(n_in + n_out, 1).astype(
        jnp.float32
    )
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


def rejection_significance(
    old_T_new: jnp.ndarray,
    new_points: jnp.ndarray,
    new_valid: jnp.ndarray,
    old_depth: jnp.ndarray,
    cam: Intrinsics,
    skip_step: int = 2,
    sigma_depth: float = 0.01,
    old_lohi: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Chi-square hypothesis-test variant of the EMM (misc.cpp:974-1134
    rejectionSignificance, unused in the reference's main path but part of
    its EMM toolbox): sum the per-point squared depth Mahalanobis distances
    of the projected points and return the chi^2 CDF p-value with
    dof = observation count. Values near 1.0 mean the depth disagreement is
    larger than the noise model explains (reject); consistent transforms
    score mid-range.
    """
    pts = new_points[::skip_step, ::skip_step].reshape(-1, 3)
    val = new_valid[::skip_step, ::skip_step].reshape(-1)
    moved = se3.apply(old_T_new, pts)
    z_pred = moved[:, 2]
    safe_z = jnp.where(jnp.abs(z_pred) < 1e-6, 1e-6, z_pred)
    u = moved[:, 0] / safe_z * cam.fx + cam.cx
    v = moved[:, 1] / safe_z * cam.fy + cam.cy
    in_img = (
        val & (z_pred > 0.1)
        & (u >= 1.0) & (u <= cam.width - 2.0)
        & (v >= 1.0) & (v <= cam.height - 2.0)
    )
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, cam.width - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, cam.height - 1)
    if old_lohi is None:
        old_lohi = emm_pool_maps(old_depth)
    lo, hi = emm_unpack(old_lohi[vi, ui])
    has_obs = jnp.isfinite(lo)
    best_obs = jnp.where(has_obs, jnp.clip(z_pred, lo, hi), 0.0)
    counted = in_img & has_obs
    joint = depth_covariance(z_pred, sigma_depth) + depth_covariance(
        best_obs, sigma_depth
    )
    m2 = jnp.where(counted, (best_obs - z_pred) ** 2 / joint, 0.0)
    k = jnp.sum(counted.astype(jnp.float32))
    total = jnp.sum(m2)
    # chi^2_k CDF = P(k/2, total/2) (regularized lower incomplete gamma)
    from jax.scipy.special import gammainc

    return jnp.where(k > 0, gammainc(k / 2.0, total / 2.0), 0.0)


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
