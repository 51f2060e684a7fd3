"""Pairwise 6-DoF registration: batched RANSAC with Mahalanobis inliers.

Capability parity: the reference's getRelativeTransformationTo —
distance-biased 4-point sampling, weighted Horn fit, squared-Mahalanobis
inlier test with per-point depth covariances, iterative refinement, identity
hypothesis fallback (reference: src/node.cpp:1074-1277, :968-1047;
errorFunction2 src/misc.cpp:697-770).

TPU re-design: ALL hypotheses evaluate simultaneously — one vmapped
computation of shape (n_hyp, n_matches): Gumbel-top-S distance-biased
sampling without replacement, batched weighted Kabsch (3x3 SVDs), analytic
3x3 Mahalanobis solves, argmax selection, then a fixed number of masked
refinement refits. No data-dependent control flow: degenerate hypotheses
score zero inliers and lose the argmax.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3
from ..core.alignment import weighted_kabsch, weighted_kabsch_quat
from ..core.noise import point_covariance_diag


class RegistrationResult(NamedTuple):
    transform: jnp.ndarray  # (4, 4) dst_T_src: maps src-frame points into dst frame
    inliers: jnp.ndarray  # (M,) bool
    n_inliers: jnp.ndarray  # () int32
    rmse: jnp.ndarray  # () float32 — RMS Mahalanobis distance of inliers
    success: jnp.ndarray  # () bool


def _sym3_solve(S: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Solve S x = d for symmetric 3x3 S via adjugate (batched, branch-free)."""
    a, b, c = S[..., 0, 0], S[..., 0, 1], S[..., 0, 2]
    e, f = S[..., 1, 1], S[..., 1, 2]
    i = S[..., 2, 2]
    A = e * i - f * f
    B = c * f - b * i
    C = b * f - c * e
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    E = a * i - c * c
    F = b * c - a * f
    I = a * e - b * b
    x0 = A * d[..., 0] + B * d[..., 1] + C * d[..., 2]
    x1 = B * d[..., 0] + E * d[..., 1] + F * d[..., 2]
    x2 = C * d[..., 0] + F * d[..., 1] + I * d[..., 2]
    return jnp.stack([x0, x1, x2], axis=-1) / det[..., None]


def mahalanobis_sq(
    T: jnp.ndarray,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    src_cov: jnp.ndarray,
    dst_cov: jnp.ndarray,
) -> jnp.ndarray:
    """Squared Mahalanobis distance of dst vs T@src (errorFunction2 semantics).

    T: (..., 4, 4); src/dst: (..., M, 3); *_cov: (..., M, 3) diagonal
    covariances in each point's own camera frame. The src covariance rotates
    into the dst frame: Sigma = D_dst + R D_src R^T. Returns (..., M).
    """
    R = T[..., :3, :3]
    moved = se3.apply(T, src)
    diff = moved - dst
    # R D R^T with D diagonal: (R * d[None, :]) @ R^T, batched over M.
    Rb = R[..., None, :, :]  # (..., 1, 3, 3)
    RD = Rb * src_cov[..., None, :]  # (..., M, 3, 3)
    Sigma = RD @ jnp.swapaxes(Rb, -1, -2) + (
        dst_cov[..., None] * jnp.eye(3, dtype=src.dtype)
    )
    x = _sym3_solve(Sigma, diff)
    return jnp.sum(diff * x, axis=-1)


def _gumbel_topk_sample(key, logits: jnp.ndarray, n_hyp: int, k: int):
    """Sample n_hyp index sets of size k without replacement, ∝ softmax(logits).

    k successive masked-argmax passes instead of lax.top_k: top_k lowers to
    a full stable variadic sort of the (n_hyp, M) f32+s32 matrix on TPU
    (sort.16 in the compare HLO — the costliest op left in the program at
    candidate batch 8), while k <= 4 argmax reductions run at VPU memory
    speed. Sequential argmax-and-mask returns exactly top_k's indices in
    descending-value order (first-occurrence tie-break matches the stable
    sort), so the sampled sets are unchanged."""
    g = jax.random.gumbel(key, (n_hyp,) + logits.shape) + logits[None, :]
    cols = jnp.arange(logits.shape[0], dtype=jnp.int32)
    # -inf (invalid) entries become huge-negative FINITE keys descending by
    # index: masking a picked entry to -inf then excludes it even when every
    # remaining entry was -inf, so rows with < k finite logits still yield
    # k DISTINCT indices in ascending index order — exactly top_k's stable
    # tie-break (argmax alone would return index 0 forever on an all--inf
    # row, silently sampling WITH replacement).
    g = jnp.where(jnp.isfinite(g), g,
                  jnp.float32(-1e30) - cols.astype(jnp.float32) * 1e24)
    idxs = []
    for _ in range(k):
        i = jnp.argmax(g, axis=-1).astype(jnp.int32)
        idxs.append(i)
        g = jnp.where(cols[None, :] == i[:, None], -jnp.inf, g)
    return jnp.stack(idxs, axis=-1)  # (n_hyp, k)


def pose_information(
    T: jnp.ndarray,
    src_xyz: jnp.ndarray,
    dst_xyz: jnp.ndarray,
    src_cov: jnp.ndarray,
    dst_cov: jnp.ndarray,
    inliers: jnp.ndarray,
) -> jnp.ndarray:
    """Gauss-Newton 6x6 information of the pairwise pose estimate.

    For the point-to-point problem r_i = T s_i - d_i with per-point
    covariance Sigma_i = D_dst + R D_src R^T (errorFunction2's model), the
    GN Hessian at the optimum is H = sum_i J_i^T Sigma_i^{-1} J_i with
    J_i = [I3 | -[T s_i]_x] (left perturbation xi = (t, omega)). Unlike
    the reference's isotropic inliers/rmse^2 identity (graph_manager.cpp
    edge information), H captures which pose directions the match geometry
    actually constrains — e.g. a frontal far wall constrains rotation well
    but z-translation poorly. Returned un-normalized; the caller scales it
    (device_step trace-matches it to the scalar info so the protocol's
    chi2 prune thresholds keep their calibration).
    """
    R = T[:3, :3]
    p = se3.apply(T, src_xyz)  # (M, 3)
    Rb = R[None]
    RD = Rb * src_cov[:, None, :]
    Sigma = RD @ jnp.swapaxes(Rb, -1, -2) + (
        dst_cov[..., None] * jnp.eye(3, dtype=src_xyz.dtype)
    )  # (M, 3, 3)
    # Sigma^{-1} via adjugate (symmetric 3x3, branch-free)
    a, b, c = Sigma[:, 0, 0], Sigma[:, 0, 1], Sigma[:, 0, 2]
    e, f = Sigma[:, 1, 1], Sigma[:, 1, 2]
    i = Sigma[:, 2, 2]
    A = e * i - f * f
    B = c * f - b * i
    C = b * f - c * e
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    E = a * i - c * c
    F = b * c - a * f
    I3 = a * e - b * b
    Sinv = (
        jnp.stack(
            [
                jnp.stack([A, B, C], -1),
                jnp.stack([B, E, F], -1),
                jnp.stack([C, F, I3], -1),
            ],
            -2,
        )
        / det[:, None, None]
    )  # (M, 3, 3)
    w = inliers.astype(src_xyz.dtype)
    Sinv = Sinv * w[:, None, None]
    # J = [I | -P], P = skew(p); blocks of J^T Sinv J:
    #   tt = Sinv, tr = -Sinv P, rr = P^T Sinv P  (P^T = -P)
    zeros = jnp.zeros_like(p[:, 0])
    P = jnp.stack(
        [
            jnp.stack([zeros, -p[:, 2], p[:, 1]], -1),
            jnp.stack([p[:, 2], zeros, -p[:, 0]], -1),
            jnp.stack([-p[:, 1], p[:, 0], zeros], -1),
        ],
        -2,
    )  # (M, 3, 3)
    SP = Sinv @ P
    tt = jnp.sum(Sinv, axis=0)
    tr = -jnp.sum(SP, axis=0)
    rr = jnp.sum(jnp.swapaxes(P, -1, -2) @ SP, axis=0)
    top = jnp.concatenate([tt, tr], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(tr, -1, -2), rr], axis=-1)
    H = jnp.concatenate([top, bot], axis=-2)  # (6, 6)
    # exact symmetry (guards tiny fp asymmetry before Cholesky/LM use)
    return 0.5 * (H + jnp.swapaxes(H, -1, -2))


def ransac_register(
    key: jnp.ndarray,
    src_xyz: jnp.ndarray,
    dst_xyz: jnp.ndarray,
    match_dist: jnp.ndarray,
    match_valid: jnp.ndarray,
    cam_fx: float,
    cam_fy: float,
    n_hypotheses: int = 256,
    sample_size: int = 4,
    max_mahal_sq: float = 9.0,
    refine_iterations: int = 6,
    min_inliers: int = 12,
    sigma_depth: float = 0.01,
    projective_iterations: int = 0,
    cam_cx: float = 319.5,
    cam_cy: float = 239.5,
) -> RegistrationResult:
    """One batched RANSAC solve over M matched 3D point pairs.

    src_xyz: (M, 3) points in the NEW frame; dst_xyz: (M, 3) points in the
    OLD frame. Returns dst_T_src. Includes the identity hypothesis
    (node.cpp:1192-1215 capability) as one extra hypothesis.

    projective_iterations > 0 additionally runs the reference's
    g2o_transformation_refinement equivalent on the final inlier set:
    joint pose+landmark Gauss-Newton over (u, v, depth) measurement
    residuals with depth-dependent information (ops/projective.py;
    transformation_estimation.cpp:37-170).
    """
    M = src_xyz.shape[0]
    w_depth = jnp.where(
        match_valid,
        1.0 / (jnp.maximum(src_xyz[:, 2], 1e-3) * jnp.maximum(dst_xyz[:, 2], 1e-3)),
        0.0,
    )
    src_cov = point_covariance_diag(src_xyz[:, 2], cam_fx, cam_fy, sigma_depth)
    dst_cov = point_covariance_diag(dst_xyz[:, 2], cam_fx, cam_fy, sigma_depth)

    # --- hypothesis sampling: prefer small descriptor distance -------------
    # (sample_matches_prefer_by_distance, node.cpp:1024-1047): bias logits by
    # negative rank of the match distance.
    order = jnp.argsort(jnp.where(match_valid, match_dist, jnp.inf))
    rank = jnp.zeros((M,), jnp.float32).at[order].set(
        jnp.arange(M, dtype=jnp.float32)
    )
    logits = jnp.where(match_valid, -rank * (4.0 / M), -jnp.inf)
    idx = _gumbel_topk_sample(key, logits, n_hypotheses, sample_size)  # (H, S)

    s_pts = src_xyz[idx]  # (H, S, 3)
    d_pts = dst_xyz[idx]
    s_w = w_depth[idx]
    T_h = weighted_kabsch_quat(s_pts, d_pts, s_w)  # (H, 4, 4), batched
    # Add the identity hypothesis.
    T_h = jnp.concatenate([T_h, jnp.eye(4, dtype=T_h.dtype)[None]], axis=0)

    # --- score all hypotheses against all matches --------------------------
    # Hypothesis sweep uses an ISOTROPIC Mahalanobis gate (scalar variance
    # per match = mean of the summed diagonal covariances): the full
    # anisotropic form costs (H x M) 3x3 solves and dominates the kernel;
    # ranking is insensitive to the difference. Refinement and the final
    # inlier set below use the full errorFunction2 covariance model.
    iso_var = jnp.mean(src_cov + dst_cov, axis=-1)  # (M,)

    def score(T):
        diff = se3.apply(T, src_xyz) - dst_xyz
        m2 = jnp.sum(diff * diff, axis=-1) / iso_var
        inl = match_valid & (m2 < max_mahal_sq)
        n = jnp.sum(inl.astype(jnp.int32))
        err = jnp.sum(jnp.where(inl, m2, 0.0)) / jnp.maximum(n, 1)
        return inl, n, err

    inl_h, n_h, err_h = jax.vmap(score)(T_h)
    quality = n_h.astype(jnp.float32) - err_h / (err_h + 1.0)
    best = jnp.argmax(quality)
    T = T_h[best]
    inliers = inl_h[best]

    # --- iterative refinement on inliers (masked refits) -------------------
    def refine_step(carry, _):
        T, inliers = carry
        w = jnp.where(inliers, w_depth, 0.0)
        # exact SVD here: only refine_iterations fits per candidate (the
        # hypothesis sweep above used the fast quaternion solver)
        T2 = weighted_kabsch(src_xyz, dst_xyz, w)
        m2 = mahalanobis_sq(T2, src_xyz, dst_xyz, src_cov, dst_cov)
        inl2 = match_valid & (m2 < max_mahal_sq)
        # Keep the refit only if it doesn't collapse the inlier set.
        better = jnp.sum(inl2.astype(jnp.int32)) >= jnp.int32(3)
        T = jnp.where(better, T2, T)
        inliers = jnp.where(better, inl2, inliers)
        return (T, inliers), None

    (T, inliers), _ = jax.lax.scan(
        refine_step, (T, inliers), None, length=refine_iterations
    )
    if projective_iterations > 0:
        # pixel-space joint pose+landmark GN on the inlier set — better
        # conditioned than further 3D refits for distant/noisy-depth
        # correspondences (transformation_estimation.cpp:37-170)
        from .projective import refine_projective, uvz_from_xyz

        m2 = mahalanobis_sq(T, src_xyz, dst_xyz, src_cov, dst_cov)
        inliers = match_valid & (m2 < max_mahal_sq)
        T_p = refine_projective(
            T,
            uvz_from_xyz(src_xyz, cam_fx, cam_fy, cam_cx, cam_cy),
            uvz_from_xyz(dst_xyz, cam_fx, cam_fy, cam_cx, cam_cy),
            inliers.astype(src_xyz.dtype),
            cam_fx, cam_fy, cam_cx, cam_cy,
            iterations=projective_iterations,
            sigma_depth=sigma_depth,
        )
        # keep the projective result only if it does not lose inliers under
        # the standard acceptance metric (GN on few/degenerate points could)
        m2_p = mahalanobis_sq(T_p, src_xyz, dst_xyz, src_cov, dst_cov)
        inl_p = match_valid & (m2_p < max_mahal_sq)
        better = jnp.sum(inl_p.astype(jnp.int32)) >= jnp.sum(
            inliers.astype(jnp.int32)
        )
        T = jnp.where(better, T_p, T)

    m2 = mahalanobis_sq(T, src_xyz, dst_xyz, src_cov, dst_cov)
    inliers = match_valid & (m2 < max_mahal_sq)
    n_inl = jnp.sum(inliers.astype(jnp.int32))
    rmse = jnp.sqrt(
        jnp.sum(jnp.where(inliers, m2, 0.0)) / jnp.maximum(n_inl, 1)
    )
    return RegistrationResult(
        transform=T,
        inliers=inliers,
        n_inliers=n_inl,
        rmse=rmse,
        success=n_inl >= min_inliers,
    )
