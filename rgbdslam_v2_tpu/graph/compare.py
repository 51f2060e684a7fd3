"""Batched candidate comparison: the flagship device kernel.

Capability parity: the reference's matchNodePair fan-out over candidate
nodes via QtConcurrent::blockingMapped (reference: src/node.cpp:1305-1429,
src/graph_manager.cpp:531-583). TPU re-design: ALL candidates are processed
in ONE device call — descriptor matching (B batched MXU matmuls), RANSAC
(B x n_hyp batched hypotheses), and bidirectional EMM validation (B batched
dense reprojections) — replacing the reference's thread pool with vmap.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3
from ..core.camera import Intrinsics, backproject_grid
from ..models.types import Keypoints
from ..ops.emm import emm_pool_maps, observation_likelihood
from ..ops.matching import match_descriptors
from ..ops.registration import ransac_register
from .node_store import NodeStore


class CompareResult(NamedTuple):
    """Per-candidate registration outcome (B,) leading dimension."""

    transform: jnp.ndarray  # (B, 4, 4) cand_T_new
    n_inliers: jnp.ndarray  # (B,) int32
    rmse: jnp.ndarray  # (B,) float32
    n_matches: jnp.ndarray  # (B,) int32
    ransac_ok: jnp.ndarray  # (B,) bool
    emm_quality: jnp.ndarray  # (B,) float32
    emm_inlier_frac: jnp.ndarray  # (B,) float32
    emm_all: jnp.ndarray  # (B,) int32


@functools.partial(
    jax.jit,
    static_argnames=(
        "cam_small",
        "cam_fx",
        "cam_fy",
        "max_matches",
        "ratio",
        "n_hypotheses",
        "max_mahal_sq",
        "min_inliers",
        "emm_skip",
        "sigma_depth",
        "sample_size",
        "refine_iterations",
        "projective_iterations",
        "cam_cx",
        "cam_cy",
        "emm_exact",
    ),
)
def compare_to_candidates(
    new_kp: Keypoints,
    new_depth_small: jnp.ndarray,  # (h, w) stride-s depth of the new frame
    store: NodeStore,
    cand_idx: jnp.ndarray,  # (B,) int32 node ids (may repeat; mask on host)
    key: jnp.ndarray,
    cam_small: Intrinsics,  # intrinsics at the EMM stride
    cam_fx: float = 525.0,  # full-res intrinsics for feature covariances
    cam_fy: float = 525.0,
    max_matches: int = 300,
    ratio: float = 0.95,
    n_hypotheses: int = 256,
    max_mahal_sq: float = 9.0,
    min_inliers: int = 12,
    emm_skip: int = 1,
    sigma_depth: float = 0.01,
    sample_size: int = 4,
    refine_iterations: int = 6,
    projective_iterations: int = 0,
    cam_cx: float = 319.5,
    cam_cy: float = 239.5,
    emm_exact: bool = False,
) -> CompareResult:
    B = cand_idx.shape[0]
    h, w = cam_small.height, cam_small.width
    c_desc = store.desc[cand_idx]  # (B, K, D)
    c_xyz = store.xyz[cand_idx]
    c_val = store.kp_valid[cand_idx]
    c_depth = store.depth[cand_idx].reshape(B, h, w)  # rows stored flat

    # ---- matching: B batched exact knn2 + ratio + dedup --------------------
    # The store may hold descriptors in a different dtype (tpu_descriptor_dtype)
    new_desc = new_kp.desc.astype(store.desc.dtype)
    m = jax.vmap(
        lambda d, v: match_descriptors(
            new_desc, new_kp.valid, d, v, max_matches, ratio
        )
    )(c_desc, c_val)
    src = new_kp.xyz[m.src_idx]  # (B, M, 3)
    dst = jnp.take_along_axis(c_xyz, m.dst_idx[..., None], axis=1)  # (B, M, 3)

    # ---- RANSAC over all candidates at once --------------------------------
    keys = jax.random.split(key, B)
    reg = jax.vmap(
        lambda k, s, d, md, mv: ransac_register(
            k,
            s,
            d,
            md,
            mv,
            cam_fx=cam_fx,
            cam_fy=cam_fy,
            n_hypotheses=n_hypotheses,
            sample_size=sample_size,
            max_mahal_sq=max_mahal_sq,
            refine_iterations=refine_iterations,
            min_inliers=min_inliers,
            sigma_depth=sigma_depth,
            projective_iterations=projective_iterations,
            cam_cx=cam_cx,
            cam_cy=cam_cy,
        )
    )(keys, src, dst, m.dist, m.valid)

    # ---- bidirectional EMM at the storage stride ---------------------------
    # All reduce_window pooling is hoisted out of the per-candidate vmap: the
    # candidates' [lo, hi] maps were precomputed at commit time
    # (store.emm_lohi), the new frame's are computed ONCE here.
    new_points = backproject_grid(new_depth_small, cam_small)
    new_valid = new_depth_small > 0
    new_lohi = emm_pool_maps(new_depth_small)
    c_lohi = store.emm_lohi[cand_idx].reshape(B, h, w)  # packed f16 pairs

    def emm_one(T, cdepth, clohi):
        if emm_exact:
            # precision-study path: the reference's verbatim 9-sample
            # neighborhood search (tpu_emm_exact; ops/emm.py oracle) with
            # the cloud-stride covariance inflation
            from ..ops.emm import observation_likelihood_exact

            a = observation_likelihood_exact(
                T, new_points, new_valid, cdepth, cam_small, emm_skip,
                sigma_depth, cov_scale=float(emm_skip),
            )
            cpoints = backproject_grid(cdepth, cam_small)
            b = observation_likelihood_exact(
                se3.inv(T), cpoints, cdepth > 0, new_depth_small, cam_small,
                emm_skip, sigma_depth, cov_scale=float(emm_skip),
            )
            n_in = a.inliers + b.inliers
            n_out = a.outliers + b.outliers
            n_all = a.all_projected + b.all_projected
            q = n_in.astype(jnp.float32) / jnp.maximum(n_in + n_out, 1).astype(jnp.float32)
            frac = n_in.astype(jnp.float32) / jnp.maximum(n_all, 1).astype(jnp.float32)
            return q, frac, n_all
        # direction 1: new points into candidate camera (old_T_new = T)
        a = observation_likelihood(
            T, new_points, new_valid, cdepth, cam_small, emm_skip, sigma_depth,
            old_lohi=clohi,
        )
        cpoints = backproject_grid(cdepth, cam_small)
        b = observation_likelihood(
            se3.inv(T), cpoints, cdepth > 0, new_depth_small, cam_small,
            emm_skip, sigma_depth, old_lohi=new_lohi,
        )
        n_in = a.inliers + b.inliers
        n_out = a.outliers + b.outliers
        n_all = a.all_projected + b.all_projected
        q = n_in.astype(jnp.float32) / jnp.maximum(n_in + n_out, 1).astype(jnp.float32)
        frac = n_in.astype(jnp.float32) / jnp.maximum(n_all, 1).astype(jnp.float32)
        return q, frac, n_all

    emm_q, emm_frac, emm_all = jax.vmap(emm_one)(reg.transform, c_depth, c_lohi)

    return CompareResult(
        transform=reg.transform,
        n_inliers=reg.n_inliers,
        rmse=reg.rmse,
        n_matches=m.count(),
        ransac_ok=reg.success,
        emm_quality=emm_q,
        emm_inlier_frac=emm_frac,
        emm_all=emm_all,
    )
