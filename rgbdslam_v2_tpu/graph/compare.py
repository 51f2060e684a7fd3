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
from ..ops.registration import pose_information, ransac_register
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
    info6: jnp.ndarray  # (B, 6, 6) GN pose information (zeros in scalar mode)


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
        "edge_info_mode",
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
    edge_info_mode: str = "scalar",
) -> CompareResult:
    B = cand_idx.shape[0]
    h, w = cam_small.height, cam_small.width
    c_desc = store.desc[cand_idx]  # (B, K, D)
    c_xyz = store.xyz[cand_idx]
    c_val = store.kp_valid[cand_idx]
    # The candidates' depth is only sampled at the EMM stride (direction-2
    # point set). The store precomputes that sample plane (emm_zs) so the
    # per-candidate read is a small CONTIGUOUS row gather (150 KB) — both a
    # full-row gather (2.4 MB DMA) and a 2-D strided gather (38 K
    # scalar-path accesses) cost ~0.7 ms/frame on v5e.
    e = emm_skip
    hs, ws = -(-h // e), -(-w // e)
    if store.emm_zs.shape[1] == hs * ws:
        c_zs = store.emm_zs[cand_idx].reshape(B, hs, ws)
    else:  # store built at a different stride: strided gather fallback
        flat = (
            (jnp.arange(hs) * e)[:, None] * w + (jnp.arange(ws) * e)[None, :]
        ).reshape(-1)
        c_zs = store.depth[cand_idx[:, None], flat[None, :]].reshape(B, hs, ws)

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
    # (store.emm_lohi), the new frame's are computed ONCE here. Direction a
    # indexes store.emm_lohi DIRECTLY (row id + flat pixel, one combined
    # gather) — row-gathering the planes first makes XLA fuse the row gather
    # into the point gather as a full-buffer kLoop over the whole store
    # (~0.65 ms/frame at B=8; tools/gather_probe.py).
    new_lohi = emm_pool_maps(new_depth_small)

    def _combine(a, b):
        n_in = a.inliers + b.inliers
        n_out = a.outliers + b.outliers
        n_all = a.all_projected + b.all_projected
        q = n_in.astype(jnp.float32) / jnp.maximum(n_in + n_out, 1).astype(jnp.float32)
        frac = n_in.astype(jnp.float32) / jnp.maximum(n_all, 1).astype(jnp.float32)
        return q, frac, n_all

    if emm_exact:
        # precision-study path (tpu_emm_exact): the reference's verbatim
        # 9-sample neighborhood search with the cloud-stride covariance
        # inflation — needs the candidates' full depth maps
        from ..ops.emm import observation_likelihood_exact

        new_points = backproject_grid(new_depth_small, cam_small)
        new_valid = new_depth_small > 0
        c_depth = store.depth[cand_idx].reshape(B, h, w)

        def emm_one_exact(T, cdepth):
            a = observation_likelihood_exact(
                T, new_points, new_valid, cdepth, cam_small, emm_skip,
                sigma_depth, cov_scale=float(emm_skip),
            )
            cpoints = backproject_grid(cdepth, cam_small)
            b = observation_likelihood_exact(
                se3.inv(T), cpoints, cdepth > 0, new_depth_small, cam_small,
                emm_skip, sigma_depth, cov_scale=float(emm_skip),
            )
            return _combine(a, b)

        emm_q, emm_frac, emm_all = jax.vmap(emm_one_exact)(
            reg.transform, c_depth
        )
    else:
        # BOTH directions' point sets straight from strided samples: pixel
        # (i*e, j*e) with its depth — identical samples to striding a full
        # backprojected grid, without materializing the (h, w, 3) grids
        us = (jnp.arange(ws) * e).astype(jnp.float32)
        vs = (jnp.arange(hs) * e).astype(jnp.float32)

        def strided_points(zs):
            x = (us[None, :] - cam_small.cx) * zs / cam_small.fx
            y = (vs[:, None] - cam_small.cy) * zs / cam_small.fy
            return jnp.stack([x, y, zs], axis=-1)

        n_zs = new_depth_small[::e, ::e]
        new_points_s = strided_points(n_zs)
        new_valid_s = n_zs > 0

        def emm_one(T, czs, row):
            # direction 1: new points into candidate camera (old_T_new = T);
            # czs is traced but unused here (the store's lohi row supplies
            # the samples via the combined gather)
            a = observation_likelihood(
                T, new_points_s, new_valid_s, czs, cam_small, 1,
                sigma_depth, old_lohi=store.emm_lohi, old_lohi_row=row,
            )
            b = observation_likelihood(
                se3.inv(T), strided_points(czs), czs > 0, new_depth_small,
                cam_small, 1, sigma_depth, old_lohi=new_lohi,
            )
            return _combine(a, b)

        emm_q, emm_frac, emm_all = jax.vmap(
            emm_one, in_axes=(0, 0, 0)
        )(reg.transform, c_zs, cand_idx)

    if edge_info_mode == "hessian":
        from ..core.noise import point_covariance_diag

        def info_one(T, s_pts, d_pts, inl):
            s_cov = point_covariance_diag(s_pts[:, 2], cam_fx, cam_fy,
                                          sigma_depth)
            d_cov = point_covariance_diag(d_pts[:, 2], cam_fx, cam_fy,
                                          sigma_depth)
            return pose_information(T, s_pts, d_pts, s_cov, d_cov, inl)

        info6 = jax.vmap(info_one)(reg.transform, src, dst, reg.inliers)
    else:
        info6 = jnp.zeros((B, 6, 6), src.dtype)

    return CompareResult(
        transform=reg.transform,
        n_inliers=reg.n_inliers,
        rmse=reg.rmse,
        n_matches=m.count(),
        ransac_ok=reg.success,
        emm_quality=emm_q,
        emm_inlier_frac=emm_frac,
        emm_all=emm_all,
        info6=info6,
    )
