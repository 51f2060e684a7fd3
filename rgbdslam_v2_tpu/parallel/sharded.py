"""Sharded SLAM kernels: candidate fan-out and pose-graph LM over a mesh.

Two real multi-chip paths (shard_map + XLA collectives over ICI):

1. sharded_compare — the frontend's loop-closure candidate fan-out
   (reference analog: QtConcurrent::blockingMapped over candidate nodes,
   graph_manager.cpp:548): candidates shard over mesh axis "c"; the new
   frame's keypoints are replicated; each device matches + RANSACs its
   candidate shard; results concatenate by construction (no collective
   needed — outputs stay sharded along B and gather on host read).

2. sharded_lm_iteration — the backend's normal-equation assembly
   (reference analog: g2o sparse solve, graph_manager.cpp:998): edges shard
   over "c"; poses replicate; per-shard gradient/diagonal/matvec partials
   reduce with psum; the PCG loop runs identically (replicated) on all
   devices, so pose updates stay consistent without extra communication.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core import se3
from ..optim.pose_graph import (
    GraphState,
    _build_gradient_and_diag,
    _chol_solve_6,
    _edge_terms,
    _hessian_matvec,
    _pcg,
    edge_chi2,
)
from ..graph.compare import compare_to_candidates


# ----------------------------------------------------------------------
# 1. candidate fan-out
# ----------------------------------------------------------------------
def sharded_compare(mesh: Mesh, new_kp, new_depth_small, store, cand_idx, key,
                    cam_small, **kw):
    """Shard the candidate axis of compare_to_candidates over the mesh.

    cand_idx length must be a multiple of the mesh size. The heavy inputs
    (store) are replicated; with large stores, shard store rows instead and
    route candidates to their owning device (future work — requires a
    permutation collective).
    """
    n = mesh.devices.size

    def local(new_kp, new_depth_small, store, cand_shard, keys_shard):
        return compare_to_candidates(
            new_kp, new_depth_small, store, cand_shard, keys_shard[0],
            cam_small, **kw,
        )

    keys = jax.random.split(key, n)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("c"), P("c")),
        out_specs=P("c"),
        check_vma=False,
    )
    return fn(new_kp, new_depth_small, store, cand_idx, keys)


# ----------------------------------------------------------------------
# 2. distributed pose-graph LM
# ----------------------------------------------------------------------
class _EdgeShard(NamedTuple):
    edge_i: jnp.ndarray
    edge_j: jnp.ndarray
    edge_meas: jnp.ndarray
    edge_info: jnp.ndarray
    edge_active: jnp.ndarray


def sharded_lm_iteration(
    mesh: Mesh,
    g: GraphState,
    lam: jnp.ndarray,
    huber_delta: float = 1.0,
    pcg_iters: int = 32,
):
    """One LM iteration with edges sharded over the mesh ("c" axis).

    Poses/masks replicate; per-shard J^T W r and J^T W J partials psum into
    the replicated normal equations; the PCG iteration then runs redundantly
    (identical) on every device. Returns (new_state, new_lam, chi2_before,
    chi2_after) like optim.pose_graph.lm_iteration.
    """

    def local(poses, node_active, node_fixed, shard: _EdgeShard, lam):
        gl = GraphState(
            poses=poses,
            node_active=node_active,
            node_fixed=node_fixed,
            edge_i=shard.edge_i,
            edge_j=shard.edge_j,
            edge_meas=shard.edge_meas,
            edge_info=shard.edge_info,
            edge_active=shard.edge_active,
        )
        r, Ji, Jj, info_w, chi2_e = _edge_terms(gl, huber_delta)
        chi2 = jax.lax.psum(
            jnp.sum(jnp.where(gl.edge_active, chi2_e, 0.0)), "c"
        )
        b_loc, Hdiag_loc = _build_gradient_and_diag(gl, r, Ji, Jj, info_w)
        b = jax.lax.psum(b_loc, "c")
        Hdiag = jax.lax.psum(Hdiag_loc, "c")
        free = (node_active & ~node_fixed).astype(r.dtype)
        eye6 = jnp.eye(6, dtype=r.dtype)
        lam_diag = lam * jnp.einsum("nii->n", Hdiag)[:, None] / 6.0 + lam * 1e-3 + 1e-8
        Hprec = Hdiag + lam_diag[..., None] * eye6 + (1.0 - free)[:, None, None] * eye6

        def matvec(v):
            local_hv = _hessian_matvec(gl, Ji, Jj, info_w, free, 0.0, v)
            hv = jax.lax.psum(local_hv, "c")
            return (hv + lam_diag * v) * free[:, None]

        def precond(v):
            return _chol_solve_6(Hprec, v) * free[:, None]

        delta = _pcg(matvec, precond, -b * free[:, None], pcg_iters)
        new_poses = poses @ se3.exp_se3(delta)
        gl_new = gl._replace(poses=new_poses)
        chi2_new = jax.lax.psum(jnp.sum(edge_chi2(gl_new)), "c")
        improved = chi2_new < chi2
        poses_out = jnp.where(improved, new_poses, poses)
        lam_out = jnp.where(
            improved, jnp.maximum(lam * 0.5, 1e-7), jnp.minimum(lam * 4.0, 1e4)
        )
        return poses_out, lam_out, chi2, jnp.where(improved, chi2_new, chi2)

    shard = _EdgeShard(g.edge_i, g.edge_j, g.edge_meas, g.edge_info, g.edge_active)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("c"), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    poses, lam_out, chi2, chi2_new = fn(
        g.poses, g.node_active, g.node_fixed, shard, lam
    )
    return g._replace(poses=poses), lam_out, chi2, chi2_new


def sharded_optimize(mesh: Mesh, g: GraphState, iterations: int = 15,
                     huber_delta: float = 1.0, pcg_iters: int = 32):
    """Host loop over sharded LM iterations. Returns (state, chi2)."""
    lam = jnp.asarray(1e-4, jnp.float32)
    chi2 = None
    for _ in range(iterations):
        g, lam, chi2_before, chi2 = sharded_lm_iteration(
            mesh, g, lam, huber_delta, pcg_iters
        )
        if float(chi2_before) > 0 and (float(chi2_before) - float(chi2)) / float(
            chi2_before
        ) < 1e-4:
            break
    return g, chi2
