"""SE(3) pose-graph optimization: robust Gauss-Newton/LM with block PCG.

Capability parity: the reference's g2o backend — SparseOptimizer with
BlockSolver<6,3>, cholmod/csparse/PCG linear solvers, Levenberg-Marquardt,
Huber robust kernel, chi²-convergence stopping, vertex fixation
(reference: src/graph_manager.cpp:107-201 createOptimizer,
:900-1066 optimizeGraphImpl; edges added at :811-898 with Huber kernel).

TPU re-design: the graph lives in fixed-capacity arrays (poses (N,4,4),
edges as index pairs + 6x6 information blocks + active masks). One LM
iteration is a single jitted computation:
  residuals r_e = log(Z_e^{-1} X_i^{-1} X_j)           (batched, closed form)
  Jacobians  J_j = I, J_i = -Ad((X_i^{-1} X_j)^{-1})   (closed-form adjoint —
       the standard first-order PGO approximation; branch-free, no autodiff
       singularities at zero residual)
  Huber weights on chi², normal equations never materialized: PCG runs on
  an implicit matvec (gather -> 6x6 block products -> segment_sum), with a
  block-Jacobi (6x6 Cholesky) preconditioner. Fixed vertices are masked.
All hot math is batched over edges — MXU/VPU friendly, no sparse formats.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3


class GraphState(NamedTuple):
    """Fixed-capacity pose graph on device."""

    poses: jnp.ndarray  # (N, 4, 4) world_T_node
    node_active: jnp.ndarray  # (N,) bool
    node_fixed: jnp.ndarray  # (N,) bool — excluded from updates
    edge_i: jnp.ndarray  # (E,) int32
    edge_j: jnp.ndarray  # (E,) int32
    edge_meas: jnp.ndarray  # (E, 4, 4) measurement Z ≈ X_i^{-1} X_j
    edge_info: jnp.ndarray  # (E, 6, 6) information matrix
    edge_active: jnp.ndarray  # (E,) bool


def make_graph_state(n_cap: int, e_cap: int) -> GraphState:
    return GraphState(
        poses=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (n_cap, 4, 4)),
        node_active=jnp.zeros(n_cap, bool),
        node_fixed=jnp.zeros(n_cap, bool),
        edge_i=jnp.zeros(e_cap, jnp.int32),
        edge_j=jnp.zeros(e_cap, jnp.int32),
        edge_meas=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (e_cap, 4, 4)),
        edge_info=jnp.zeros((e_cap, 6, 6), jnp.float32),
        edge_active=jnp.zeros(e_cap, bool),
    )


def _adjoint(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) adjoint for twist order [v, w]: Ad = [[R, hat(t)R], [0, R]]."""
    R, t = se3.to_rt(T)
    tR = se3.hat(t) @ R
    top = jnp.concatenate([R, tR], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _edge_terms(g: GraphState, huber_delta: float):
    """Residuals, whitened Jacobian blocks, robust-weighted information."""
    Xi = g.poses[g.edge_i]
    Xj = g.poses[g.edge_j]
    B = se3.inv(Xi) @ Xj  # (E, 4, 4)
    E_err = se3.inv(g.edge_meas) @ B
    r = se3.log_se3(E_err)  # (E, 6)
    Jj = jnp.broadcast_to(jnp.eye(6, dtype=r.dtype), (r.shape[0], 6, 6))
    Ji = -_adjoint(se3.inv(B))
    chi2 = jnp.einsum("ei,eij,ej->e", r, g.edge_info, r)
    chi2 = jnp.maximum(chi2, 0.0)
    # Huber: w = 1 if chi2 <= d^2 else d / sqrt(chi2)
    d2 = huber_delta * huber_delta
    w = jnp.where(chi2 <= d2, 1.0, huber_delta / jnp.sqrt(jnp.maximum(chi2, 1e-12)))
    w = jnp.where(g.edge_active, w, 0.0)
    info_w = g.edge_info * w[:, None, None]
    return r, Ji, Jj, info_w, chi2


def edge_chi2(g: GraphState) -> jnp.ndarray:
    """Per-edge chi² under current poses (for pruning; graph_manager.cpp:1106)."""
    Xi = g.poses[g.edge_i]
    Xj = g.poses[g.edge_j]
    r = se3.log_se3(se3.inv(g.edge_meas) @ se3.inv(Xi) @ Xj)
    chi2 = jnp.einsum("ei,eij,ej->e", r, g.edge_info, r)
    return jnp.where(g.edge_active, chi2, 0.0)


def _build_gradient_and_diag(g, r, Ji, Jj, info_w):
    """b = J^T W r scattered to nodes; block-diagonal of H for preconditioner."""
    N = g.poses.shape[0]
    Ir = jnp.einsum("eij,ej->ei", info_w, r)  # (E, 6)
    bi = jnp.einsum("eji,ej->ei", Ji, Ir)  # J_i^T (W r)
    bj = jnp.einsum("eji,ej->ei", Jj, Ir)
    b = (
        jnp.zeros((N, 6), r.dtype)
        .at[g.edge_i].add(bi, mode="drop")
        .at[g.edge_j].add(bj, mode="drop")
    )
    Hii = jnp.einsum("eki,ekl,elj->eij", Ji, info_w, Ji)
    Hjj = jnp.einsum("eki,ekl,elj->eij", Jj, info_w, Jj)
    Hdiag = (
        jnp.zeros((N, 6, 6), r.dtype)
        .at[g.edge_i].add(Hii, mode="drop")
        .at[g.edge_j].add(Hjj, mode="drop")
    )
    return b, Hdiag


def _hessian_matvec(g, Ji, Jj, info_w, free_mask, lam_diag, v):
    """Implicit H v with LM damping; v: (N, 6). Fixed nodes forced to zero."""
    N = v.shape[0]
    v = v * free_mask[:, None]
    vi = v[g.edge_i]
    vj = v[g.edge_j]
    Jv = jnp.einsum("eij,ej->ei", Ji, vi) + jnp.einsum("eij,ej->ei", Jj, vj)
    WJv = jnp.einsum("eij,ej->ei", info_w, Jv)
    oi = jnp.einsum("eji,ej->ei", Ji, WJv)
    oj = jnp.einsum("eji,ej->ei", Jj, WJv)
    out = (
        jnp.zeros((N, 6), v.dtype)
        .at[g.edge_i].add(oi, mode="drop")
        .at[g.edge_j].add(oj, mode="drop")
    )
    out = out + lam_diag * v
    return out * free_mask[:, None]


def _pcg(matvec, precond, b, iters: int, tol: float = 1e-6):
    """Preconditioned conjugate gradients on (N, 6) vectors."""
    x = jnp.zeros_like(b)
    r = b
    z = precond(r)
    p = z
    rz = jnp.sum(r * z)
    b2 = jnp.sum(b * b) + 1e-30

    def body(carry, _):
        x, r, p, rz, done = carry
        Ap = matvec(p)
        pAp = jnp.sum(p * Ap)
        alpha = jnp.where(pAp > 1e-30, rz / pAp, 0.0)
        x2 = x + alpha * p
        r2 = r - alpha * Ap
        z2 = precond(r2)
        rz2 = jnp.sum(r2 * z2)
        beta = jnp.where(rz > 1e-30, rz2 / rz, 0.0)
        p2 = z2 + beta * p
        done2 = done | (jnp.sum(r2 * r2) <= tol * b2)
        # freeze the whole CG state once converged (static shapes; avoids
        # numerical drift from near-zero rz in the remaining iterations)
        keep = lambda new, old: jnp.where(done, old, new)  # noqa: E731
        return (keep(x2, x), keep(r2, r), keep(p2, p), keep(rz2, rz), done2), None

    done0 = jnp.asarray(False)
    (x, _, _, _, _), _ = jax.lax.scan(body, (x, r, p, rz, done0), None, length=iters)
    return x


def _dense_delta(g, Ji, Jj, info_w, b, free, lam_diag):
    """Assemble the full (6N, 6N) normal matrix and solve by Cholesky.

    TPU-idiomatic for small/medium graphs: one large MXU factorization
    (6N^3/3 FLOPs ~ milliseconds for N <= 1024) replaces hundreds of tiny
    serial PCG ops that are launch-latency-bound (measured ~2 s per optimize
    at N=256 with PCG vs ~tens of ms dense). g2o's cholmod/csparse direct
    solvers are the reference analog (graph_manager.cpp:107-201).
    """
    N = g.poses.shape[0]
    Hii = jnp.einsum("eki,ekl,elj->eij", Ji, info_w, Ji)
    Hjj = jnp.einsum("eki,ekl,elj->eij", Jj, info_w, Jj)
    Hij = jnp.einsum("eki,ekl,elj->eij", Ji, info_w, Jj)
    Hblk = (
        jnp.zeros((N, N, 6, 6), b.dtype)
        .at[g.edge_i, g.edge_i].add(Hii, mode="drop")
        .at[g.edge_j, g.edge_j].add(Hjj, mode="drop")
        .at[g.edge_i, g.edge_j].add(Hij, mode="drop")
        .at[g.edge_j, g.edge_i].add(jnp.swapaxes(Hij, -1, -2), mode="drop")
    )
    H = Hblk.transpose(0, 2, 1, 3).reshape(6 * N, 6 * N)
    free_flat = jnp.repeat(free, 6)
    # zero rows/cols of fixed nodes, unit diagonal there; LM damping on free.
    H = H * free_flat[:, None] * free_flat[None, :]
    damp = jnp.repeat(lam_diag[:, 0], 6) * free_flat + (1.0 - free_flat)
    H = H + jnp.diag(damp)
    rhs = (-b * free[:, None]).reshape(-1)
    L, lower = jax.scipy.linalg.cho_factor(H, lower=True)
    delta = jax.scipy.linalg.cho_solve((L, lower), rhs)
    return delta.reshape(N, 6) * free[:, None]


def _chol_solve_6(Hb: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched 6x6 SPD solve for the block-Jacobi preconditioner."""
    L = jnp.linalg.cholesky(Hb)
    y = jax.scipy.linalg.solve_triangular(L, v[..., None], lower=True)
    return jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), y, lower=False
    )[..., 0]


def lm_iteration(
    g: GraphState,
    lam: jnp.ndarray,
    huber_delta: float = 1.0,
    pcg_iters: int = 64,
    solver: str = "pcg",
):
    """One Levenberg-Marquardt iteration. Returns (new_state, new_lam, chi2_before)."""
    r, Ji, Jj, info_w, chi2_e = _edge_terms(g, huber_delta)
    chi2 = jnp.sum(jnp.where(g.edge_active, chi2_e, 0.0))
    b, Hdiag = _build_gradient_and_diag(g, r, Ji, Jj, info_w)
    free = (g.node_active & ~g.node_fixed).astype(r.dtype)
    eye6 = jnp.eye(6, dtype=r.dtype)
    # Scalar LM damping per node: lam * mean block-diagonal scale + floor.
    lam_diag = lam * jnp.einsum("nii->n", Hdiag)[:, None] / 6.0 + lam * 1e-3 + 1e-8

    if solver == "dense":
        delta = _dense_delta(g, Ji, Jj, info_w, b, free, lam_diag)
    else:
        Hprec = Hdiag + lam_diag[..., None] * eye6 + (1.0 - free)[:, None, None] * eye6

        def matvec(v):
            return _hessian_matvec(g, Ji, Jj, info_w, free, lam_diag, v)

        def precond(v):
            return _chol_solve_6(Hprec, v) * free[:, None]

        delta = _pcg(matvec, precond, -b * free[:, None], pcg_iters)
    # Candidate update: X <- X exp(delta)
    new_poses = g.poses @ se3.exp_se3(delta)
    g_new = g._replace(poses=new_poses)
    chi2_new = jnp.sum(edge_chi2(g_new))
    improved = chi2_new < chi2
    poses_out = jnp.where(improved, new_poses, g.poses)
    lam_out = jnp.where(improved, jnp.maximum(lam * 0.5, 1e-7), jnp.minimum(lam * 4.0, 1e4))
    return g._replace(poses=poses_out), lam_out, chi2, jnp.where(improved, chi2_new, chi2)


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "huber_delta", "pcg_iters", "chi2_rel_tol", "solver"),
)
def _optimize_jit(g, iterations, huber_delta, pcg_iters, chi2_rel_tol, solver):

    def body(carry):
        g, lam, prev_chi2, it, done = carry
        g2, lam2, chi2_before, chi2_after = lm_iteration(
            g, lam, huber_delta, pcg_iters, solver
        )
        rel = (chi2_before - chi2_after) / jnp.maximum(chi2_before, 1e-12)
        # Converged only when an ACCEPTED step yields a small relative chi²
        # decrease. A rejected step (chi2_after == chi2_before) must keep
        # iterating so the raised lambda gets a retry — g2o's LM semantics
        # (sparse_optimizer levenberg retries; graph_manager.cpp:998-1014).
        improved = chi2_after < chi2_before
        done2 = done | (improved & (rel < chi2_rel_tol))
        return (g2, lam2, chi2_after, it + 1, done2)

    def cond(carry):
        _, _, _, it, done = carry
        return (it < iterations) & ~done

    lam0 = jnp.asarray(1e-4, jnp.float32)
    chi0 = jnp.sum(edge_chi2(g))
    g, lam, chi2, it, _ = jax.lax.while_loop(
        cond, lambda c: body(c), (g, lam0, chi0, jnp.asarray(0), jnp.asarray(False))
    )
    return g, chi2, it


def optimize(
    g: GraphState,
    iterations: int = 20,
    huber_delta: float = 1.0,
    pcg_iters: int = 64,
    chi2_rel_tol: float = 1e-4,
    solver: str = "auto",
):
    """Run LM to convergence (fixed max iterations, early-stop by masking).

    Mirrors optimizeGraphImpl's iterate-until-chi²-improvement-small loop
    (graph_manager.cpp:998-1014). Returns (state, final_chi2, n_iter_used).

    solver: "dense" (direct block Cholesky — fastest on TPU up to ~1024
    nodes), "pcg" (implicit matvec CG — beyond dense capacity), or "auto".
    The body is jit-wrapped (re-tracing the LM loop per call costs ~2 s of
    host time; the compiled program dispatches in ~1 ms).
    """
    if solver == "auto":
        solver = "dense" if g.poses.shape[0] <= 1024 else "pcg"
    return _optimize_jit(
        g, int(iterations), float(huber_delta), int(pcg_iters),
        float(chi2_rel_tol), solver,
    )
