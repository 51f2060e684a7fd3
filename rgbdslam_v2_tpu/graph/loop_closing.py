"""Appearance-based global loop-closure retrieval over all stored nodes.

Capability parity: the reference's experimental DO_LOOP_CLOSING path builds
a global FLANN KD-tree over every node's descriptors and retrieves the
nodes with most matched features as loop candidates
(reference: src/loop_closing.cpp:190-278 getNeighbours, self-test :125-187).

TPU re-design: no tree. The NodeStore's descriptor array IS the index:
score all nodes at once with one (K, D) x (N*K, D)^T matmul on the MXU and
count ratio-test-passing matches per node with a segment-sum. Exact (not
approximate) retrieval, one device call.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.types import Keypoints
from ..ops.matching import descriptor_distances
from .node_store import NodeStore


@functools.partial(jax.jit, static_argnames=("ratio",))
def global_match_scores(
    kp: Keypoints,
    store: NodeStore,
    node_active: jnp.ndarray,  # (N,) bool — which rows are real nodes
    exclude_mask: jnp.ndarray,  # (N,) bool — e.g. the query node + neighbors
    ratio: float = 0.8,
) -> jnp.ndarray:
    """Per-node count of query keypoints whose global NN lies in that node
    and passes the ratio test vs the global 2nd NN. Returns (N,) int32."""
    N, K, D = store.desc.shape
    flat_desc = store.desc.reshape(N * K, D)
    flat_valid = (
        store.kp_valid
        & node_active[:, None]
        & ~exclude_mask[:, None]
    ).reshape(N * K)
    dist = descriptor_distances(kp.desc, flat_desc)  # (Kq, N*K)
    big = jnp.float32(1e9)
    dist = jnp.where(kp.valid[:, None] & flat_valid[None, :], dist, big)
    # The same physical point appears in many nodes, so the plain global
    # 2nd-NN is usually the same feature in another frame and the ratio test
    # would reject everything. Ratio-test against the best match from a
    # DIFFERENT node instead (multi-image retrieval convention).
    k2 = min(8, N * K)
    negk, idxk = jax.lax.top_k(-dist, k2)
    dk = -negk  # (Kq, k2) ascending distances
    node_k = (idxk // K).astype(jnp.int32)
    d1 = dk[:, 0]
    nn_node = node_k[:, 0]
    other = node_k != nn_node[:, None]
    d2 = jnp.min(jnp.where(other, dk, big), axis=1)
    ok = (d1 < ratio * d2) & (d1 < big * 0.5) & kp.valid
    counts = jnp.zeros(N, jnp.int32).at[nn_node].add(
        jnp.where(ok, 1, 0), mode="drop"
    )
    return counts


@functools.partial(jax.jit, static_argnames=("ratio", "exclude_window"))
def global_match_scores_from_store(
    store: NodeStore,
    query_id: jnp.ndarray,  # () int32 — node whose descriptors are the query
    n_nodes: jnp.ndarray,  # () int32
    ratio: float = 0.8,
    exclude_window: int = 8,
) -> jnp.ndarray:
    """global_match_scores with the query gathered FROM the store: lets the
    pipelined path retrieve loop candidates for node i entirely on device
    right after i's commit (one dispatch, async-pulled, consumed as extra
    candidates at frame i+1 — the zero-sync deferred-retrieval design).

    Nodes within ``exclude_window`` of the query are masked out: they are
    sequential neighbors, not loop closures (and would be classified
    EDGE_SEQUENTIAL anyway)."""
    N = store.capacity
    ids = jnp.arange(N, dtype=jnp.int32)
    active = ids < n_nodes
    excl = jnp.abs(ids - query_id) <= exclude_window
    q_desc = store.desc[query_id]  # dtype already matches the store's family
    q_valid = store.kp_valid[query_id]
    kp_like = Keypoints(
        uv=store.uv[query_id],
        xyz=store.xyz[query_id],
        score=jnp.zeros(q_valid.shape, jnp.float32),
        theta=jnp.zeros(q_valid.shape, jnp.float32),
        desc=q_desc,
        valid=q_valid,
        level=jnp.zeros(q_valid.shape, jnp.int32),
    )
    return global_match_scores(kp_like, store, active, excl, ratio)


def retrieve_loop_candidates(
    kp: Keypoints,
    store: NodeStore,
    n_nodes: int,
    exclude_ids,
    top_n: int = 4,
    min_votes: int = 10,
    ratio: float = 0.8,
):
    """Host wrapper: best-scoring node ids (most matched features first)."""
    import numpy as np

    N = store.capacity
    active = np.zeros(N, bool)
    active[:n_nodes] = True
    excl = np.zeros(N, bool)
    for i in exclude_ids:
        if 0 <= i < N:
            excl[i] = True
    counts = np.asarray(
        global_match_scores(
            kp, store, jnp.asarray(active), jnp.asarray(excl), ratio
        )
    )
    order = np.argsort(-counts)
    return [int(i) for i in order[:top_n] if counts[i] >= min_votes]
