"""Descriptor matching as MXU matmuls: Hamming (±1 int8) and L2 (float).

Capability parity: the reference's featureMatching — SiftGPU GPU matcher,
bruteforce Hamming with popcount, FLANN KD-tree/LSH with knn=2 ratio test and
train-index dedup, then keepStrongestMatches(max_matches)
(reference: src/node.cpp:535-690, :520-531; features.cpp:163-182).

TPU re-design: brute-force IS the fast path. For ±1 int8 descriptors,
Hamming(a, b) = (D - a·b) / 2, so the full K x K distance matrix is one int8
matmul on the MXU; top-2 + ratio test + best-per-train dedup are vectorized
reductions. Exact matching (no FLANN approximation) at higher speed.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e9)


class Matches(NamedTuple):
    """Fixed-capacity match set between a query and a train keypoint set.

    src_idx: (M,) int32 index into the query Keypoints.
    dst_idx: (M,) int32 index into the train Keypoints.
    dist:    (M,) float32 descriptor distance.
    valid:   (M,) bool.
    """

    src_idx: jnp.ndarray
    dst_idx: jnp.ndarray
    dist: jnp.ndarray
    valid: jnp.ndarray

    def count(self):
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)


def descriptor_distances(
    desc_a: jnp.ndarray, desc_b: jnp.ndarray
) -> jnp.ndarray:
    """(Ka, D) x (Kb, D) -> (Ka, Kb) distances.

    int8 ±1 descriptors -> Hamming; float descriptors -> squared L2.
    The big matmul runs in fast (default) precision on the MXU by design —
    distances tolerate low precision; geometry does not.
    """
    if desc_a.dtype == jnp.int8:
        D = desc_a.shape[-1]
        dot = jax.lax.dot_general(
            desc_a,
            desc_b,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (D - dot).astype(jnp.float32) * 0.5
    a2 = jnp.sum(desc_a * desc_a, axis=-1, keepdims=True)
    b2 = jnp.sum(desc_b * desc_b, axis=-1)
    ab = jax.lax.dot_general(
        desc_a,
        desc_b,
        (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )
    return jnp.maximum(a2 + b2[None, :] - 2.0 * ab, 0.0)


def match_descriptors(
    desc_a: jnp.ndarray,
    valid_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_b: jnp.ndarray,
    max_matches: int,
    ratio: float = 0.95,
) -> Matches:
    """knn=2 ratio-test matching with best-per-train dedup, strongest-M kept."""
    max_matches = min(max_matches, desc_a.shape[0])
    dist = descriptor_distances(desc_a, desc_b)  # (Ka, Kb)
    dist = jnp.where(valid_a[:, None] & valid_b[None, :], dist, _BIG)
    # top-2 nearest train per query as two masked min-reductions: top_k(k=2)
    # lowers to a FULL variadic sort of the (Ka, Kb) matrix on TPU (~0.8 ms
    # for 8x600x600 in the candidate batch); two passes over the matrix are
    # pure VPU reductions at memory speed.
    d1 = jnp.min(dist, axis=-1)
    nn = jnp.argmin(dist, axis=-1).astype(jnp.int32)
    cols = jnp.arange(dist.shape[-1], dtype=jnp.int32)
    d2 = jnp.min(
        jnp.where(cols[None, :] == nn[:, None], _BIG, dist), axis=-1
    )
    ok = (d1 < ratio * d2) & (d1 < _BIG * 0.5) & valid_a
    # Best-per-train dedup: a query keeps its match only if it attains the
    # minimum passing distance for that train index.
    Ka, Kb = dist.shape
    passing = jnp.where(ok, d1, _BIG)
    best_for_train = (
        jnp.full((Kb,), _BIG).at[nn].min(passing, mode="drop")
    )
    is_best = passing <= best_for_train[nn]
    # Tie-break exact duplicates by query index: keep the lowest query index.
    first_q_for_train = (
        jnp.full((Kb,), Ka, jnp.int32)
        .at[nn]
        .min(jnp.where(is_best & ok, jnp.arange(Ka, dtype=jnp.int32), Ka), mode="drop")
    )
    keep = ok & is_best & (first_q_for_train[nn] == jnp.arange(Ka))
    # keepStrongestMatches: top-M by ascending distance (static M).
    sel_cost = jnp.where(keep, d1, _BIG)
    top_neg, src_idx = jax.lax.top_k(-sel_cost, max_matches)
    d_sel = -top_neg
    m_valid = d_sel < _BIG * 0.5
    src_idx = src_idx.astype(jnp.int32)
    dst_idx = nn[src_idx].astype(jnp.int32)
    return Matches(
        src_idx=jnp.where(m_valid, src_idx, 0),
        dst_idx=jnp.where(m_valid, dst_idx, 0),
        dist=jnp.where(m_valid, d_sel, 0.0),
        valid=m_valid,
    )
