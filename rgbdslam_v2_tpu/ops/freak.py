"""FREAK binary descriptors, MXU-resident.

Capability parity: the reference's FREAK extractor family
(reference: src/features.cpp:135-160 createDescriptorExtractor, case
"FREAK" — which the reference builds when available, else warns) —
a retinal sampling pattern: overlapping Gaussian receptive fields whose
size grows exponentially toward the periphery, a 512-bit descriptor from
coarse-to-fine field comparisons, and orientation from symmetric
long-range pairs (Alahi, Ortiz, Vandergheynst, CVPR 2012).

TPU re-design (same machinery as ops/brisk.py): every smoothed receptive
field is a fixed Gaussian footprint over the 32x32 keypoint patch, so ALL
43 fields for ALL 30 orientation bins are ONE (K,1024) @ (1024, 30*43)
matmul; orientation is two dot products with precomputed symmetric-pair
gradient coefficient vectors, and the 512 comparisons are an elementwise
gather on the selected (K, 43) row. No per-sample image gathers.

Where OpenCV's FREAK learns its 512 pairs offline (variance +
decorrelation over a training set), this implementation orders the 903
candidate pairs coarse-to-fine deterministically (descending combined
field size — the paper's saccadic cascade structure) and keeps the first
512. As with BRIEF/BRISK we match our own descriptors against our own;
bit-compatibility with OpenCV is a non-goal, the capability — a retinal
coarse-to-fine binary family distinct from BRIEF's random pairs and
BRISK's equal-size rings — is.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

PATCH = 32
_PC = 15.0  # patch center (matches ops/orb.py extract_patches)
N_ORIENT_BINS = 30
FREAK_BITS = 512

# ---- retinal pattern: center + 7 rings x 6 fields; radius and sigma
# shrink geometrically toward the fovea (overlapping periphery) ----
_N_RINGS = 7
_R_OUT, _R_IN = 13.0, 1.5
_RING_R = [0.0] + [
    _R_OUT * (_R_IN / _R_OUT) ** (k / (_N_RINGS - 1))
    for k in range(_N_RINGS)
][::-1]  # inner->outer after the center


def _build_pattern():
    pts, sig, ring, ang = [], [], [], []
    for k, r in enumerate(_RING_R):
        if r == 0.0:
            pts.append((0.0, 0.0))
            sig.append(0.6)
            ring.append(k)
            ang.append(0.0)
            continue
        s = max(0.6, 0.38 * r)  # field size ~ eccentricity
        for j in range(6):
            a = np.pi / 3.0 * j + (np.pi / 6.0) * (k % 2)  # stagger rings
            pts.append((r * np.cos(a), r * np.sin(a)))
            sig.append(s)
            ring.append(k)
            ang.append(a)
    return (
        np.asarray(pts, np.float32),
        np.asarray(sig, np.float32),
        np.asarray(ring, np.int32),
        np.asarray(ang, np.float32),
    )


PATTERN_XY, PATTERN_SIGMA, _RING_ID, _ANGLE = _build_pattern()
N_FIELDS = PATTERN_XY.shape[0]
assert N_FIELDS == 43

# ---- descriptor pairs: coarse-to-fine cascade (descending combined field
# size, then descending separation), first 512 of the 903 candidates ----
_ii, _jj = np.triu_indices(N_FIELDS, k=1)
_size = PATTERN_SIGMA[_ii] + PATTERN_SIGMA[_jj]
_dist = np.linalg.norm(PATTERN_XY[_ii] - PATTERN_XY[_jj], axis=1)
_order = np.lexsort((-_dist, -_size))  # primary: size desc; tie: dist desc
PAIR_I = _ii[_order[:FREAK_BITS]].astype(np.int32)
PAIR_J = _jj[_order[:FREAK_BITS]].astype(np.int32)


def _build_grad_coeffs():
    """Orientation from symmetric pairs: within-ring diametric opposites
    (3 per ring) plus same-spoke opposites between consecutive staggered
    rings — the paper's G set of symmetric receptive fields. The local
    gradient sum_G (v_j - v_i) * d_ij / |d_ij| is linear in the field
    values v, so it folds into two (43,) coefficient vectors."""
    pairs = []
    for a in range(N_FIELDS):
        for b in range(a + 1, N_FIELDS):
            if _RING_ID[a] != _RING_ID[b] and abs(
                int(_RING_ID[a]) - int(_RING_ID[b])
            ) != 1:
                continue
            if _RING_ID[a] == 0 or _RING_ID[b] == 0:
                continue
            da = (_ANGLE[a] - _ANGLE[b]) % (2.0 * np.pi)
            # within-ring pairs sit exactly opposite; consecutive rings are
            # staggered by pi/6, so the nearest-to-opposite cross-ring pair
            # differs from pi by exactly pi/6 — the tolerance admits both
            # (same-spoke cross-ring pairs would otherwise never match)
            tol = 1e-3 if _RING_ID[a] == _RING_ID[b] else np.pi / 6.0 + 1e-3
            if min(da, 2.0 * np.pi - da) > np.pi - tol:  # ~opposite
                pairs.append((a, b))
    cgx = np.zeros(N_FIELDS, np.float32)
    cgy = np.zeros(N_FIELDS, np.float32)
    for a, b in pairs:
        d = PATTERN_XY[b] - PATTERN_XY[a]
        n = float(np.linalg.norm(d))
        cgx[b] += d[0] / n
        cgx[a] -= d[0] / n
        cgy[b] += d[1] / n
        cgy[a] -= d[1] / n
    return cgx / max(len(pairs), 1), cgy / max(len(pairs), 1)


GRAD_CX, GRAD_CY = _build_grad_coeffs()


def _build_footprints() -> np.ndarray:
    """(1024, 30*43): column (b, k) is the normalized Gaussian footprint of
    retinal field k rotated by bin angle b — patch_flat @ F yields every
    smoothed field value for every orientation bin."""
    yy, xx = np.mgrid[0:PATCH, 0:PATCH].astype(np.float32)
    F = np.zeros((PATCH * PATCH, N_ORIENT_BINS, N_FIELDS), np.float32)
    for b in range(N_ORIENT_BINS):
        th = 2.0 * np.pi * b / N_ORIENT_BINS
        c, s = np.cos(th), np.sin(th)
        rx = c * PATTERN_XY[:, 0] - s * PATTERN_XY[:, 1] + _PC
        ry = s * PATTERN_XY[:, 0] + c * PATTERN_XY[:, 1] + _PC
        d2 = (xx.reshape(-1, 1) - rx[None, :]) ** 2 + (
            yy.reshape(-1, 1) - ry[None, :]
        ) ** 2
        g = np.exp(-d2 / (2.0 * PATTERN_SIGMA[None, :] ** 2))
        g /= np.maximum(g.sum(axis=0, keepdims=True), 1e-9)
        F[:, b, :] = g
    return F.reshape(PATCH * PATCH, N_ORIENT_BINS * N_FIELDS)


FOOTPRINTS = _build_footprints()


def describe_patches_freak(patches: jnp.ndarray, oriented: bool = True):
    """(K, 32, 32) RAW (unblurred) patches -> (theta (K,), desc (K, 512) ±1).

    The retina applies its own per-field Gaussian smoothing via the
    footprints, so patches must come from the unsmoothed level image."""
    K = patches.shape[0]
    flat = patches.reshape(K, PATCH * PATCH)
    vals = (flat @ jnp.asarray(FOOTPRINTS)).reshape(
        K, N_ORIENT_BINS, N_FIELDS
    )
    v0 = vals[:, 0, :]
    gx = v0 @ jnp.asarray(GRAD_CX)
    gy = v0 @ jnp.asarray(GRAD_CY)
    theta = jnp.arctan2(gy, gx)
    if not oriented:
        theta = jnp.zeros_like(theta)
    step = 2.0 * np.pi / N_ORIENT_BINS
    bins = jnp.mod(jnp.round(theta / step).astype(jnp.int32), N_ORIENT_BINS)
    onehot = jax.nn.one_hot(bins, N_ORIENT_BINS, dtype=vals.dtype)
    sel = jnp.einsum("kbs,kb->ks", vals, onehot)  # (K, 43) rotated fields
    bits = sel[:, PAIR_J] > sel[:, PAIR_I]
    desc = jnp.where(bits, jnp.int8(1), jnp.int8(-1))
    return theta, desc
