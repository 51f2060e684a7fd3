"""BRISK binary descriptors, MXU-resident.

Capability parity: the reference's BRISK extractor family
(reference: src/features.cpp:135-160 createDescriptorExtractor, case
"BRISK") — concentric-ring sampling with per-ring Gaussian smoothing,
gradient-based orientation from long-distance pairs, and a 512-bit
descriptor from short-distance intensity comparisons (Leutenegger et al.,
ICCV 2011).

TPU re-design (same shape as ops/orb.py's binned BRIEF): each Gaussian-
smoothed ring sample is a fixed footprint over the 32x32 keypoint patch, so
evaluating ALL 60 samples for ALL 30 orientation bins is ONE
(K,1024) @ (1024, 30*60) matmul. Orientation is two dot products with
precomputed long-pair gradient coefficient vectors (linear in the bin-0
samples), and the 512 short-pair comparisons are an elementwise gather on
the selected (K, 60) sample row. No per-sample image gathers anywhere.

As with our BRIEF (ops/orb.py), we match our own descriptors against our
own: OpenCV bit-compatibility is not a goal, the capability — a smoothed
ring-pattern binary descriptor family distinct from BRIEF's random point
pairs — is.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

PATCH = 32
_PC = 15.0  # patch center (matches ops/orb.py extract_patches)
N_ORIENT_BINS = 30
BRISK_BITS = 512
N_LONG = 400

# ---- concentric ring pattern: 60 points, per-ring smoothing sigma ----
_RING_R = [0.0, 3.2, 5.6, 8.4, 11.8]
_RING_N = [1, 10, 14, 15, 20]


def _build_pattern():
    pts, sig = [], []
    for r, n in zip(_RING_R, _RING_N):
        if n == 1:
            pts.append((0.0, 0.0))
            sig.append(0.7)
            continue
        spacing = 2.0 * np.pi * r / n
        s = max(0.7, 0.45 * spacing)
        for k in range(n):
            a = 2.0 * np.pi * k / n + (0.5 * np.pi * r)  # stagger rings
            pts.append((r * np.cos(a), r * np.sin(a)))
            sig.append(s)
    return np.asarray(pts, np.float32), np.asarray(sig, np.float32)


PATTERN_XY, PATTERN_SIGMA = _build_pattern()
N_SAMPLES = PATTERN_XY.shape[0]
assert N_SAMPLES == 60

# ---- pair sets: shortest 512 pairs -> descriptor bits; longest 400 ->
# orientation gradient (the paper's delta_max / delta_min split realized as
# deterministic rank thresholds on the same pattern) ----
_ii, _jj = np.triu_indices(N_SAMPLES, k=1)
_pair_d = np.linalg.norm(PATTERN_XY[_ii] - PATTERN_XY[_jj], axis=1)
_order = np.argsort(_pair_d, kind="stable")
SHORT_I = _ii[_order[:BRISK_BITS]].astype(np.int32)
SHORT_J = _jj[_order[:BRISK_BITS]].astype(np.int32)
_long_sel = _order[-N_LONG:]


def _build_grad_coeffs():
    """(60,) x2 coefficient vectors: g = sum_long (v_j - v_i) * d_ij / |d|^2
    is linear in the sample values v."""
    cgx = np.zeros(N_SAMPLES, np.float32)
    cgy = np.zeros(N_SAMPLES, np.float32)
    for p in _long_sel:
        i, j = _ii[p], _jj[p]
        d = PATTERN_XY[j] - PATTERN_XY[i]
        d2 = float(d @ d)
        cgx[j] += d[0] / d2
        cgx[i] -= d[0] / d2
        cgy[j] += d[1] / d2
        cgy[i] -= d[1] / d2
    return cgx / N_LONG, cgy / N_LONG


GRAD_CX, GRAD_CY = _build_grad_coeffs()


def _build_footprints() -> np.ndarray:
    """(1024, 30*60) matrix: column (b, k) is the normalized Gaussian
    footprint of pattern point k rotated by bin angle b, over the 32x32
    patch — patch_flat @ F yields every smoothed sample for every bin."""
    yy, xx = np.mgrid[0:PATCH, 0:PATCH].astype(np.float32)
    F = np.zeros((PATCH * PATCH, N_ORIENT_BINS, N_SAMPLES), np.float32)
    for b in range(N_ORIENT_BINS):
        th = 2.0 * np.pi * b / N_ORIENT_BINS
        c, s = np.cos(th), np.sin(th)
        rx = c * PATTERN_XY[:, 0] - s * PATTERN_XY[:, 1] + _PC
        ry = s * PATTERN_XY[:, 0] + c * PATTERN_XY[:, 1] + _PC
        # (P, 60) squared distances from every patch pixel to every sample
        d2 = (xx.reshape(-1, 1) - rx[None, :]) ** 2 + (
            yy.reshape(-1, 1) - ry[None, :]
        ) ** 2
        g = np.exp(-d2 / (2.0 * PATTERN_SIGMA[None, :] ** 2))
        g /= np.maximum(g.sum(axis=0, keepdims=True), 1e-9)  # renormalize clip
        F[:, b, :] = g
    return F.reshape(PATCH * PATCH, N_ORIENT_BINS * N_SAMPLES)


FOOTPRINTS = _build_footprints()


def describe_patches_brisk(patches: jnp.ndarray, oriented: bool = True):
    """(K, 32, 32) RAW (unblurred) patches -> (theta (K,), desc (K, 512) ±1).

    The pattern applies its own per-ring Gaussian smoothing via the
    footprints, so patches must come from the unsmoothed level image."""
    K = patches.shape[0]
    flat = patches.reshape(K, PATCH * PATCH)
    vals = (flat @ jnp.asarray(FOOTPRINTS)).reshape(
        K, N_ORIENT_BINS, N_SAMPLES
    )
    v0 = vals[:, 0, :]  # unrotated samples drive orientation
    gx = v0 @ jnp.asarray(GRAD_CX)
    gy = v0 @ jnp.asarray(GRAD_CY)
    theta = jnp.arctan2(gy, gx)
    if not oriented:
        theta = jnp.zeros_like(theta)
    step = 2.0 * np.pi / N_ORIENT_BINS
    bins = jnp.mod(jnp.round(theta / step).astype(jnp.int32), N_ORIENT_BINS)
    onehot = jax.nn.one_hot(bins, N_ORIENT_BINS, dtype=vals.dtype)
    sel = jnp.einsum("kbs,kb->ks", vals, onehot)  # (K, 60) rotated samples
    bits = sel[:, SHORT_J] > sel[:, SHORT_I]
    desc = jnp.where(bits, jnp.int8(1), jnp.int8(-1))
    return theta, desc
