"""SIFT on TPU: Gaussian scale space, DoG extrema, oriented 128-D descriptors.

Capability parity: the reference's SiftGPU integration — GPU Gaussian
pyramid, DoG extrema detection, orientation assignment, 128-float
descriptors, with RootSIFT post-processing (reference:
src/sift_gpu_wrapper.cpp:29-227 config/detect/match;
node.cpp:1557-1571 squareroot_descriptor_space; external/SiftGPU/*).

TPU re-design: the scale space is a stack of separable convolutions (XLA
fuses them); extrema detection is a dense 3x3x3 window test over the whole
(scale, y, x) volume; per-keypoint orientation histograms and 4x4x8
descriptors are batched gathers + segment-sums over a fixed keypoint budget.
No recursive pyramids, no per-keypoint loops — one compiled graph.

Descriptors are float32; matching uses the L2 matmul path
(ops/matching.descriptor_distances).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .image import bilinear_sample, gaussian_blur, maxpool2d_same, resize_bilinear

N_SPATIAL = 4  # descriptor grid (4x4)
N_ORI = 8  # orientation bins per cell
DESC_DIM = N_SPATIAL * N_SPATIAL * N_ORI  # 128
N_HIST = 36  # orientation-assignment histogram bins


def scale_space(img: jnp.ndarray, n_scales: int = 3, sigma0: float = 1.6):
    """One octave's Gaussian stack: (n_scales + 3, H, W) and its sigmas."""
    k = 2.0 ** (1.0 / n_scales)
    sigmas = [sigma0 * (k**i) for i in range(n_scales + 3)]
    gs = [gaussian_blur(img, sigmas[0])]
    for i in range(1, n_scales + 3):
        # incremental blur: sigma_inc^2 = s_i^2 - s_{i-1}^2
        inc = math.sqrt(max(sigmas[i] ** 2 - sigmas[i - 1] ** 2, 1e-6))
        gs.append(gaussian_blur(gs[-1], inc))
    return jnp.stack(gs), np.asarray(sigmas, np.float32)


def dog_extrema(dogs: jnp.ndarray, contrast_threshold: float = 0.015,
                edge_ratio: float = 10.0, border: int = 8):
    """Dense extrema over the DoG volume (S, H, W) -> score map (S-2, H, W).

    Score = |DoG| at 3x3x3 extrema that pass contrast + edge tests; -inf
    elsewhere. The edge test uses the 2x2 spatial Hessian trace/det ratio.
    """
    S, H, W = dogs.shape

    # 3x3 spatial max/min per scale.
    sp_max = jnp.stack([maxpool2d_same(dogs[s], 3) for s in range(S)])
    sp_min = jnp.stack([-maxpool2d_same(-dogs[s], 3) for s in range(S)])
    center = dogs[1:-1]
    is_max = (
        (center >= sp_max[1:-1])
        & (center >= sp_max[:-2])
        & (center >= sp_max[2:])
    )
    is_min = (
        (center <= sp_min[1:-1])
        & (center <= sp_min[:-2])
        & (center <= sp_min[2:])
    )
    extremum = (is_max | is_min) & (jnp.abs(center) > contrast_threshold)

    # Edge rejection: 2x2 Hessian of the center scale.
    def hessian_ok(d):
        dxx = jnp.roll(d, -1, 1) + jnp.roll(d, 1, 1) - 2 * d
        dyy = jnp.roll(d, -1, 0) + jnp.roll(d, 1, 0) - 2 * d
        dxy = 0.25 * (
            jnp.roll(jnp.roll(d, -1, 0), -1, 1)
            + jnp.roll(jnp.roll(d, 1, 0), 1, 1)
            - jnp.roll(jnp.roll(d, -1, 0), 1, 1)
            - jnp.roll(jnp.roll(d, 1, 0), -1, 1)
        )
        tr = dxx + dyy
        det = dxx * dyy - dxy * dxy
        r = edge_ratio
        return (det > 0) & (tr * tr * r < (r + 1.0) ** 2 * det)

    edge_ok = jnp.stack([hessian_ok(center[s]) for s in range(S - 2)])
    score = jnp.where(extremum & edge_ok, jnp.abs(center), -jnp.inf)

    yy = jnp.arange(H)[None, :, None]
    xx = jnp.arange(W)[None, None, :]
    inb = (yy >= border) & (yy < H - border) & (xx >= border) & (xx < W - border)
    return jnp.where(inb, score, -jnp.inf)


def gradients(img: jnp.ndarray):
    """Central-difference gradient magnitude and angle."""
    dx = 0.5 * (jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1))
    dy = 0.5 * (jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0))
    mag = jnp.sqrt(dx * dx + dy * dy + 1e-12)
    ang = jnp.arctan2(dy, dx)
    return mag, ang


def keypoint_orientation_sift(mag, ang, uv, sigma):
    """Dominant gradient orientation per keypoint (36-bin histogram peak).

    mag/ang: (H, W) of the keypoint's scale image; uv: (K, 2); sigma: scalar
    window sigma (1.5 * scale).
    """
    R = 8  # window radius in pixels at this scale
    oy, ox = np.mgrid[-R : R + 1, -R : R + 1]
    w_gauss = np.exp(-(ox**2 + oy**2) / (2.0 * (1.5 * sigma) ** 2)).astype(np.float32)
    offs = np.stack([ox.ravel(), oy.ravel()], -1).astype(np.float32)  # (P, 2)
    wg = jnp.asarray(w_gauss.ravel())
    x = uv[:, 0:1] + offs[None, :, 0]
    y = uv[:, 1:2] + offs[None, :, 1]
    m = bilinear_sample(mag, x, y) * wg[None, :]
    a = bilinear_sample(ang, x, y)
    bin_f = (a + np.pi) * (N_HIST / (2 * np.pi))
    b0 = jnp.floor(bin_f).astype(jnp.int32) % N_HIST
    b1 = (b0 + 1) % N_HIST
    f = bin_f - jnp.floor(bin_f)
    K = uv.shape[0]
    hist = jnp.zeros((K, N_HIST))
    kidx = jnp.broadcast_to(jnp.arange(K)[:, None], b0.shape)
    hist = hist.at[kidx, b0].add(m * (1 - f))
    hist = hist.at[kidx, b1].add(m * f)
    # smooth the circular histogram twice
    for _ in range(2):
        hist = (jnp.roll(hist, 1, -1) + hist + jnp.roll(hist, -1, -1)) / 3.0
    peak = jnp.argmax(hist, axis=-1)
    # parabolic peak interpolation
    hp = jnp.take_along_axis(hist, ((peak + 1) % N_HIST)[:, None], -1)[:, 0]
    hm = jnp.take_along_axis(hist, ((peak - 1) % N_HIST)[:, None], -1)[:, 0]
    h0 = jnp.take_along_axis(hist, peak[:, None], -1)[:, 0]
    denom = hm - 2 * h0 + hp
    delta = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (hm - hp) / denom, 0.0)
    theta = (peak.astype(jnp.float32) + delta + 0.5) * (2 * np.pi / N_HIST) - np.pi
    return theta


def sift_descriptors(mag, ang, uv, theta, scale: float):
    """4x4x8 gradient-histogram descriptors, (K, 128) float32, normalized.

    Samples a 16x16 grid rotated by theta, spaced `scale` * 0.75 pixels,
    Gaussian-weighted, soft orientation binning, hard spatial binning
    (each 4x4 sample block -> one cell; the sampling density makes the
    difference from trilinear interpolation minor).
    """
    G = 4 * N_SPATIAL  # 16 samples per side
    step = 0.75 * scale
    gy, gx = np.mgrid[0:G, 0:G]
    gx = (gx - (G - 1) / 2.0) * step
    gy = (gy - (G - 1) / 2.0) * step
    cell = (np.mgrid[0:G, 0:G][0] // 4) * N_SPATIAL + np.mgrid[0:G, 0:G][1] // 4
    w_gauss = np.exp(-(gx**2 + gy**2) / (2.0 * (0.5 * G * step) ** 2)).astype(
        np.float32
    )
    offs_x = jnp.asarray(gx.ravel(), jnp.float32)
    offs_y = jnp.asarray(gy.ravel(), jnp.float32)
    wg = jnp.asarray(w_gauss.ravel())
    cell_idx = jnp.asarray(cell.ravel(), jnp.int32)  # (P,)

    c = jnp.cos(theta)[:, None]
    s = jnp.sin(theta)[:, None]
    rx = c * offs_x[None, :] - s * offs_y[None, :]
    ry = s * offs_x[None, :] + c * offs_y[None, :]
    x = uv[:, 0:1] + rx
    y = uv[:, 1:2] + ry
    m = bilinear_sample(mag, x, y) * wg[None, :]
    a = bilinear_sample(ang, x, y) - theta[:, None]
    bin_f = (a + 4 * np.pi) * (N_ORI / (2 * np.pi))
    b0 = jnp.floor(bin_f).astype(jnp.int32) % N_ORI
    b1 = (b0 + 1) % N_ORI
    f = bin_f - jnp.floor(bin_f)

    K, P = m.shape
    desc = jnp.zeros((K, N_SPATIAL * N_SPATIAL * N_ORI))
    kidx = jnp.broadcast_to(jnp.arange(K)[:, None], (K, P))
    flat0 = cell_idx[None, :] * N_ORI + b0
    flat1 = cell_idx[None, :] * N_ORI + b1
    desc = desc.at[kidx, flat0].add(m * (1 - f))
    desc = desc.at[kidx, flat1].add(m * f)

    # SIFT normalization: L2, clip 0.2, renormalize.
    desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-9)
    desc = jnp.minimum(desc, 0.2)
    desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-9)
    return desc.astype(jnp.float32)


def root_sift(desc: jnp.ndarray) -> jnp.ndarray:
    """RootSIFT (squareroot_descriptor_space, node.cpp:1557-1571):
    L1-normalize then sqrt — L2 distance then approximates Hellinger."""
    l1 = jnp.sum(jnp.abs(desc), axis=-1, keepdims=True) + 1e-9
    return jnp.sqrt(desc / l1)
