"""Stereo disparity -> depth: on-device block matching.

Capability parity: the reference's stereo input modality
(stereoCallback, reference: src/openni_listener.cpp:559-598) consumes a
point cloud computed by ROS ``stereo_image_proc`` (block-matching
disparity) plus the left visual image. We own that front-end here: a
rectified pair goes through zero-mean SAD block matching with
winner-take-all, subpixel parabola refinement, and a left-right
consistency check, producing the same organized (depth, valid) grid every
other input modality feeds into the single compiled SLAM program.

TPU re-design: the (H, W, D) cost volume is D shifted elementwise
absolute differences box-filtered with reduce_window — no data-dependent
loops, everything static-shaped; the LR check reuses the SAME volume via
the identity cost_R(x, d) = cost_L(x + d, d) (one gather along x), so the
right image is never matched separately.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _box(img: jnp.ndarray, block: int) -> jnp.ndarray:
    """(..., H, W) box-sum over block x block windows, same padding."""
    return jax.lax.reduce_window(
        img, 0.0, jax.lax.add, (block, block), (1, 1),
        [(block // 2, block // 2)] * 2,
    )


@functools.partial(jax.jit, static_argnames=("max_disp", "block"))
def disparity_block_matching(
    left: jnp.ndarray,  # (H, W) float32 rectified left gray
    right: jnp.ndarray,  # (H, W) float32 rectified right gray
    max_disp: int = 64,
    block: int = 9,
):
    """Rectified stereo -> (disparity (H, W) f32, valid (H, W) bool).

    Zero-mean SAD (local-mean subtraction makes matching exposure-
    invariant), WTA argmin over the volume, subpixel parabola fit, and an
    LR consistency gate (|dL(x) - dR(x - dL)| <= 1) that kills occlusions
    and low-texture mismatches.
    """
    H, W = left.shape
    area = float(block * block)
    lz = left - _box(left, block) / area
    rz = right - _box(right, block) / area

    # cost(x, d) = boxsum |lz(x) - rz(x - d)|; out-of-frame shifts get a
    # huge cost so WTA never picks them
    costs = []
    for d in range(max_disp):
        if d == 0:
            diff = jnp.abs(lz - rz)
        else:
            shifted = jnp.pad(rz, ((0, 0), (d, 0)))[:, :W]
            diff = jnp.abs(lz - shifted)
            diff = diff.at[:, :d].set(1e3)
        costs.append(_box(diff, block))
    vol = jnp.stack(costs, axis=-1)  # (H, W, D)

    d0 = jnp.argmin(vol, axis=-1)  # (H, W) int
    c0 = jnp.take_along_axis(vol, d0[..., None], axis=-1)[..., 0]
    # subpixel: parabola through (d0-1, d0, d0+1)
    dm = jnp.clip(d0 - 1, 0, max_disp - 1)
    dp = jnp.clip(d0 + 1, 0, max_disp - 1)
    cm = jnp.take_along_axis(vol, dm[..., None], axis=-1)[..., 0]
    cp = jnp.take_along_axis(vol, dp[..., None], axis=-1)[..., 0]
    denom = cm - 2.0 * c0 + cp
    delta = jnp.where(
        jnp.abs(denom) > 1e-6, 0.5 * (cm - cp) / jnp.maximum(denom, 1e-6), 0.0
    )
    disp = d0.astype(jnp.float32) + jnp.clip(delta, -0.5, 0.5)

    # right-view WTA from the same volume: cost_R(x, d) = cost_L(x + d, d)
    xs = jnp.arange(W)[None, :, None]  # (1, W, 1)
    ds = jnp.arange(max_disp)[None, None, :]
    xl = jnp.clip(xs + ds, 0, W - 1)  # (1, W, D)
    vol_r = jnp.take_along_axis(vol, jnp.broadcast_to(xl, vol.shape), axis=1)
    d0_r = jnp.argmin(vol_r, axis=-1)  # (H, W) right disparity
    # LR check: look up dR at x - dL
    xr = jnp.clip(jnp.arange(W)[None, :] - d0, 0, W - 1)
    d_back = jnp.take_along_axis(d0_r, xr, axis=1)
    lr_ok = jnp.abs(d0 - d_back) <= 1

    # texture/uniqueness: WTA cost must beat the volume mean decisively
    mean_c = jnp.mean(vol, axis=-1)
    distinct = c0 < 0.75 * mean_c
    valid = (
        lr_ok
        & distinct
        & (d0 > 0)
        & (d0 < max_disp - 1)
        & (jnp.arange(W)[None, :] >= max_disp)  # left border: no candidates
    )
    return disp, valid


@functools.partial(jax.jit, static_argnames=("max_disp", "block"))
def stereo_depth(
    left: jnp.ndarray,
    right: jnp.ndarray,
    fx: float,
    baseline: float,
    max_disp: int = 64,
    block: int = 9,
):
    """Rectified stereo pair -> (depth (H, W) f32 meters, valid bool).

    depth = fx * baseline / disparity (the pinhole stereo relation
    stereo_image_proc applies upstream of the reference's stereoCallback).
    Invalid pixels carry depth 0 — the convention every other input
    modality uses (frames.make_frame treats depth <= 0 as missing).
    """
    disp, valid = disparity_block_matching(left, right, max_disp, block)
    depth = fx * baseline / jnp.maximum(disp, 0.5)
    depth = jnp.where(valid & (disp > 0.5), depth, 0.0)
    return depth, valid
