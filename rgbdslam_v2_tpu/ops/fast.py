"""Dense FAST-9/16 corner detection — fully vectorized, no per-pixel branching.

Capability parity: the reference's ORB/FAST detectors with dynamic threshold
adjustment and grid spreading (reference: src/features.cpp:63-113,
src/feature_adjuster.cpp:131-328). TPU re-design: the segment test runs as
16 shifted-image comparisons + circular run-length test over the whole frame
at once (VPU elementwise; XLA fuses the whole thing), scored with Harris, and
the "adjuster" capability (target keypoint count) is replaced by exact global
top-k over scores — on TPU we can afford to *always* take exactly the best K,
which is what the adjuster was approximating.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .image import harris_response, maxpool2d_same

# Bresenham circle of radius 3 (the FAST-16 ring), (dy, dx), clockwise.
_RING = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3),
        (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3),
        (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)


def fast_score(img: jnp.ndarray, threshold: float = 0.08, arc: int = 9):
    """FAST segment test over the whole image.

    img: (H, W) float32 in [0, 1]. threshold in intensity units (the classic
    t=20/255 ≈ 0.08). Returns (corner_mask (H, W) bool, sad_score (H, W)).
    sad_score is the classic FAST score: sum of |I_ring - I_p| - t over the
    qualifying arc's pixels (max of bright/dark variants).

    The circular run-length >= 9 test uses log-doubling over rolled masks
    (~6 fused VPU ops instead of the naive 16x9 AND tree).
    """
    center = img
    H, W = img.shape
    pad = 3
    p = jnp.pad(img, ((pad, pad), (pad, pad)), mode="edge")
    ring = jnp.stack(
        [p[pad + dy : pad + dy + H, pad + dx : pad + dx + W] for dy, dx in _RING]
    )  # (16, H, W)
    bright = ring > center[None] + threshold
    dark = ring < center[None] - threshold

    def has_arc(mask):
        # runs >= 9 via doubling: r2[i]=m[i..i+1], r4=m[i..i+3], r8=m[i..i+7],
        # r9[i] = r8[i] & m[i+8]; circular roll wraps the ring.
        r2 = mask & jnp.roll(mask, -1, axis=0)
        r4 = r2 & jnp.roll(r2, -2, axis=0)
        r8 = r4 & jnp.roll(r4, -4, axis=0)
        r9 = r8 & jnp.roll(mask, -8, axis=0)
        return jnp.any(r9, axis=0)

    corner = has_arc(bright) | has_arc(dark)

    diff = ring - center[None]
    sad_bright = jnp.sum(jnp.where(bright, diff - threshold, 0.0), axis=0)
    sad_dark = jnp.sum(jnp.where(dark, -diff - threshold, 0.0), axis=0)
    score = jnp.maximum(sad_bright, sad_dark)
    return corner, score


def detect_corners(
    img: jnp.ndarray,
    threshold: float = 0.08,
    use_harris: bool = True,
    border: int = 16,
):
    """Dense detection: FAST mask + (Harris or SAD) score + 3x3 NMS.

    Returns score map (H, W) with -inf at non-corners / NMS losers / borders.
    """
    corner, sad = fast_score(img, threshold)
    score = harris_response(img) if use_harris else sad
    neg = jnp.float32(-jnp.inf)
    masked = jnp.where(corner, score, neg)
    # 3x3 non-max suppression on the masked score.
    is_max = masked >= maxpool2d_same(masked, 3)
    out = jnp.where(corner & is_max, score, neg)
    H, W = img.shape
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    in_border = (yy >= border) & (yy < H - border) & (xx >= border) & (xx < W - border)
    return jnp.where(in_border, out, neg)


def select_keypoints_grid(
    score_map: jnp.ndarray,
    max_keypoints: int,
    grid: int = 4,
    per_cell_factor: float = 2.0,
    approx: bool = False,
):
    """Spread keypoints: per-cell top-k, then global top-k (static shapes).

    Mirrors the VideoGridAdaptedFeatureDetector capability
    (reference: src/feature_adjuster.cpp:286+). Returns (uv (K, 2) float32
    [x, y], score (K,), valid (K,) bool).

    approx=True selects the per-cell candidates with lax.approx_max_k:
    on TPU, exact top_k lowers to a FULL variadic sort of the whole score
    map (f32+s32, ~770k sorted elements/frame over 4 pyramid levels at
    VGA) while approx_max_k uses the hardware binned-reduction path at
    ~0.95 recall — a near-tied corner occasionally swaps for the next-best
    one, which is immaterial for a threshold-heuristic detector (the
    reference's adjuster doesn't even keep a deterministic order). Exact
    on CPU (approx_max_k falls back to top_k off-TPU)."""
    H, W = score_map.shape
    K = max_keypoints
    topk = jax.lax.approx_max_k if approx else jax.lax.top_k
    if grid <= 1:
        flat = score_map.reshape(-1)
        val, idx = topk(flat, K)
        uv = jnp.stack([(idx % W).astype(jnp.float32), (idx // W).astype(jnp.float32)], -1)
        return uv, val, jnp.isfinite(val)
    # Pad to a multiple of the grid.
    gh = -(-H // grid) * grid
    gw = -(-W // grid) * grid
    neg = jnp.float32(-jnp.inf)
    pad = jnp.pad(score_map, ((0, gh - H), (0, gw - W)), constant_values=neg)
    ch, cw = gh // grid, gw // grid
    cells = pad.reshape(grid, ch, grid, cw).transpose(0, 2, 1, 3).reshape(grid * grid, ch * cw)
    k_cell = min(ch * cw, max(1, int(per_cell_factor * K / (grid * grid))))
    cval, cidx = topk(cells, k_cell)  # (G*G, k_cell)
    # Recover absolute coordinates.
    gidx = jnp.arange(grid * grid)
    gy = (gidx // grid)[:, None]
    gx = (gidx % grid)[:, None]
    y = gy * ch + cidx // cw
    x = gx * cw + cidx % cw
    flat_val = cval.reshape(-1)
    flat_x = x.reshape(-1)
    flat_y = y.reshape(-1)
    val, sel = jax.lax.top_k(flat_val, K)
    uv = jnp.stack(
        [flat_x[sel].astype(jnp.float32), flat_y[sel].astype(jnp.float32)], axis=-1
    )
    return uv, val, jnp.isfinite(val)
