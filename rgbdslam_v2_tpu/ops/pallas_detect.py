"""Pallas TPU kernel: fused FAST-9/16 + Harris + 3x3 NMS corner scoring.

The XLA version (ops/fast.py + ops/image.py) materializes the 16 ring
comparisons, Sobel products, and three blur passes as separate HBM-level
tensors; this kernel streams row tiles through VMEM once and performs the
whole dense frontend scoring — segment test, Harris response, non-max
suppression, border mask — on-chip (VPU), writing only the final score map.

Tiling: grid over row bands; each program DMAs a (TILE + 2*HALO, W) slice of
the edge-padded image from HBM into VMEM scratch (overlapping halos can't be
expressed with plain BlockSpec index maps), computes, and writes its
(TILE, W) output band. See /opt/skills/guides/pallas_guide.md patterns.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import _RING

HALO = 8  # covers FAST radius 3 + sobel 1 + harris blur 2 + NMS 1 (sum 7)
TILE = 56  # rows per band (VMEM budget: the 16-way ring stack dominates)


from .image import gaussian_kernel_1d

_G5 = gaussian_kernel_1d(1.5, 2)  # matches ops.image.harris_response smoothing


def _blur5_valid(x):
    """Separable 5-tap Gaussian, 'valid' (shrinks by 4 in each dim)."""
    H, W = x.shape
    r = sum(float(w) * x[k : k + H - 4, :] for k, w in enumerate(_G5))
    return sum(float(w) * r[:, k : k + W - 4] for k, w in enumerate(_G5))


def _kernel(img_hbm, out_ref, scratch, sem, *, W, threshold, harris_k, border,
            n_rows_total):
    i = pl.program_id(0)
    copy = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * TILE, TILE + 2 * HALO), :],
        scratch,
        sem,
    )
    copy.start()
    copy.wait()
    buf = scratch[:]  # (TILE + 2*HALO, W + 2*HALO)

    # Work on a (TILE+2, W+2) view (1-px ring kept for the final NMS).
    Hc, Wc = TILE + 2, W + 2

    def view(dy, dx, extra=0):
        a = HALO - 1 + dy - extra
        b = HALO - 1 + dx - extra
        return buf[a : a + Hc + 2 * extra, b : b + Wc + 2 * extra]

    center = view(0, 0)

    # ---- FAST segment test (log-doubling over the 16-point ring) ----------
    ring = jnp.stack([view(int(dy), int(dx)) for dy, dx in _RING])
    bright = ring > center[None] + threshold
    dark = ring < center[None] - threshold

    def has_arc(m):
        r2 = m & jnp.roll(m, -1, axis=0)
        r4 = r2 & jnp.roll(r2, -2, axis=0)
        r8 = r4 & jnp.roll(r4, -4, axis=0)
        r9 = r8 & jnp.roll(m, -8, axis=0)
        return jnp.any(r9, axis=0)

    corner = has_arc(bright) | has_arc(dark)

    # ---- Harris response (gradients on a +2 ring; 5-tap blur shrinks back,
    # matching ops.image.harris_response exactly) ----------------------------
    E = 2
    gx = (
        view(-1, 1, E) + 2 * view(0, 1, E) + view(1, 1, E)
        - view(-1, -1, E) - 2 * view(0, -1, E) - view(1, -1, E)
    )
    gy = (
        view(1, -1, E) + 2 * view(1, 0, E) + view(1, 1, E)
        - view(-1, -1, E) - 2 * view(-1, 0, E) - view(-1, 1, E)
    )
    Ixx = _blur5_valid(gx * gx)
    Iyy = _blur5_valid(gy * gy)
    Ixy = _blur5_valid(gx * gy)
    det = Ixx * Iyy - Ixy * Ixy
    tr = Ixx + Iyy
    harris = det - harris_k * tr * tr

    neg = jnp.float32(-jnp.inf)
    masked = jnp.where(corner, harris, neg)
    # ---- 3x3 NMS: the (TILE+2, W+2) masked map's 1-px ring IS the halo -----
    center = masked[1:-1, 1:-1]  # (TILE, W)
    nbr = center
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            if dy != 1 or dx != 1:
                nbr = jnp.maximum(nbr, masked[dy : dy + TILE, dx : dx + W])
    keep = center >= nbr
    score = jnp.where(keep & corner[1:-1, 1:-1], harris[1:-1, 1:-1], neg)

    # ---- border mask (absolute image coordinates) ---------------------------
    row0 = i * TILE
    yy = jax.lax.broadcasted_iota(jnp.int32, (TILE, W), 0) + row0
    xx = jax.lax.broadcasted_iota(jnp.int32, (TILE, W), 1)
    inb = (
        (yy >= border) & (yy < n_rows_total - border)
        & (xx >= border) & (xx < W - border)
    )
    out_ref[:] = jnp.where(inb, score, neg)


@functools.partial(
    jax.jit, static_argnames=("threshold", "harris_k", "border", "interpret")
)
def detect_corners_pallas(
    img: jnp.ndarray,
    threshold: float = 0.08,
    harris_k: float = 0.04,
    border: int = 16,
    interpret: bool = False,
):
    """Drop-in fused replacement for ops.fast.detect_corners (Harris ranking).

    img: (H, W) float32 with H divisible by TILE (480 ok). Returns the
    masked score map (H, W) with -inf at non-corners.
    """
    H, W = img.shape
    if H % TILE != 0:
        pad_rows = (-H) % TILE
        img = jnp.pad(img, ((0, pad_rows), (0, 0)), mode="edge")
    Hp = img.shape[0]
    # DMA slices must be lane-aligned (128) in the last dim: round the padded
    # width up to a multiple of 128 (left pad = HALO; extra on the right).
    Wt = -(-(W + 2 * HALO) // 128) * 128
    padded = jnp.pad(
        img, ((HALO, HALO), (HALO, Wt - W - HALO)), mode="edge"
    )
    n_tiles = Hp // TILE
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            W=W,
            threshold=threshold,
            harris_k=harris_k,
            border=border,
            n_rows_total=H,
        ),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TILE + 2 * HALO, Wt), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)
    return out[:H]
