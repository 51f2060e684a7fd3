"""Multi-scale ORB extractor: the default feature model family.

Capability parity: the reference's ORB detector/extractor with grid
spreading, retainBest(max_keypoints), and depthless-keypoint removal
(reference: src/features.cpp:63-161, src/node.cpp:101-240). TPU re-design:
an N-level image pyramid (factor 1.2 like ORB), dense FAST+Harris per level,
per-level static keypoint budgets merged by global top-k, orientation +
steered BRIEF as batched gathers, and depth validity folded into selection
scores instead of erase loops.

The whole extractor is one jit-compiled function of (gray, depth-derived
inputs) -> Keypoints with static capacity K.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp

from ..core.camera import Intrinsics
from ..ops import fast as fast_ops
from ..ops import orb as orb_ops
from ..ops.image import resize_bilinear
from .types import Keypoints


@dataclasses.dataclass(frozen=True)
class OrbExtractor:
    """Configured ORB pipeline; call with (gray, depth_min, valid_min, cam)."""

    max_keypoints: int = 600
    n_levels: int = 4
    scale_factor: float = 1.2
    fast_threshold: float = 0.06
    grid: int = 4
    use_harris: bool = True
    require_depth: bool = True
    # oriented=False -> plain BRIEF descriptors (the reference's 'BRIEF'
    # extractor family, features.cpp:115-161): no rotation invariance,
    # cheaper matching for small-rotation rigs.
    oriented: bool = True
    # descriptor family: 'brief' (steered BRIEF, 256 bits — ORB's),
    # 'brisk' (smoothed concentric-ring pairs, 512 bits — the reference's
    # BRISK extractor, features.cpp:135-160; see ops/brisk.py), or 'freak'
    # (retinal coarse-to-fine fields, 512 bits; see ops/freak.py).
    descriptor: str = "brief"
    # Fused Pallas detect kernel (FAST+Harris+NMS in one VMEM pass): exact
    # match to the XLA path. Once description moved to the gather-free
    # patch/matmul form the old custom-call fusion penalty disappeared —
    # queued per-extract is 3.9 ms (Pallas) vs 4.1-4.5 ms (XLA) on v5e, so
    # the kernel is now the TPU default (CPU tests run it in interpreter
    # mode only where explicitly exercised; jax.default_backend() gates it).
    use_pallas: bool = True
    # approx_max_k per-cell keypoint selection (see select_keypoints_grid);
    # exact off-TPU, ~0.95-recall hardware path on TPU (tpu_approx_select).
    approx_select: bool = False

    @property
    def desc_bits(self) -> int:
        return 512 if self.descriptor in ("brisk", "freak") else 256

    def level_shapes(self, H: int, W: int) -> Sequence[tuple]:
        out = []
        for l in range(self.n_levels):
            s = self.scale_factor**l
            out.append((max(32, int(round(H / s))), max(32, int(round(W / s)))))
        return out

    def level_budget(self, level: int) -> int:
        # Geometric budget split like ORB: level l gets K * (1/1.2^l) / norm.
        inv = [self.scale_factor**-l for l in range(self.n_levels)]
        norm = sum(inv)
        return max(16, int(math.ceil(self.max_keypoints * inv[level] / norm)))

    def __call__(self, gray: jnp.ndarray, depth_min: jnp.ndarray, cam: Intrinsics) -> Keypoints:
        """Extract keypoints.

        gray: (H, W) float32. depth_min: (H, W) float32 — per-pixel minimum
        depth in a 3x3 neighborhood, +inf where invalid (the reference's
        getMinDepthInNeighborhood semantics, misc.cpp:774-791).
        """
        H, W = gray.shape
        # Fused Pallas detect (FAST+Harris+NMS in one VMEM pass; ~3x the
        # fused-XLA speed) on TPU; the XLA path elsewhere / for SAD scoring.
        pallas_ok = (
            self.use_pallas and self.use_harris and jax.default_backend() == "tpu"
        )
        all_uv, all_score, all_level = [], [], []
        all_theta, all_desc = [], []
        img_l = gray
        for l, (h, w) in enumerate(self.level_shapes(H, W)):
            if l > 0:
                img_l = resize_bilinear(gray, (h, w))
            if pallas_ok:
                from ..ops.pallas_detect import detect_corners_pallas

                score_map = detect_corners_pallas(
                    img_l, threshold=self.fast_threshold
                )
            else:
                score_map = fast_ops.detect_corners(
                    img_l, threshold=self.fast_threshold, use_harris=self.use_harris
                )
            k_l = self.level_budget(l)
            uv, sc, _ = fast_ops.select_keypoints_grid(
                score_map, k_l, grid=self.grid, approx=self.approx_select)
            # Describe on the LEVEL image (classic ORB: scale-correct patch
            # support), via patch-slice + MXU binned tests — no per-sample
            # gathers (ops/orb.py describe_patches / ops/brisk.py).
            if self.descriptor in ("brisk", "freak"):
                # BRISK/FREAK smooth via their own per-field Gaussian
                # footprints: feed RAW level patches, not pre-blurred ones.
                patches = orb_ops.extract_patches(img_l, uv)
                if self.descriptor == "brisk":
                    from ..ops import brisk as brisk_ops

                    theta_l, desc_l = brisk_ops.describe_patches_brisk(
                        patches, self.oriented
                    )
                else:
                    from ..ops import freak as freak_ops

                    theta_l, desc_l = freak_ops.describe_patches_freak(
                        patches, self.oriented
                    )
            else:
                blur_l = orb_ops.gaussian_blur(img_l, 2.0)
                patches = orb_ops.extract_patches(blur_l, uv)
                theta_l, desc_l = orb_ops.describe_patches(
                    patches, self.oriented
                )
            scale = self.scale_factor**l
            all_uv.append(uv * scale)
            all_score.append(sc)
            all_level.append(jnp.full((k_l,), l, jnp.int32))
            all_theta.append(theta_l)
            all_desc.append(desc_l)
        uv = jnp.concatenate(all_uv, 0)
        score = jnp.concatenate(all_score, 0)
        level = jnp.concatenate(all_level, 0)
        theta_all = jnp.concatenate(all_theta, 0)
        desc_all = jnp.concatenate(all_desc, 0)

        # Depth validity at keypoint locations (fold into selection priority).
        xi = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, H - 1)
        z = depth_min[yi, xi]
        has_depth = jnp.isfinite(z) & (z > 0)
        detected = jnp.isfinite(score)
        neg = jnp.float32(-jnp.inf)
        if self.require_depth:
            sel_score = jnp.where(detected & has_depth, score, neg)
        else:
            sel_score = jnp.where(detected, score, neg)

        # Global top-K merge across levels.
        K = self.max_keypoints
        top_score, top_idx = jax.lax.top_k(sel_score, K)
        uv = uv[top_idx]
        level = level[top_idx]
        z = z[top_idx]
        valid = jnp.isfinite(top_score)
        z = jnp.where(valid, z, 0.0)
        theta = theta_all[top_idx]
        desc = desc_all[top_idx]

        # Backproject with intrinsics (subpixel uv).
        x = (uv[:, 0] - cam.cx) * z / cam.fx
        y = (uv[:, 1] - cam.cy) * z / cam.fy
        xyz = jnp.stack([x, y, z], axis=-1)

        return Keypoints(
            uv=uv,
            xyz=xyz,
            score=top_score,
            theta=theta,
            desc=jnp.where(valid[:, None], desc, jnp.int8(0)),
            valid=valid,
            level=level,
        )


def min_depth_map(depth: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """3x3 min-pool of depth with invalid -> +inf (misc.cpp:774 semantics)."""
    d = jnp.where(valid, depth, jnp.inf)
    return -jax.lax.reduce_window(
        -d, -jnp.inf, jax.lax.max, (3, 3), (1, 1), [(1, 1), (1, 1)]
    )


def feature_depth_map(
    depth: jnp.ndarray, valid: jnp.ndarray, use_min: bool
) -> jnp.ndarray:
    """Depth plane sampled at keypoints (+inf where unusable).

    use_min=False (the reference's default, use_feature_min_depth
    parameter_server.cpp:90, node.cpp:940-944): the CENTER pixel's depth.
    The min-pool variant biases feature depth low under sensor noise
    (min of 9 noisy samples ~ -1.5 sigma(z)), which shrinks every pairwise
    translation and shows up as a global trajectory scale error — so, like
    the reference, it is opt-in for dynamic scenes where the nearest
    surface dominates motion."""
    if use_min:
        return min_depth_map(depth, valid)
    return jnp.where(valid, depth, jnp.inf)
