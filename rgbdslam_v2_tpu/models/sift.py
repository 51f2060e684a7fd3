"""Multi-octave SIFT extractor: the second feature model family.

Capability parity: the reference's SIFTGPU detector/extractor option
(feature_detector_type/feature_extractor_type = SIFTGPU,
reference: src/features.cpp:74-76,:120-122; src/sift_gpu_wrapper.cpp) with
RootSIFT (squareroot_descriptor_space). Same Keypoints contract as the ORB
extractor, so matching/registration/graph layers are family-agnostic —
only descriptor dtype differs (float32 -> L2 matmul distances).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.camera import Intrinsics
from ..ops import sift as sift_ops
from ..ops.image import resize_bilinear
from .types import Keypoints


@dataclasses.dataclass(frozen=True)
class SiftExtractor:
    max_keypoints: int = 600
    n_octaves: int = 3
    n_scales: int = 3
    sigma0: float = 1.6
    contrast_threshold: float = 0.015
    edge_ratio: float = 10.0
    use_root_sift: bool = True
    require_depth: bool = True

    def __call__(self, gray: jnp.ndarray, depth_min: jnp.ndarray, cam: Intrinsics) -> Keypoints:
        H, W = gray.shape
        K = self.max_keypoints
        per_oct = [max(32, K // (2**o)) for o in range(self.n_octaves)]

        all_uv, all_score, all_theta, all_desc, all_level = [], [], [], [], []
        img_o = gray
        for o in range(self.n_octaves):
            if o > 0:
                img_o = resize_bilinear(img_o, (img_o.shape[0] // 2, img_o.shape[1] // 2))
            gs, sigmas = sift_ops.scale_space(img_o, self.n_scales, self.sigma0)
            dogs = gs[1:] - gs[:-1]
            score = sift_ops.dog_extrema(
                dogs, self.contrast_threshold, self.edge_ratio
            )  # (S, h, w) interior scales
            Sn, h, w = score.shape
            k_o = per_oct[o]
            val, idx = jax.lax.top_k(score.reshape(-1), k_o)
            sidx = idx // (h * w)
            yx = idx % (h * w)
            uv_o = jnp.stack(
                [(yx % w).astype(jnp.float32), (yx // w).astype(jnp.float32)], -1
            )
            # orientation + descriptor on the keypoint's scale image
            theta_list, desc_list = [], []
            for s in range(Sn):
                mag, ang = sift_ops.gradients(gs[s + 1])
                th = sift_ops.keypoint_orientation_sift(mag, ang, uv_o, float(sigmas[s + 1]))
                de = sift_ops.sift_descriptors(mag, ang, uv_o, th, float(sigmas[s + 1]))
                theta_list.append(th)
                desc_list.append(de)
            theta_all = jnp.stack(theta_list)  # (Sn, k_o)
            desc_all = jnp.stack(desc_list)  # (Sn, k_o, 128)
            theta_o = jnp.take_along_axis(theta_all, sidx[None, :], axis=0)[0]
            desc_o = jnp.take_along_axis(
                desc_all, sidx[None, :, None], axis=0
            )[0]
            scale_mult = float(2**o)
            all_uv.append(uv_o * scale_mult)
            all_score.append(val)
            all_theta.append(theta_o)
            all_desc.append(desc_o)
            all_level.append(jnp.full((k_o,), o, jnp.int32))

        uv = jnp.concatenate(all_uv, 0)
        score = jnp.concatenate(all_score, 0)
        theta = jnp.concatenate(all_theta, 0)
        desc = jnp.concatenate(all_desc, 0)
        level = jnp.concatenate(all_level, 0)

        xi = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, H - 1)
        z = depth_min[yi, xi]
        has_depth = jnp.isfinite(z) & (z > 0)
        detected = jnp.isfinite(score)
        neg = jnp.float32(-jnp.inf)
        sel = jnp.where(
            detected & (has_depth if self.require_depth else True), score, neg
        )
        top_score, top_idx = jax.lax.top_k(sel, K)
        uv = uv[top_idx]
        theta = theta[top_idx]
        desc = desc[top_idx]
        level = level[top_idx]
        z = jnp.where(jnp.isfinite(top_score), z[top_idx], 0.0)
        valid = jnp.isfinite(top_score)

        if self.use_root_sift:
            desc = sift_ops.root_sift(desc)
        desc = jnp.where(valid[:, None], desc, 0.0)

        x = (uv[:, 0] - cam.cx) * z / cam.fx
        y = (uv[:, 1] - cam.cy) * z / cam.fy
        xyz = jnp.stack([x, y, z], axis=-1)
        return Keypoints(
            uv=uv,
            xyz=xyz,
            score=top_score,
            theta=theta,
            desc=desc,
            valid=valid,
            level=level,
        )
