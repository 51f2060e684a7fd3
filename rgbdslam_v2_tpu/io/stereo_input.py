"""Stereo input modality: rectified left/right image pairs -> RGB-D frames.

Capability parity with the reference's stereo input (stereoCallback,
reference: src/openni_listener.cpp:559-598): there the ROS stereo stack
(stereo_image_proc) computes the disparity cloud and the callback pairs it
with the left visual image. This framework owns that front-end: the
block-matching disparity -> depth kernel runs on device (ops/stereo.py)
and the resulting organized (rgb, depth) grid feeds the same compiled SLAM
program as every other modality.

Dataset layout: a directory with ``left/`` and ``right/`` image
subdirectories whose files pair by sorted name; timestamps parse from the
file stem when it is a float (TUM convention), else index/30 s. An
optional ``groundtruth.txt`` (TUM format) is read by the caller like any
other dataset.
"""
from __future__ import annotations

from pathlib import Path
from typing import List, Tuple

import numpy as np


class StereoDataset:
    def __init__(self, pairs: List[Tuple[float, Path, Path]]):
        self.pairs = pairs

    @classmethod
    def open(cls, root) -> "StereoDataset":
        root = Path(root)
        lefts = sorted((root / "left").iterdir())
        rights = {p.name: p for p in (root / "right").iterdir()}
        pairs = []
        for k, lp in enumerate(lefts):
            rp = rights.get(lp.name)
            if rp is None:
                continue
            try:
                ts = float(lp.stem)
            except ValueError:
                ts = k / 30.0
            pairs.append((ts, lp, rp))
        if not pairs:
            raise FileNotFoundError(
                f"no left/right image pairs under {root}"
            )
        return cls(pairs)

    def __len__(self):
        return len(self.pairs)

    def load(self, i: int):
        """-> (stamp, left_rgb u8 (H,W,3), left_gray f32, right_gray f32)."""
        import cv2

        ts, lp, rp = self.pairs[i]
        bgr = cv2.imread(str(lp), cv2.IMREAD_COLOR)
        rgb = bgr[..., ::-1].copy()
        gl = cv2.imread(str(lp), cv2.IMREAD_GRAYSCALE).astype(np.float32)
        gr = cv2.imread(str(rp), cv2.IMREAD_GRAYSCALE).astype(np.float32)
        return ts, rgb, gl / 255.0, gr / 255.0


def save_as_stereo_dataset(out, poses, lefts, rights, stamps=None) -> None:
    """Write left/ right/ (+ groundtruth.txt) — the synthetic-stereo
    counterpart of io.synthetic.save_as_tum_dataset."""
    from ..core.se3 import pose_to_tum
    from .render3d import write_png

    out = Path(out)
    (out / "left").mkdir(parents=True, exist_ok=True)
    (out / "right").mkdir(parents=True, exist_ok=True)
    n = len(lefts)
    stamps = stamps if stamps is not None else [k / 30.0 for k in range(n)]
    gt_lines = []
    for k in range(n):
        name = f"{stamps[k]:.6f}.png"
        for sub, img in (("left", lefts[k]), ("right", rights[k])):
            a = np.asarray(img)
            if a.dtype.kind == "f":
                a = np.clip(a * 255.0, 0, 255).astype(np.uint8)
            if a.ndim == 2:
                a = np.repeat(a[..., None], 3, axis=-1)
            write_png(out / sub / name, a)
        t, q = pose_to_tum(poses[k])
        gt_lines.append(
            f"{stamps[k]:.6f} " + " ".join(f"{v:.6f}" for v in np.asarray(t))
            + " " + " ".join(f"{v:.6f}" for v in np.asarray(q)) + "\n"
        )
    (out / "groundtruth.txt").write_text("".join(gt_lines))


def render_stereo_sequence(world, n_frames: int, baseline: float,
                           seed: int = 1):
    """Render a rectified synthetic stereo sequence: the right camera is
    the left pose translated by +baseline along the camera x-axis (exact
    rectification by construction). Returns (poses, lefts, rights,
    left_depths)."""
    import jax.numpy as jnp

    poses = world.orbit_trajectory(n_frames, seed=seed)
    lefts, rights, depths = [], [], []
    for T in np.asarray(poses):
        Tr = T.copy()
        Tr[:3, 3] = Tr[:3, 3] + T[:3, 0] * baseline
        rgb_l, d_l = world.render(jnp.asarray(T))
        rgb_r, _ = world.render(jnp.asarray(Tr))
        lefts.append(np.asarray(rgb_l))
        rights.append(np.asarray(rgb_r))
        depths.append(np.asarray(d_l))
    return np.asarray(poses), lefts, rights, depths
