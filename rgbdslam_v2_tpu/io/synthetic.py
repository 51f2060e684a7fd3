"""Synthetic RGB-D world: a textured box room rendered analytically in JAX.

No TUM data ships in this environment (zero egress), so end-to-end SLAM
validation uses this generator: a camera moves inside a box whose six faces
carry corner-rich procedural textures; RGB and depth render by ray/plane
intersection with exact ground-truth poses. This reproduces the *evaluation
capability* of the reference's TUM benchmark harness (reference: test/
run_tests.sh, rgbd_benchmark/) with a dataset whose ground truth is exact.

Renders run batched + jitted (vmap over poses): the whole pipeline including
data generation stays on device.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import se3
from ..core.camera import Intrinsics, TUM_DEFAULT


def _make_face_texture(rng: np.random.Generator, size: int = 512) -> np.ndarray:
    """Corner-rich RGB texture: smooth base + random rectangles + speckle."""
    # Smooth low-frequency base color field.
    base = rng.uniform(0.25, 0.75, (8, 8, 3))
    tex = np.kron(base, np.ones((size // 8, size // 8, 1)))
    # Blur the base slightly (box blur twice).
    for _ in range(2):
        tex = (
            tex
            + np.roll(tex, 7, 0)
            + np.roll(tex, -7, 0)
            + np.roll(tex, 7, 1)
            + np.roll(tex, -7, 1)
        ) / 5.0
    # Random high-contrast rectangles (Mondrian): strong corners for FAST/ORB.
    for _ in range(80):
        w = rng.integers(8, size // 4)
        h = rng.integers(8, size // 4)
        x = rng.integers(0, size - w)
        y = rng.integers(0, size - h)
        color = rng.uniform(0.0, 1.0, 3)
        alpha = rng.uniform(0.6, 1.0)
        tex[y : y + h, x : x + w] = (1 - alpha) * tex[y : y + h, x : x + w] + alpha * color
    # Fine speckle for descriptor distinctiveness.
    tex += rng.normal(0, 0.02, tex.shape)
    return np.clip(tex, 0.0, 1.0).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class SyntheticWorld:
    """Box room [0,Lx]x[0,Ly]x[0,Lz] with textured interior faces and a set
    of textured boxes inside (furniture): depth discontinuities + occlusions
    make EMM validation and parallax meaningful."""

    extent: Tuple[float, float, float]
    textures: jnp.ndarray  # (6, S, S, 3) float32 — faces x-,x+,y-,y+,z-,z+
    boxes: Tuple[Tuple[Tuple[float, float, float], Tuple[float, float, float]], ...]
    cam: Intrinsics

    @classmethod
    def create(
        cls,
        seed: int = 0,
        extent: Tuple[float, float, float] = (6.0, 5.0, 3.0),
        texture_size: int = 512,
        cam: Intrinsics = TUM_DEFAULT,
        n_boxes: int = 5,
        texture_contrast=1.0,
    ) -> "SyntheticWorld":
        """texture_contrast scales each face's texture contrast about its
        mean: 1.0 = normal; a 6-tuple gives per-face values (faces ordered
        x-,x+,y-,y+,z-,z+). Values near 0 make walls near-featureless —
        the detector-adjuster / ICP-rescue stress world (the reference's
        low-texture failure mode, e.g. fr2_large_no_loop's 3 m ATE)."""
        rng = np.random.default_rng(seed)
        tex = np.stack([_make_face_texture(rng, texture_size) for _ in range(6)])
        contrasts = (
            (float(texture_contrast),) * 6
            if np.isscalar(texture_contrast)
            else tuple(float(c) for c in texture_contrast)
        )
        for f, c in enumerate(contrasts):
            if c != 1.0:
                mean = tex[f].mean(axis=(0, 1), keepdims=True)
                tex[f] = np.clip(mean + (tex[f] - mean) * c, 0.0, 1.0)
        Lx, Ly, Lz = extent
        boxes = []
        # Furniture along the walls / floor, outside the camera orbit region
        # (the orbit stays within ~0.25 * extent of the center).
        for k in range(n_boxes):
            sx, sy = rng.uniform(0.5, 1.4, 2)
            sz = rng.uniform(1.0, 0.75 * Lz)
            # place against a wall (outside the camera orbit region), tall
            # enough to occlude wall texture at eye height
            side = k % 4
            if side == 0:
                ax, ay = 0.05 * Lx, rng.uniform(0.05 * Ly, 0.9 * Ly - sy)
            elif side == 1:
                ax, ay = 0.95 * Lx - sx, rng.uniform(0.05 * Ly, 0.9 * Ly - sy)
            elif side == 2:
                ax, ay = rng.uniform(0.05 * Lx, 0.9 * Lx - sx), 0.05 * Ly
            else:
                ax, ay = rng.uniform(0.05 * Lx, 0.9 * Lx - sx), 0.95 * Ly - sy
            az = 0.0  # on the floor
            boxes.append(((float(ax), float(ay), float(az)),
                          (float(ax + sx), float(ay + sy), float(az + sz))))
        return cls(
            extent=extent,
            textures=jnp.asarray(tex),
            boxes=tuple(boxes),
            cam=cam,
        )

    # ---------------- rendering ----------------

    def render(self, world_T_cam: jnp.ndarray):
        """Render one frame: pose (4, 4) -> (rgb float32 (H,W,3) in [0,1], depth (H,W))."""
        return _render_jit(self.textures, jnp.asarray(self.extent), self.boxes, world_T_cam, self.cam)

    def render_batch(self, poses: jnp.ndarray):
        """poses (B, 4, 4) -> (rgb (B,H,W,3), depth (B,H,W)). jit+vmap.

        Dispatches through the module-level jitted vmap (a fresh jax.jit
        wrapper per call would retrace AND recompile on every batch)."""
        return _render_batch_jit(
            self.textures, jnp.asarray(self.extent), self.boxes, poses, self.cam
        )

    # ---------------- trajectories ----------------

    def orbit_trajectory(self, n_frames: int, seed: int = 1,
                         deg_per_frame: float = 2.0) -> jnp.ndarray:
        """Smooth fr1-like trajectory: ellipse orbit + bob + look-at jitter.

        Angular velocity is fixed (default 2 deg/frame ≈ 60 deg/s at 30 Hz,
        fr1-class motion) so difficulty does not depend on sequence length;
        long sequences revisit viewpoints (loop closures).
        Returns (N, 4, 4) world_T_cam with +z forward (camera convention).
        """
        Lx, Ly, Lz = self.extent
        c = jnp.array([Lx / 2, Ly / 2, Lz / 2])
        t = jnp.arange(n_frames) * (deg_per_frame * jnp.pi / 180.0)
        rng = np.random.default_rng(seed)
        ph = float(rng.uniform(0, 2 * np.pi))
        rx, ry = 0.22 * Lx, 0.22 * Ly
        pos = jnp.stack(
            [
                Lx / 2 + rx * jnp.cos(t + ph),
                Ly / 2 + ry * jnp.sin(t + ph),
                Lz / 2 + 0.25 * jnp.sin(2.0 * t + ph),
            ],
            axis=-1,
        )
        # Look at a point that slowly pans around the walls.
        look = jnp.stack(
            [
                Lx / 2 + 0.48 * Lx * jnp.cos(t + ph + 1.2),
                Ly / 2 + 0.48 * Ly * jnp.sin(t + ph + 1.2),
                0.35 * Lz + 0.15 * Lz * jnp.cos(3.0 * t),
            ],
            axis=-1,
        )
        fwd = look - pos
        fwd = fwd / jnp.linalg.norm(fwd, axis=-1, keepdims=True)
        up = jnp.array([0.0, 0.0, 1.0])
        right = jnp.cross(fwd, up)
        right = right / jnp.linalg.norm(right, axis=-1, keepdims=True)
        down = jnp.cross(fwd, right)  # camera y points down
        R = jnp.stack([right, down, fwd], axis=-1)  # columns: x=right, y=down, z=fwd
        return se3.from_rt(R, pos)

    def spin_trajectory(self, n_frames: int, seed: int = 1,
                        deg_per_frame: float = 3.0) -> jnp.ndarray:
        """fr1_360-class motion: near-in-place yaw spin (the hardest TUM
        fr1 class — reference ATE 0.051 m, test/README:87). Almost pure
        rotation gives minimal parallax (weak RANSAC geometry), fast image
        motion (default 3 deg/frame = 90 deg/s at 30 Hz), and frames that
        leave the field of view within ~20 frames (loop closures only on
        full revolutions). A small positional wobble keeps depth parallax
        nonzero like a handheld camera."""
        Lx, Ly, Lz = self.extent
        t = jnp.arange(n_frames) * (deg_per_frame * jnp.pi / 180.0)
        rng = np.random.default_rng(seed)
        ph = float(rng.uniform(0, 2 * np.pi))
        pos = jnp.stack(
            [
                Lx / 2 + 0.03 * Lx * jnp.sin(2.1 * t + ph),
                Ly / 2 + 0.03 * Ly * jnp.cos(1.7 * t + ph),
                Lz / 2 + 0.05 * jnp.sin(3.0 * t),
            ],
            axis=-1,
        )
        yaw = t + ph
        fwd = jnp.stack(
            [jnp.cos(yaw), jnp.sin(yaw), 0.12 * jnp.sin(2.0 * t)], axis=-1
        )
        fwd = fwd / jnp.linalg.norm(fwd, axis=-1, keepdims=True)
        up = jnp.array([0.0, 0.0, 1.0])
        right = jnp.cross(fwd, up)
        right = right / jnp.linalg.norm(right, axis=-1, keepdims=True)
        down = jnp.cross(fwd, right)
        R = jnp.stack([right, down, fwd], axis=-1)
        return se3.from_rt(R, pos)


import functools as _functools


@_functools.partial(jax.jit, static_argnames=("boxes", "cam"))
def _render_jit(textures, extent, boxes, world_T_cam, cam):
    return _render(textures, extent, boxes, world_T_cam, cam)


@_functools.partial(jax.jit, static_argnames=("boxes", "cam"))
def _render_batch_jit(textures, extent, boxes, poses, cam):
    return jax.vmap(
        lambda T: _render(textures, extent, boxes, T, cam)
    )(poses)


def _sample_tex(textures, face, tu01, tv01):
    """Bilinear sample face texture at normalized coords (broadcasting)."""
    S = textures.shape[1]
    tu = jnp.clip(tu01, 0.0, 1.0) * (S - 1)
    tv = jnp.clip(tv01, 0.0, 1.0) * (S - 1)
    x0 = jnp.floor(tu).astype(jnp.int32)
    y0 = jnp.floor(tv).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, S - 1)
    y1 = jnp.minimum(y0 + 1, S - 1)
    fx = (tu - x0)[..., None]
    fy = (tv - y0)[..., None]
    tex = textures[face]
    c00 = tex[y0, x0]
    c01 = tex[y0, x1]
    c10 = tex[y1, x0]
    c11 = tex[y1, x1]
    return (1 - fy) * ((1 - fx) * c00 + fx * c01) + fy * ((1 - fx) * c10 + fx * c11)


def _render(textures, extent, boxes, world_T_cam, cam: Intrinsics):
    H, W = cam.height, cam.width
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    dir_cam = jnp.stack(
        [
            jnp.broadcast_to((u - cam.cx) / cam.fx, (H, W)),
            jnp.broadcast_to((v - cam.cy) / cam.fy, (H, W)),
            jnp.ones((H, W), jnp.float32),
        ],
        axis=-1,
    )  # (H, W, 3), cam z-component 1 => depth = ray parameter t
    R, o = se3.to_rt(world_T_cam)
    d = dir_cam @ R.T  # world-frame ray directions

    # Six axis-aligned wall planes: axis a, bound 0 or L_a.
    t_best = jnp.full((H, W), jnp.inf)
    rgb = jnp.zeros((H, W, 3), jnp.float32)
    for face in range(6):
        axis = face // 2
        hi = face % 2
        bound = extent[axis] * hi
        da = d[..., axis]
        safe_da = jnp.where(jnp.abs(da) < 1e-9, 1e-9, da)
        t = (bound - o[axis]) / safe_da
        p = o + t[..., None] * d
        a1, a2 = [x for x in (0, 1, 2) if x != axis]
        inb = (
            (t > 1e-4)
            & (jnp.abs(da) > 1e-9)
            & (p[..., a1] >= 0)
            & (p[..., a1] <= extent[a1])
            & (p[..., a2] >= 0)
            & (p[..., a2] <= extent[a2])
        )
        color = _sample_tex(textures, face, p[..., a1] / extent[a1], p[..., a2] / extent[a2])
        closer = inb & (t < t_best)
        t_best = jnp.where(closer, t, t_best)
        rgb = jnp.where(closer[..., None], color, rgb)

    # Interior boxes (furniture): slab intersection; entry face picks texture.
    for bmin, bmax in boxes:
        bmin = jnp.asarray(bmin)
        bmax = jnp.asarray(bmax)
        safe_d = jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
        t1 = (bmin - o) / safe_d  # (H, W, 3)
        t2 = (bmax - o) / safe_d
        tmin = jnp.minimum(t1, t2)
        tmax = jnp.maximum(t1, t2)
        t_near = jnp.max(tmin, axis=-1)
        t_far = jnp.min(tmax, axis=-1)
        hit = (t_near > 1e-4) & (t_near < t_far)
        entry_axis = jnp.argmax(tmin, axis=-1)  # (H, W)
        p = o + t_near[..., None] * d
        size = bmax - bmin
        rel = (p - bmin) / size
        # texture coords = the two non-entry axes
        tu = jnp.take_along_axis(rel, ((entry_axis + 1) % 3)[..., None], -1)[..., 0]
        tv = jnp.take_along_axis(rel, ((entry_axis + 2) % 3)[..., None], -1)[..., 0]
        color = _sample_tex(textures, 0, tu, tv)  # distinct look via shading below
        # darken by entry axis so box faces are visually distinct
        shade = 0.55 + 0.15 * entry_axis.astype(jnp.float32)
        color = color * shade[..., None]
        closer = hit & (t_near < t_best)
        t_best = jnp.where(closer, t_near, t_best)
        rgb = jnp.where(closer[..., None], color, rgb)

    depth = jnp.where(jnp.isfinite(t_best), t_best, 0.0)
    return rgb, depth


def _dropout_mask(key, H: int, W: int, n_holes: int):
    """Elliptical depth holes (specular/absorbing surface dropout — the
    Kinect's black-surface and grazing-angle failure): (H, W) bool, True
    where depth is INVALID."""
    k1, k2, k3 = jax.random.split(key, 3)
    cy = jax.random.uniform(k1, (n_holes,)) * H
    cx = jax.random.uniform(k2, (n_holes,)) * W
    rad = jax.random.uniform(k3, (n_holes, 2), minval=0.02, maxval=0.09)
    ry = rad[:, 0] * H
    rx = rad[:, 1] * W
    yy = jnp.arange(H)[:, None, None].astype(jnp.float32)
    xx = jnp.arange(W)[None, :, None].astype(jnp.float32)
    d = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2
    return jnp.any(d < 1.0, axis=-1)


def render_sequence(
    world: SyntheticWorld,
    n_frames: int,
    seed: int = 1,
    depth_noise_sigma: float = 0.0,
    batch: int = 16,
    trajectory=None,
    depth_dropout: int = 0,
):
    """Render a full trajectory -> (poses (N,4,4), rgb uint8 (N,H,W,3), depth (N,H,W)).

    depth_noise_sigma > 0 adds Kinect-style quadratic depth noise and 1/5000
    quantization (the TUM recording format). trajectory overrides the
    default orbit with explicit (N,4,4) poses (e.g. spin_trajectory).
    depth_dropout > 0 punches that many random elliptical invalid-depth
    holes per frame (specular/absorbing surfaces)."""
    poses = (
        jnp.asarray(trajectory)
        if trajectory is not None
        else world.orbit_trajectory(n_frames, seed=seed)
    )
    rgbs, depths = [], []
    key = jax.random.PRNGKey(seed)
    for s in range(0, n_frames, batch):
        chunk = poses[s : s + batch]
        pad = batch - chunk.shape[0]
        if pad:
            chunk = jnp.concatenate([chunk, jnp.repeat(chunk[-1:], pad, 0)], 0)
        rgb, depth = world.render_batch(chunk)
        if depth_noise_sigma > 0:
            key, k1 = jax.random.split(key)
            noise = jax.random.normal(k1, depth.shape) * depth_noise_sigma * depth * depth
            depth = jnp.where(depth > 0, depth + noise, 0.0)
            depth = jnp.round(depth * 5000.0) / 5000.0
        if depth_dropout > 0:
            key, k2 = jax.random.split(key)
            holes = jax.vmap(
                lambda k: _dropout_mask(
                    k, depth.shape[1], depth.shape[2], depth_dropout
                )
            )(jax.random.split(k2, depth.shape[0]))
            depth = jnp.where(holes, 0.0, depth)
        n = batch - pad
        rgbs.append(np.asarray((rgb[:n] * 255).astype(jnp.uint8)))
        depths.append(np.asarray(depth[:n]))
    return (
        np.asarray(poses),
        np.concatenate(rgbs, 0),
        np.concatenate(depths, 0),
    )


def save_as_tum_dataset(out_dir, poses, rgbs, depths, fps: float = 30.0):
    """Write a synthetic sequence as a TUM dataset directory (png + index files)."""
    import cv2
    from pathlib import Path

    out = Path(out_dir)
    (out / "rgb").mkdir(parents=True, exist_ok=True)
    (out / "depth").mkdir(parents=True, exist_ok=True)
    stamps = [1.0e9 + i / fps for i in range(len(rgbs))]
    rgb_lines, d_lines = ["# synthetic"], ["# synthetic"]
    for i, ts in enumerate(stamps):
        rn = f"rgb/{ts:.6f}.png"
        dn = f"depth/{ts:.6f}.png"
        cv2.imwrite(str(out / rn), rgbs[i][..., ::-1])
        cv2.imwrite(str(out / dn), (depths[i] * 5000.0).astype(np.uint16))
        rgb_lines.append(f"{ts:.6f} {rn}")
        d_lines.append(f"{ts:.6f} {dn}")
    (out / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (out / "depth.txt").write_text("\n".join(d_lines) + "\n")
    from .tum import write_trajectory

    write_trajectory(out / "groundtruth.txt", stamps, poses, comment="synthetic gt")
    return stamps
