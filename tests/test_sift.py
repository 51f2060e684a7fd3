import jax
import jax.numpy as jnp
import numpy as np

from rgbdslam_v2_tpu.core.camera import Intrinsics
from rgbdslam_v2_tpu.models.sift import SiftExtractor
from rgbdslam_v2_tpu.ops import sift as sift_ops
from rgbdslam_v2_tpu.ops.matching import descriptor_distances, match_descriptors

import pytest

pytestmark = pytest.mark.heavy  # excluded from the <2 min smoke tier

CAM = Intrinsics(fx=260.0, fy=260.0, cx=160.0, cy=120.0, width=320, height=240)


def _blob_image(h=128, w=128, centers=((40, 40), (80, 90)), r=3.5):
    img = np.zeros((h, w), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for cy, cx in centers:
        img += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * r**2))
    return jnp.asarray(img)


def test_dog_extrema_finds_blobs():
    img = _blob_image()
    gs, sigmas = sift_ops.scale_space(img)
    dogs = gs[1:] - gs[:-1]
    score = sift_ops.dog_extrema(dogs, contrast_threshold=0.002)
    s = np.asarray(score)
    finite = np.isfinite(s).any(0)
    ys, xs = np.where(finite)
    assert len(ys) >= 2
    # at least one extremum near each blob center
    for cy, cx in ((40, 40), (80, 90)):
        d = np.sqrt((ys - cy) ** 2 + (xs - cx) ** 2)
        assert d.min() < 4.0


def test_sift_descriptor_shift_invariance():
    rng = np.random.default_rng(0)
    img = jnp.asarray(
        np.kron(rng.uniform(0, 1, (16, 16)), np.ones((8, 8))).astype(np.float32)
    )
    mag, ang = sift_ops.gradients(img)
    uv = jnp.asarray([[50.0, 60.0], [70.0, 40.0]])
    th = sift_ops.keypoint_orientation_sift(mag, ang, uv, 1.6)
    d1 = sift_ops.sift_descriptors(mag, ang, uv, th, 1.6)
    # shifted image, shifted keypoints
    img2 = jnp.roll(img, (3, 5), (0, 1))
    mag2, ang2 = sift_ops.gradients(img2)
    uv2 = uv + jnp.asarray([[5.0, 3.0]])
    th2 = sift_ops.keypoint_orientation_sift(mag2, ang2, uv2, 1.6)
    d2 = sift_ops.sift_descriptors(mag2, ang2, uv2, th2, 1.6)
    dist = np.asarray(descriptor_distances(d1, d2))
    assert np.diag(dist).max() < 0.05
    # cross distances exceed same-point distances
    assert dist[0, 1] > dist[0, 0] and dist[1, 0] > dist[1, 1]


def test_sift_rotation_invariance():
    """Rotate a textured patch by 90 deg; descriptors at mapped points match."""
    rng = np.random.default_rng(1)
    base = np.kron(rng.uniform(0, 1, (20, 20)), np.ones((8, 8))).astype(np.float32)
    img = jnp.asarray(base)
    img_rot = jnp.asarray(np.rot90(base, k=1).copy())  # (x, y) -> (y, W-1-x)
    H, W = base.shape
    pts = np.asarray([[60.0, 50.0], [90.0, 80.0], [50.0, 100.0]], np.float32)
    # rot90 ccw maps (x, y) -> (y, H-1-x) in (x', y') coords of the new image
    pts_rot = np.stack([pts[:, 1], W - 1 - pts[:, 0]], -1).astype(np.float32)

    mag, ang = sift_ops.gradients(img)
    th = sift_ops.keypoint_orientation_sift(mag, ang, jnp.asarray(pts), 1.6)
    d1 = sift_ops.sift_descriptors(mag, ang, jnp.asarray(pts), th, 1.6)
    mag2, ang2 = sift_ops.gradients(img_rot)
    th2 = sift_ops.keypoint_orientation_sift(mag2, ang2, jnp.asarray(pts_rot), 1.6)
    d2 = sift_ops.sift_descriptors(mag2, ang2, jnp.asarray(pts_rot), th2, 1.6)
    dist = np.asarray(descriptor_distances(d1, d2))
    # correct pairs are nearest neighbours with a clear margin
    assert (dist.argmin(1) == np.arange(3)).all()
    off = dist + np.eye(3) * 1e9
    assert (np.diag(dist) < 0.5 * off.min(1)).all()
    assert np.diag(dist).max() < 0.5


def test_root_sift():
    d = jnp.asarray([[0.5, 0.5, 0.0, 0.0]])
    r = np.asarray(sift_ops.root_sift(d))
    np.testing.assert_allclose(r, [[np.sqrt(0.5), np.sqrt(0.5), 0, 0]], atol=1e-6)
    assert abs((r**2).sum() - 1.0) < 1e-5  # L2-normalized after sqrt


def test_sift_extractor_end_to_end():
    from rgbdslam_v2_tpu.core.frames import make_frame
    from rgbdslam_v2_tpu.io import SyntheticWorld
    from rgbdslam_v2_tpu.models.orb import min_depth_map

    world = SyntheticWorld.create(seed=0, texture_size=256, cam=CAM)
    poses = world.orbit_trajectory(10, seed=2)
    rgb, depth = world.render(poses[0])
    f = make_frame((rgb * 255).astype(jnp.uint8), depth, CAM)
    ext = SiftExtractor(max_keypoints=200, n_octaves=2)
    kp = jax.jit(lambda g, d: ext(g, d, CAM))(
        f.gray, min_depth_map(f.depth, f.valid)
    )
    n = int(kp.count())
    assert n > 60
    v = np.asarray(kp.valid)
    desc = np.asarray(kp.desc)[v]
    # RootSIFT: unit L2 norm
    norms = np.linalg.norm(desc, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    assert desc.shape[1] == 128
    z = np.asarray(kp.xyz)[v, 2]
    assert (z > 0.05).all()


def test_sift_matching_two_frames():
    from rgbdslam_v2_tpu.core.frames import make_frame
    from rgbdslam_v2_tpu.io import SyntheticWorld
    from rgbdslam_v2_tpu.models.orb import min_depth_map

    world = SyntheticWorld.create(seed=0, texture_size=256, cam=CAM)
    poses = world.orbit_trajectory(40, seed=2)
    ext = SiftExtractor(max_keypoints=200, n_octaves=2)

    def extract(T):
        rgb, depth = world.render(T)
        f = make_frame((rgb * 255).astype(jnp.uint8), depth, CAM)
        return f, jax.jit(lambda g, d: ext(g, d, CAM))(
            f.gray, min_depth_map(f.depth, f.valid)
        )

    fa, kpa = extract(poses[0])
    fb, kpb = extract(poses[1])
    m = match_descriptors(kpb.desc, kpb.valid, kpa.desc, kpa.valid, 150, ratio=0.8)
    assert int(m.count()) > 30
