import jax.numpy as jnp
import numpy as np

from rgbdslam_v2_tpu.core import alignment, camera, frames, noise, se3
from rgbdslam_v2_tpu.config import ParameterServer


def test_backproject_project_roundtrip():
    cam = camera.TUM_FR1
    rng = np.random.default_rng(0)
    u = rng.uniform(0, cam.width - 1, 100).astype(np.float32)
    v = rng.uniform(0, cam.height - 1, 100).astype(np.float32)
    z = rng.uniform(0.3, 5.0, 100).astype(np.float32)
    pts = camera.backproject(jnp.asarray(u), jnp.asarray(v), jnp.asarray(z), cam)
    u2, v2, z2 = camera.project(pts, cam)
    np.testing.assert_allclose(np.asarray(u2), u, atol=1e-2)
    np.testing.assert_allclose(np.asarray(v2), v, atol=1e-2)
    np.testing.assert_allclose(np.asarray(z2), z, atol=1e-5)


def test_backproject_grid_center():
    cam = camera.Intrinsics(fx=100.0, fy=100.0, cx=32.0, cy=24.0, width=64, height=48)
    depth = jnp.ones((48, 64), jnp.float32) * 2.0
    pts = camera.backproject_grid(depth, cam)
    # pixel at (u=cx, v=cy) backprojects to (0, 0, z)
    np.testing.assert_allclose(np.asarray(pts[24, 32]), [0.0, 0.0, 2.0], atol=1e-5)
    assert pts.shape == (48, 64, 3)


def test_noise_model():
    z = jnp.array([1.0, 2.0, 4.0])
    sd = noise.depth_std_dev(z)
    np.testing.assert_allclose(np.asarray(sd), [0.01, 0.04, 0.16], atol=1e-7)
    info = noise.point_information_matrix(z, fx=525.0, fy=525.0)
    assert info.shape == (3, 3, 3)
    # information decreases with depth
    assert float(info[0, 2, 2]) > float(info[2, 2, 2])
    # off-diagonals zero
    assert float(info[0, 0, 1]) == 0.0


def test_weighted_kabsch_exact_recovery():
    rng = np.random.default_rng(1)
    src = rng.uniform(-2, 2, (50, 3)).astype(np.float32)
    T_true = se3.exp_se3(jnp.array([0.3, -0.1, 0.5, 0.2, -0.3, 0.4], jnp.float32))
    dst = se3.apply(T_true, jnp.asarray(src))
    w = jnp.ones(50)
    T = alignment.weighted_kabsch(jnp.asarray(src), dst, w)
    np.testing.assert_allclose(np.asarray(T), np.asarray(T_true), atol=1e-4)


def test_weighted_kabsch_ignores_zero_weight_outliers():
    rng = np.random.default_rng(2)
    src = rng.uniform(-2, 2, (50, 3)).astype(np.float32)
    T_true = se3.exp_se3(jnp.array([0.1, 0.2, -0.3, -0.1, 0.2, 0.1], jnp.float32))
    dst = np.array(se3.apply(T_true, jnp.asarray(src)))
    dst[40:] += 100.0  # gross outliers
    w = jnp.asarray((np.arange(50) < 40).astype(np.float32))
    T = alignment.weighted_kabsch(jnp.asarray(src), jnp.asarray(dst), w)
    np.testing.assert_allclose(np.asarray(T), np.asarray(T_true), atol=1e-4)


def test_kabsch_batched_vmap_shape():
    import jax

    src = jnp.ones((7, 4, 3))
    dst = src + 1.0
    w = jnp.ones((7, 4))
    T = jax.vmap(alignment.weighted_kabsch)(src, dst, w)
    assert T.shape == (7, 4, 4)
    # pure translation by +1
    np.testing.assert_allclose(np.asarray(T[0, :3, 3]), [1, 1, 1], atol=1e-5)


def test_horn_align_trajectories():
    rng = np.random.default_rng(3)
    gt = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
    T = se3.exp_se3(jnp.array([1.0, 2.0, 3.0, 0.3, 0.2, 0.1], jnp.float32))
    est = np.asarray(se3.apply(T, jnp.asarray(gt)))
    _, rmse = alignment.horn_align_trajectories(jnp.asarray(est), jnp.asarray(gt))
    assert float(rmse) < 1e-3


def test_frame_construction_masks():
    cam = camera.Intrinsics(fx=100.0, fy=100.0, cx=32.0, cy=24.0, width=64, height=48)
    rgb = jnp.zeros((48, 64, 3), jnp.uint8)
    depth = np.full((48, 64), 2.0, np.float32)
    depth[0, 0] = 0.0
    depth[1, 1] = np.nan
    depth[2, 2] = 50.0  # beyond max
    f = frames.make_frame(rgb, jnp.asarray(depth), cam)
    valid = np.asarray(f.valid)
    assert not valid[0, 0] and not valid[1, 1] and not valid[2, 2]
    assert valid[10, 10]
    assert float(f.depth[1, 1]) == 0.0
    assert f.points.shape == (48, 64, 3)


def test_parameter_server():
    p = ParameterServer({"max_keypoints": "720", "keep_all_nodes": "true"})
    assert p.get("max_keypoints") == 720
    assert p.get("keep_all_nodes") is True
    p.set("nn_distance_ratio", 0.8)
    assert abs(p["nn_distance_ratio"] - 0.8) < 1e-12
    try:
        p.get("bogus")
        assert False
    except KeyError:
        pass
    p2 = ParameterServer.from_cli(["ransac_iterations=500"])
    assert p2.get("ransac_iterations") == 500
    warns = ParameterServer({"sample_candidates": 2}).check_values()
    assert any("sample_candidates" in w for w in warns)
