import numpy as np
import jax.numpy as jnp

from rgbdslam_v2_tpu.mapping import VoxelMap, VoxelMapConfig
from rgbdslam_v2_tpu.mapping.octree_io import read_color_octree, write_color_octree
from rgbdslam_v2_tpu.io.pointcloud import (
    read_pcd,
    voxel_downsample,
    write_pcd,
    write_ply,
)


SMALL_CFG = VoxelMapConfig(resolution=0.1, nx=64, ny=64, nz=32, max_ray_steps=64)


def test_voxel_map_hit_and_freespace():
    vm = VoxelMap(SMALL_CFG)
    # wall of points at x = 3.0, sensor at x = 0.5
    ys, zs = np.meshgrid(np.linspace(1, 5, 40), np.linspace(0.5, 2.5, 20))
    pts = np.stack([np.full(ys.size, 3.0), ys.ravel(), zs.ravel()], -1)
    cols = np.full((pts.shape[0], 3), 200, np.uint8)
    origin = np.array([0.5, 3.0, 1.5])
    for _ in range(3):
        vm.insert_cloud(pts, cols, np.ones(len(pts), bool), origin)
    centers, probs, colors = vm.occupied_voxels()
    assert len(centers) > 100
    # occupied voxels concentrated at the wall
    assert np.abs(centers[:, 0] - 3.0).max() < 0.15
    assert (probs > 0.5).all()
    assert (np.abs(colors.astype(int) - 200) < 3).all()
    # free space along the rays is NOT occupied
    mid = np.array([[1.5, 3.0, 1.5]])
    keep = vm.occupancy_filter(jnp.asarray(mid, jnp.float32), jnp.ones(1, bool))
    assert not bool(keep[0])
    # wall points pass the occupancy filter
    keep2 = vm.occupancy_filter(jnp.asarray(pts[:5], jnp.float32), jnp.ones(5, bool))
    assert np.asarray(keep2).all()


def test_octree_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    centers = (np.floor(rng.uniform(-3, 3, (200, 3)) / 0.05) + 0.5) * 0.05
    centers = np.unique(centers, axis=0)
    probs = rng.uniform(0.55, 0.95, len(centers))
    colors = rng.integers(0, 255, (len(centers), 3)).astype(np.uint8)
    path = tmp_path / "map.ot"
    n = write_color_octree(path, centers, probs, colors, 0.05)
    assert n > len(centers)  # includes inner nodes
    c2, p2, col2, res = read_color_octree(path)
    assert res == 0.05
    assert len(c2) == len(centers)
    order1 = np.lexsort(centers.T)
    order2 = np.lexsort(c2.T)
    np.testing.assert_allclose(centers[order1], c2[order2], atol=1e-6)
    np.testing.assert_allclose(probs[order1], p2[order2], atol=1e-3)
    np.testing.assert_array_equal(colors[order1], col2[order2])


def test_ot_header_format(tmp_path):
    path = tmp_path / "m.ot"
    write_color_octree(path, np.array([[0.025, 0.025, 0.025]]), [0.9], [[1, 2, 3]], 0.05)
    head = path.read_bytes()[:200].decode(errors="replace")
    assert head.startswith("# Octomap OcTree file\n")
    assert "id ColorOcTree" in head
    assert "res 0.05" in head
    assert "data" in head


def test_ot_byte_exact_single_voxel(tmp_path):
    """Golden-byte check against octomap's on-disk node encoding.

    octomap (OcTreeBaseImpl::writeNodesRecurs) writes, pre-order per node:
    ColorOcTreeNode payload (float32 LE log-odds + 3 bytes RGB) followed by
    ONE byte whose bit i marks child i as present, with computeChildIdx
    giving x->bit0, y->bit1, z->bit2. A voxel centered at (+r/2,+r/2,+r/2)
    has key (32768,32768,32768) = 0x8000 per axis: child 7 at the root
    (all three MSBs set), then child 0 for the remaining 15 levels.
    """
    import struct

    res = 0.05
    prob = 0.9
    logodds = np.float32(np.log(prob / (1 - prob)))
    color = bytes((10, 20, 30))
    path = tmp_path / "one.ot"
    write_color_octree(
        path, np.array([[res / 2, res / 2, res / 2]]), [prob], [[10, 20, 30]], res
    )
    raw = path.read_bytes()
    body = raw[raw.index(b"data\n") + 5 :]
    payload = struct.pack("<f", logodds) + color
    expected = payload + bytes([1 << 7])  # root: only child 7 exists
    for _ in range(15):
        expected += payload + bytes([1 << 0])  # inner chain: child 0
    expected += payload + bytes([0])  # leaf: no children
    assert body == expected
    # header advertises all 17 nodes
    assert b"size 17" in raw[: raw.index(b"data\n")]


def test_pcd_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.uniform(-2, 2, (500, 3)).astype(np.float32)
    cols = rng.integers(0, 255, (500, 3)).astype(np.uint8)
    path = tmp_path / "cloud.pcd"
    write_pcd(path, pts, cols)
    p2, c2 = read_pcd(path)
    np.testing.assert_allclose(p2, pts, atol=1e-6)
    np.testing.assert_array_equal(c2, cols)


def test_ply_writes(tmp_path):
    pts = np.zeros((10, 3), np.float32)
    cols = np.full((10, 3), 128, np.uint8)
    path = tmp_path / "cloud.ply"
    write_ply(path, pts, cols)
    raw = path.read_bytes()
    assert raw.startswith(b"ply\nformat binary_little_endian")
    assert b"element vertex 10" in raw


def test_voxel_downsample():
    pts = np.array([[0.01, 0, 0], [0.02, 0, 0], [1.0, 1.0, 1.0]])
    cols = np.array([[100, 0, 0], [200, 0, 0], [0, 255, 0]], np.uint8)
    p, c = voxel_downsample(pts, cols, 0.1)
    assert len(p) == 2
    i = np.argmin(p[:, 0])
    np.testing.assert_allclose(p[i], [0.015, 0, 0], atol=1e-9)
    assert c[i][0] == 150


def test_g2o_roundtrip(tmp_path):
    from rgbdslam_v2_tpu.graph.g2o_io import read_g2o, write_g2o
    from rgbdslam_v2_tpu.core import se3

    rng = np.random.default_rng(2)
    poses = np.asarray(se3.exp_se3(jnp.asarray(rng.normal(0, 0.5, (5, 6)), jnp.float32)))
    info = np.diag([10.0, 10, 10, 40, 40, 40])
    edges = [(i, i + 1, np.asarray(se3.relative(jnp.asarray(poses[i]), jnp.asarray(poses[i + 1]))), info) for i in range(4)]
    path = tmp_path / "graph.g2o"
    write_g2o(path, poses, [0], edges)
    p2, fixed, e2 = read_g2o(path)
    assert fixed == {0}
    assert len(p2) == 5 and len(e2) == 4
    np.testing.assert_allclose(p2[3], poses[3], atol=1e-4)
    np.testing.assert_allclose(e2[0][3], info, atol=1e-6)
    np.testing.assert_allclose(e2[2][2], edges[2][2], atol=1e-4)
