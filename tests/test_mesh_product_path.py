"""tpu_mesh_devices reaches the product SLAM path (VERDICT r2 #7): with a
multi-device mesh configured, GraphManager's candidate comparison routes
through the shard_map kernel and the pipeline still builds a valid graph."""
import jax
import numpy as np
import pytest

from rgbdslam_v2_tpu.config import ParameterServer
from rgbdslam_v2_tpu.core.camera import Intrinsics
from rgbdslam_v2_tpu.graph.manager import GraphManager
from rgbdslam_v2_tpu.io import SyntheticWorld

CAM = Intrinsics(fx=130.0, fy=130.0, cx=80.0, cy=60.0, width=160, height=120)


def _frames(n=6):
    world = SyntheticWorld.create(seed=0, texture_size=256, cam=CAM)
    poses = world.orbit_trajectory(n, seed=2)
    out = []
    for T in poses:
        rgb, depth = world.render(T)
        out.append(((np.asarray(rgb) * 255).astype(np.uint8), np.asarray(depth)))
    return out


def _params(n_mesh):
    return ParameterServer(dict(
        max_keypoints=128, tpu_max_nodes=16, tpu_max_edges=256,
        tpu_candidate_batch=4, ransac_iterations=64, min_matches=12,
        keep_all_nodes=False, keep_good_nodes=True,
        tpu_mesh_devices=n_mesh, adjuster_max_iterations=0,
    ))


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_mesh_routes_product_compare():
    frames = _frames()
    mgr = GraphManager(CAM, _params(2))
    for k, (rgb, depth) in enumerate(frames):
        mgr.add_frame(rgb, depth, k / 30.0)
    # the sharded kernel was built and used (tpu_mesh_devices changed
    # behavior), and the graph tracked normally through it
    assert mgr._sharded_cmp is not None
    assert mgr.n_nodes >= 5
    assert mgr.n_seq_edges >= 4
    # trajectory is finite and contiguous
    poses = mgr.poses()
    assert np.isfinite(poses).all()


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_mesh_matches_single_device_decisions():
    """Same frames, mesh vs single device: accepted-edge structure agrees
    (RANSAC draws differ by key-splitting, so poses may differ slightly —
    the decision pattern must not)."""
    frames = _frames()
    m1 = GraphManager(CAM, _params(1))
    m2 = GraphManager(CAM, _params(2))
    for k, (rgb, depth) in enumerate(frames):
        m1.add_frame(rgb, depth, k / 30.0)
        m2.add_frame(rgb, depth, k / 30.0)
    assert m1.n_nodes == m2.n_nodes
    assert m1.n_seq_edges == m2.n_seq_edges
    # per-pose agreement within RANSAC stochasticity on an easy sequence
    d = np.linalg.norm(
        m1.poses()[:, :3, 3] - m2.poses()[:, :3, 3], axis=-1
    )
    assert d.max() < 0.05
