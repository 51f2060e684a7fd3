"""GraphManager capability tests: odometry, global loop closing, empirical
covariances, delete/sanity/checkpoint."""
import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.heavy  # excluded from the <2 min smoke tier

from rgbdslam_v2_tpu.config import ParameterServer
from rgbdslam_v2_tpu.core import se3
from rgbdslam_v2_tpu.core.camera import Intrinsics
from rgbdslam_v2_tpu.graph.odometry import OdometryProvider, odometry_information
from rgbdslam_v2_tpu.io import SyntheticWorld, render_sequence
from rgbdslam_v2_tpu.pipeline import SlamPipeline

CAM = Intrinsics(fx=130.0, fy=130.0, cx=80.0, cy=60.0, width=160, height=120)
N = 12


@pytest.fixture(scope="module")
def seq():
    world = SyntheticWorld.create(seed=0, texture_size=256, cam=CAM)
    poses, rgbs, depths = render_sequence(world, N, seed=2)
    stamps = np.arange(N) / 30.0
    return poses, rgbs, depths, stamps


def _params(**over):
    base = dict(
        max_keypoints=256,
        tpu_max_nodes=32,
        tpu_max_edges=256,
        tpu_candidate_batch=4,
        ransac_iterations=128,
        min_matches=12,
        optimizer_skip_step=100,
        keep_all_nodes=True,
        observability_threshold=0.5,
    )
    base.update(over)
    return ParameterServer(base)


def test_odometry_provider_interpolates():
    stamps = [0.0, 1.0]
    poses = np.stack([np.eye(4, dtype=np.float32)] * 2)
    poses[1][0, 3] = 1.0
    prov = OdometryProvider(stamps, poses)
    mid = prov.lookup(0.5)
    assert abs(mid[0, 3] - 0.5) < 1e-5
    d = prov.delta(0.25, 0.75)
    assert abs(d[0, 3] - 0.5) < 1e-5
    info = odometry_information(0.1, 1e6)
    assert info.shape == (6, 6) and info[0, 0] == pytest.approx(1000.0)


def test_odometry_only_mode(seq):
    poses, rgbs, depths, stamps = seq
    p = _params(use_robot_odom_only=True)
    pipe = SlamPipeline(CAM, p)
    pipe.manager.set_odometry_provider(OdometryProvider(stamps, poses))
    pipe.run_arrays(rgbs, depths, stamps, gt_poses=poses)
    assert pipe.manager.n_nodes == N
    # with exact odometry the trajectory is exact
    est = pipe.manager.poses()
    np.testing.assert_allclose(est[:, :3, 3], poses[:N, :3, 3], atol=1e-3)
    from rgbdslam_v2_tpu.graph.manager import EDGE_ODOMETRY

    assert all(t == EDGE_ODOMETRY for t in pipe.manager.edge_types)


def test_visual_plus_odometry_edges(seq):
    poses, rgbs, depths, stamps = seq
    p = _params(use_robot_odom=True)
    pipe = SlamPipeline(CAM, p)
    pipe.manager.set_odometry_provider(OdometryProvider(stamps, poses))
    pipe.run_arrays(rgbs[:6], depths[:6], stamps[:6], gt_poses=poses)
    from rgbdslam_v2_tpu.graph.manager import EDGE_ODOMETRY

    types = pipe.manager.edge_types
    assert any(t == EDGE_ODOMETRY for t in types)
    assert any(t != EDGE_ODOMETRY for t in types)


def test_global_loop_retrieval(seq):
    poses, rgbs, depths, stamps = seq
    pipe = SlamPipeline(CAM, _params())
    pipe.run_arrays(rgbs[:8], depths[:8], stamps[:8], gt_poses=poses)
    mgr = pipe.manager
    from rgbdslam_v2_tpu.graph.loop_closing import retrieve_loop_candidates

    # query with node 0's own keypoints: nearby early nodes should win
    from rgbdslam_v2_tpu.models.types import Keypoints

    kp = Keypoints(
        uv=mgr.store.uv[0],
        xyz=mgr.store.xyz[0],
        score=jnp.ones(mgr.k_cap),
        theta=jnp.zeros(mgr.k_cap),
        desc=mgr.store.desc[0],
        valid=mgr.store.kp_valid[0],
        level=jnp.zeros(mgr.k_cap, jnp.int32),
    )
    hits = retrieve_loop_candidates(kp, mgr.store, mgr.n_nodes, exclude_ids=[0], top_n=3)
    assert len(hits) >= 1
    assert 1 in hits  # the temporally adjacent frame sees the same scene


def test_empirical_covariances_change_info(seq):
    poses, rgbs, depths, stamps = seq
    pipe = SlamPipeline(CAM, _params())
    pipe.run_arrays(rgbs[:6], depths[:6], stamps[:6], gt_poses=poses)
    mgr = pipe.manager
    active = np.asarray(mgr.graph.edge_active)
    before = np.asarray(mgr.graph.edge_info)[active].copy()
    mgr.set_empirical_covariances()
    after = np.asarray(mgr.graph.edge_info)[active]
    assert not np.allclose(before, after)
    # still positive diagonals on active edges
    assert (np.einsum("eii->e", after) > 0).all()
    # inactive slots untouched (zero info)
    tail = np.asarray(mgr.graph.edge_info)[~active]
    assert np.allclose(tail, 0)


def test_delete_sanity_checkpoint(tmp_path, seq):
    poses, rgbs, depths, stamps = seq
    pipe = SlamPipeline(CAM, _params())
    pipe.run_arrays(rgbs[:6], depths[:6], stamps[:6], gt_poses=poses)
    mgr = pipe.manager
    assert mgr.sanity_check() == []
    n0 = mgr.n_nodes
    mgr.delete_last_frame()
    assert mgr.n_nodes == n0 - 1
    assert mgr.sanity_check() == []
    foot = mgr.memory_footprint()
    assert foot["node_store_bytes"] > 0
    # checkpoint round trip
    path = tmp_path / "state.npz"
    mgr.save_state(path)
    pipe2 = SlamPipeline(CAM, _params())
    pipe2.manager.load_state(path)
    assert pipe2.manager.n_nodes == mgr.n_nodes
    np.testing.assert_allclose(pipe2.manager.poses(), mgr.poses(), atol=1e-6)
    assert pipe2.manager.edge_pairs == mgr.edge_pairs
