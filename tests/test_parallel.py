"""Sharding tests on the virtual 8-device CPU mesh (see conftest)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbdslam_v2_tpu.parallel import candidate_mesh, sharded_lm_iteration
from rgbdslam_v2_tpu.parallel.sharded import sharded_optimize



pytestmark = pytest.mark.heavy  # excluded from the <2 min smoke tier

@pytest.fixture(scope="module")
def mesh():
    # The env's TPU plugin ignores JAX_PLATFORMS, so ask for CPU explicitly:
    # XLA_FLAGS in conftest provides 8 virtual host devices.
    assert len(jax.devices("cpu")) >= 8, "conftest must provide 8 virtual devices"
    return candidate_mesh(8, platform="cpu")


def _loop_graph():
    from tests.test_pose_graph import _build_loop_graph

    return _build_loop_graph(n_nodes=20, drift=0.02)


def test_sharded_lm_matches_single_device(mesh):
    g, gt, init = _loop_graph()
    # single-device reference
    from rgbdslam_v2_tpu.optim.pose_graph import lm_iteration

    g1, lam1, cb1, ca1 = lm_iteration(g, jnp.asarray(1e-4), 1.0, 32)
    g8, lam8, cb8, ca8 = sharded_lm_iteration(mesh, g, jnp.asarray(1e-4), 1.0, 32)
    assert abs(float(cb1) - float(cb8)) < 1e-2 * max(float(cb1), 1.0)
    # same chi2 decrease (identical math, just distributed reduction order)
    assert abs(float(ca1) - float(ca8)) < 5e-2 * max(float(ca1), 1.0)
    np.testing.assert_allclose(
        np.asarray(g1.poses[:20]), np.asarray(g8.poses[:20]), atol=1e-3
    )


def test_sharded_optimize_closes_loop(mesh):
    g, gt, init = _loop_graph()
    from rgbdslam_v2_tpu.optim.pose_graph import edge_chi2

    chi2_before = float(jnp.sum(edge_chi2(g)))
    g2, chi2 = sharded_optimize(mesh, g, iterations=20)
    assert float(chi2) < chi2_before * 0.1


def test_sharded_compare_runs(mesh):
    """Candidate fan-out sharded over 8 devices on tiny shapes."""
    from rgbdslam_v2_tpu.core.camera import Intrinsics
    from rgbdslam_v2_tpu.graph.node_store import NodeStore
    from rgbdslam_v2_tpu.models.types import Keypoints
    from rgbdslam_v2_tpu.parallel import sharded_compare

    K, D = 64, 256
    rng = np.random.default_rng(0)
    cam_small = Intrinsics(fx=65.0, fy=65.0, cx=20.0, cy=15.0, width=40, height=30)

    def rand_kp(seed):
        r = np.random.default_rng(seed)
        desc = np.where(r.uniform(size=(K, D)) > 0.5, 1, -1).astype(np.int8)
        xyz = np.stack(
            [r.uniform(-1, 1, K), r.uniform(-1, 1, K), r.uniform(1, 3, K)], -1
        ).astype(np.float32)
        return Keypoints(
            uv=jnp.zeros((K, 2)),
            xyz=jnp.asarray(xyz),
            score=jnp.ones(K),
            theta=jnp.zeros(K),
            desc=jnp.asarray(desc),
            valid=jnp.ones(K, bool),
            level=jnp.zeros(K, jnp.int32),
        )

    store = NodeStore.create(16, K, D, 30, 40)
    kp0 = rand_kp(1)
    depth = jnp.ones((30, 40), jnp.float32) * 2.0
    for i in range(8):
        store = store.insert(i, rand_kp(1), depth, jnp.zeros((30, 40, 3), jnp.uint8))

    res = sharded_compare(
        mesh,
        kp0,
        depth,
        store,
        jnp.arange(8, dtype=jnp.int32),
        jax.random.PRNGKey(0),
        cam_small,
        max_matches=32,
        n_hypotheses=32,
        min_inliers=8,
    )
    assert res.transform.shape == (8, 4, 4)
    # identical descriptors + identical geometry -> identity transform found
    ok = np.asarray(res.ransac_ok)
    assert ok.all()
    t = np.asarray(res.transform)
    assert np.abs(t[:, :3, 3]).max() < 1e-2


def test_multi_sequence_sharded_eval(mesh):
    """One sequence per device (SURVEY §2.3): sequential VO sharded over the
    mesh recovers each sequence's trajectory."""
    from rgbdslam_v2_tpu.config import ParameterServer
    from rgbdslam_v2_tpu.core.camera import Intrinsics
    from rgbdslam_v2_tpu.io import SyntheticWorld, render_sequence
    from rgbdslam_v2_tpu.pipeline.batch_eval import evaluate_sequences_sharded

    cam = Intrinsics(fx=130.0, fy=130.0, cx=80.0, cy=60.0, width=160, height=120)
    seqs = []
    for s in range(2):
        world = SyntheticWorld.create(seed=s, texture_size=256, cam=cam)
        poses, rgbs, depths = render_sequence(world, 6, seed=10 + s)
        grays = np.stack([r.mean(-1).astype(np.float32) for r in rgbs])
        # gt in first-frame-relative coordinates (VO starts at identity)
        rel = np.linalg.inv(poses[0])[None] @ poses
        seqs.append((f"seq{s}", grays, np.stack(depths), rel))
    params = ParameterServer(
        dict(
            tpu_mesh_devices=2,
            max_keypoints=256,
            ransac_iterations=128,
            min_matches=10,
            max_matches=128,
        )
    )
    results = evaluate_sequences_sharded(seqs, cam, params, out_dir="/tmp/shard_eval")
    assert len(results) == 2
    for r in results:
        assert r.ate_by_level[0] < 0.02, f"{r.name} VO ATE {r.ate_by_level[0]}"
