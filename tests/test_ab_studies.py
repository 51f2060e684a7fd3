"""In-repo A/B studies (VERDICT r2 #4/#9).

1. EMM pooled fast path vs the reference's exact 9-sample search, end to
   end: same frames, both paths, ATE compared — bounds the accuracy cost
   of the pooled approximation under the full protocol.
2. ICP rescue on a textureless revisit: visual matching fails, dense
   point-to-plane ICP (EMM-gated) recovers the predecessor edge AND a
   loop-candidate edge (node.cpp:1381-1413 runs per matchNodePair);
   without use_icp the same frames degrade to constant-position fallback.
"""
import numpy as np
import pytest

from rgbdslam_v2_tpu.config import ParameterServer
from rgbdslam_v2_tpu.core.camera import Intrinsics
from rgbdslam_v2_tpu.eval import evaluate_ate
from rgbdslam_v2_tpu.graph.manager import EDGE_CONST_POSITION, EDGE_LOOP, GraphManager
from rgbdslam_v2_tpu.io import SyntheticWorld, render_sequence

pytestmark = pytest.mark.heavy

CAM = Intrinsics(fx=130.0, fy=130.0, cx=80.0, cy=60.0, width=160, height=120)


def test_emm_pooled_vs_exact_e2e_ate():
    """Same noisy sequence through both EMM paths; the pooled
    approximation's end-to-end ATE cost must be negligible."""
    world = SyntheticWorld.create(seed=0, cam=CAM)
    poses, rgbs, depths = render_sequence(world, 30, seed=2,
                                          depth_noise_sigma=0.01)
    poses = np.asarray(poses)
    stamps = np.arange(30) / 30.0
    ates = {}
    for exact in (False, True):
        params = ParameterServer(dict(
            max_keypoints=256, tpu_max_nodes=64, tpu_max_edges=1024,
            tpu_candidate_batch=4, ransac_iterations=128,
            keep_all_nodes=True, observability_threshold=0.5,
            optimizer_skip_step=10, tpu_emm_exact=exact,
            adjuster_max_iterations=0,
        ))
        mgr = GraphManager(CAM, params)
        for k in range(30):
            rgb = (np.asarray(rgbs[k]) * 255).astype(np.uint8) \
                if rgbs[k].dtype != np.uint8 else rgbs[k]
            mgr.add_frame(rgb, np.asarray(depths[k]), float(stamps[k]),
                          poses[0] if k == 0 else None)
        mgr.optimize(blocking=True)
        est = mgr.poses()
        res = evaluate_ate(list(stamps[: mgr.n_nodes]), est[:, :3, 3],
                           list(stamps), poses[:, :3, 3])
        ates[exact] = res.rmse
    print(f"[A/B] EMM pooled ATE {ates[False]:.4f} m, "
          f"exact ATE {ates[True]:.4f} m")
    assert ates[False] < 0.05 and ates[True] < 0.05
    # approximation cost bounded: within 5 mm or 30% of each other
    assert abs(ates[False] - ates[True]) < max(0.005, 0.3 * ates[True])


def _revisit_frames():
    """7 textured frames along an orbit + 1 textureless (darkened) revisit
    of frame 0's exact viewpoint: features die, depth survives."""
    world = SyntheticWorld.create(seed=0, texture_size=256, cam=CAM)
    poses = world.orbit_trajectory(7, seed=2)
    frames = []
    for T in poses:
        rgb, depth = world.render(T)
        frames.append(((np.asarray(rgb) * 255).astype(np.uint8),
                       np.asarray(depth)))
    rgb0, depth0 = world.render(poses[0])
    dark = (np.asarray(rgb0) * 8).astype(np.uint8)  # ~3% contrast
    frames.append((dark, np.asarray(depth0)))
    return frames


def _run(use_icp):
    params = ParameterServer(dict(
        max_keypoints=256, tpu_max_nodes=16, tpu_max_edges=256,
        tpu_candidate_batch=4, ransac_iterations=128, min_matches=12,
        keep_all_nodes=True, use_icp=use_icp, icp_max_iterations=12,
        predecessor_candidates=2, min_sampled_candidates=2,
        geodesic_depth=1,  # candidates >1 hop from pred classify as loops
        observability_threshold=0.5, adjuster_max_iterations=0,
        min_translation_meter=0.001,  # force the slow path (ICP lives there)
        min_rotation_degree=0.0,
    ))
    mgr = GraphManager(CAM, params)
    frames = _revisit_frames()
    for k, (rgb, depth) in enumerate(frames[:-1]):
        mgr.add_frame(rgb, depth, k / 30.0)
    # deterministic candidate set for the revisit frame: predecessor (whose
    # viewpoint is far — dense ICP correctly diverges) + node 0 (the exact
    # revisited viewpoint — ICP converges from the identity seed). Random
    # keyframe sampling would make node 0's presence flaky.
    orig = mgr.select_candidates
    mgr.select_candidates = lambda new_id, kp=None: [new_id - 1, 0]
    try:
        rgb, depth = frames[-1]
        mgr.add_frame(rgb, depth, (len(frames) - 1) / 30.0)
    finally:
        mgr.select_candidates = orig
    return mgr


def test_icp_rescues_textureless_revisit_with_loop_edge():
    mgr = _run(use_icp=True)
    icp_decisions = [d for d in mgr.last_decisions if d.reason == "icp"]
    assert icp_decisions, "ICP rescue never fired on the textureless frame"
    # the revisit frame must carry at least one ICP edge to a NON-adjacent
    # node (the loop candidate), not just the predecessor
    last = mgr.n_nodes - 1
    icp_cands = {d.cand_id for d in icp_decisions}
    assert any(last - c > 2 for c in icp_cands), icp_cands
    loop_edges = [
        t for t, pair in zip(mgr.edge_types, mgr.edge_pairs)
        if pair is not None and pair[1] == last and t == EDGE_LOOP
    ]
    assert loop_edges, "no loop-type edge written for the rescued revisit"


def test_icp_cost_benefit_vs_fallback():
    """Without use_icp the textureless revisit degrades to a
    constant-position fallback edge; with it, metric edges replace the
    fallback (the in-repo cost/benefit record for the rescue path)."""
    m_off = _run(use_icp=False)
    m_on = _run(use_icp=True)
    last_off = m_off.n_nodes - 1
    last_on = m_on.n_nodes - 1

    def edge_types_to(mgr, nid):
        return [
            t for t, pair in zip(mgr.edge_types, mgr.edge_pairs)
            if pair is not None and pair[1] == nid
        ]

    types_off = edge_types_to(m_off, last_off)
    types_on = edge_types_to(m_on, last_on)
    print(f"[A/B] ICP off edges: {types_off}; on: {types_on}")
    assert EDGE_CONST_POSITION in types_off
    assert EDGE_CONST_POSITION not in types_on
    assert len(types_on) >= 1
