import jax.numpy as jnp
import numpy as np

from rgbdslam_v2_tpu.core import se3
from rgbdslam_v2_tpu.core.camera import Intrinsics
from rgbdslam_v2_tpu.core.frames import make_frame
from rgbdslam_v2_tpu.io import SyntheticWorld
from rgbdslam_v2_tpu.ops.emm import (
    observation_criterion_met,
    observation_likelihood,
    pairwise_observation_likelihood,
)

CAM = Intrinsics(fx=130.0, fy=130.0, cx=80.0, cy=60.0, width=160, height=120)


def _two_frames(di=1):
    world = SyntheticWorld.create(seed=0, texture_size=128, cam=CAM)
    poses = world.orbit_trajectory(60, seed=2)
    Ta, Tb = poses[0], poses[di]
    rgb_a, depth_a = world.render(Ta)
    rgb_b, depth_b = world.render(Tb)
    fa = make_frame((rgb_a * 255).astype(jnp.uint8), depth_a, CAM)
    fb = make_frame((rgb_b * 255).astype(jnp.uint8), depth_b, CAM)
    return fa, fb, se3.relative(Ta, Tb)  # a_T_b


def test_emm_accepts_true_transform():
    fa, fb, a_T_b = _two_frames()
    res = observation_likelihood(a_T_b, fb.points, fb.valid, fa.depth, CAM)
    assert int(res.all_projected) > 500
    assert float(res.quality) > 0.9
    assert bool(observation_criterion_met(res, 0.6))


def test_emm_rejects_wrong_transform():
    """The combined criterion (quality + inlier fraction) must separate a
    good transform from a gross misregistration; quality alone can stay
    high when the wrong transform makes everything 'occluded' (unpenalized),
    which is exactly why the reference also gates on inliers/all > 0.25
    (misc.cpp:1136-1148)."""
    fa, fb, a_T_b = _two_frames()
    bad = a_T_b @ np.asarray(
        se3.exp_se3(jnp.asarray([1.2, 0.0, -0.72, 0.0, 0.9, 0.0], jnp.float32))
    )
    res_good = observation_likelihood(a_T_b, fb.points, fb.valid, fa.depth, CAM)
    res_bad = observation_likelihood(jnp.asarray(bad), fb.points, fb.valid, fa.depth, CAM)
    assert float(res_bad.quality) < float(res_good.quality) - 0.1
    frac_good = int(res_good.inliers) / max(int(res_good.all_projected), 1)
    frac_bad = int(res_bad.inliers) / max(int(res_bad.all_projected), 1)
    assert frac_bad < frac_good - 0.2
    # a strict threshold separates them through the criterion
    assert bool(observation_criterion_met(res_good, 0.9))
    assert not bool(observation_criterion_met(res_bad, 0.9))


def test_emm_identity_on_same_frame_perfect():
    fa, _, _ = _two_frames()
    res = observation_likelihood(jnp.eye(4), fa.points, fa.valid, fa.depth, CAM)
    assert float(res.quality) > 0.99
    assert int(res.outliers) < int(res.all_projected) * 0.01


def test_pairwise_emm_bidirectional():
    fa, fb, a_T_b = _two_frames()
    res = pairwise_observation_likelihood(
        se3.inv(a_T_b),
        fb.points,
        fb.valid,
        fb.depth,
        fa.points,
        fa.valid,
        fa.depth,
        CAM,
    )
    assert float(res.quality) > 0.9
    assert int(res.all_projected) > 1000


def test_criterion_disabled_below_zero():
    from rgbdslam_v2_tpu.ops.emm import EmmResult

    res = EmmResult(
        inliers=jnp.asarray(0),
        outliers=jnp.asarray(100),
        occluded=jnp.asarray(0),
        all_projected=jnp.asarray(100),
        quality=jnp.asarray(0.0),
    )
    assert bool(observation_criterion_met(res, 0.0))
    assert not bool(observation_criterion_met(res, 0.5))


# ---------------------------------------------------------------------------
# Pooled fast path vs the exact 9-sample reference semantics (misc.cpp:889-929)
# ---------------------------------------------------------------------------
def _flat_scene(z=2.0, w=64, h=48):
    cam = Intrinsics(fx=50.0, fy=50.0, cx=w / 2, cy=h / 2, width=w, height=h)
    from rgbdslam_v2_tpu.core.camera import backproject_grid

    depth = jnp.full((h, w), z, jnp.float32)
    points = backproject_grid(depth, cam)
    valid = depth > 0
    return cam, depth, points, valid


def test_exact_matches_pool_on_smooth_scene():
    from rgbdslam_v2_tpu.ops.emm import observation_likelihood_exact

    cam, depth, points, valid = _flat_scene()
    T = jnp.eye(4)
    pool = observation_likelihood(T, points, valid, depth, cam)
    exact = observation_likelihood_exact(T, points, valid, depth, cam)
    assert int(pool.inliers) == int(exact.inliers)
    assert int(pool.outliers) == int(exact.outliers) == 0
    assert bool(observation_criterion_met(pool, 0.5))
    assert bool(observation_criterion_met(exact, 0.5))


def test_pool_is_permissive_superset_at_discontinuity():
    """At a depth step edge the pooled path counts gap points as inliers
    (z_pred inside [window_min, window_max]) where the exact search calls
    them occluded — pool inliers must be a superset, and the exact path must
    flag the occlusions (VERDICT weak #3: the approximation's failure mode,
    quantified)."""
    from rgbdslam_v2_tpu.core.camera import backproject_grid
    from rgbdslam_v2_tpu.ops.emm import observation_likelihood_exact

    w, h = 64, 48
    cam = Intrinsics(fx=50.0, fy=50.0, cx=w / 2, cy=h / 2, width=w, height=h)
    # old camera sees a step edge: near wall 1 m on the left, far wall 3 m
    old_depth = jnp.where(
        jnp.arange(w)[None, :] < w // 2, 1.0, 3.0
    ).astype(jnp.float32) * jnp.ones((h, w), jnp.float32)
    # new frame claims matter at 2 m everywhere: inside the [1,3] interval at
    # the edge (pool accepts), in front of the 3 m wall elsewhere-right
    # (outlier), behind the 1 m wall elsewhere-left (occluded)
    new_depth = jnp.full((h, w), 2.0, jnp.float32)
    points = backproject_grid(new_depth, cam)
    valid = new_depth > 0
    T = jnp.eye(4)
    pool = observation_likelihood(T, points, valid, old_depth, cam)
    exact = observation_likelihood_exact(T, points, valid, old_depth, cam)
    assert int(pool.inliers) >= int(exact.inliers)
    assert int(exact.inliers) == 0  # no sample is within gate of 2 m
    assert int(exact.occluded) > 0  # the 1 m wall is in front
    assert int(exact.outliers) > 0  # the 3 m wall contradicts 2 m matter
    # pool's extra "inliers" are only the edge-window gap points
    assert int(pool.inliers) < int(pool.all_projected) // 4
    # both reject this transform under the criterion
    assert not bool(observation_criterion_met(pool, 0.5))
    assert not bool(observation_criterion_met(exact, 0.5))


def test_exact_and_pool_agree_on_rendered_frames():
    """On real rendered geometry (includes box edges = discontinuities) the
    criterion decision must agree between the two paths for the true
    transform, and inlier counts must satisfy the superset property."""
    from rgbdslam_v2_tpu.ops.emm import observation_likelihood_exact

    fa, fb, a_T_b = _two_frames()
    pool = observation_likelihood(a_T_b, fb.points, fb.valid, fa.depth, CAM)
    exact = observation_likelihood_exact(
        a_T_b, fb.points, fb.valid, fa.depth, CAM
    )
    assert int(pool.inliers) >= int(exact.inliers)
    # the overwhelmingly-smooth scene keeps them within a few percent
    assert int(pool.inliers) <= int(exact.inliers) * 1.05 + 5
    assert bool(observation_criterion_met(pool, 0.5)) == bool(
        observation_criterion_met(exact, 0.5)
    )


def test_rejection_significance_orders_transforms():
    """The chi^2 p-value variant (misc.cpp:974-1134): a wrong transform must
    score a (much) higher rejection significance than the true one."""
    from rgbdslam_v2_tpu.ops.emm import rejection_significance

    fa, fb, a_T_b = _two_frames()
    p_true = float(
        rejection_significance(a_T_b, fb.points, fb.valid, fa.depth, CAM)
    )
    bad = a_T_b.at[2, 3].add(0.5)  # half a meter of depth error
    p_bad = float(
        rejection_significance(bad, fb.points, fb.valid, fa.depth, CAM)
    )
    assert 0.0 <= p_true <= 1.0
    assert p_bad > 0.999  # overwhelming evidence against
    assert p_bad > p_true


def test_store_row_lookup_equals_plane_lookup():
    """The combined store-row gather (old_lohi + old_lohi_row, the compare
    fast path) must classify identically to indexing the row's own (h, w)
    plane — same packed values, different gather formulation."""
    import jax.numpy as jnp

    from rgbdslam_v2_tpu.ops.emm import emm_pool_maps

    fa, fb, a_T_b = _two_frames()
    lohi = emm_pool_maps(fa.depth)
    n_rows = 4
    row = 2
    buf = jnp.zeros((n_rows, lohi.size), lohi.dtype).at[row].set(
        lohi.reshape(-1)
    )
    direct = observation_likelihood(
        a_T_b, fb.points, fb.valid, fa.depth, CAM, old_lohi=lohi
    )
    via_store = observation_likelihood(
        a_T_b, fb.points, fb.valid, fa.depth, CAM,
        old_lohi=buf, old_lohi_row=jnp.int32(row),
    )
    for f in ("inliers", "outliers", "occluded", "all_projected"):
        assert int(getattr(direct, f)) == int(getattr(via_store, f))
