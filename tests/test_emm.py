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
