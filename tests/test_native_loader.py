"""Native C++ loader tests (build with g++/libpng; skip if unavailable)."""
import numpy as np
import pytest

from rgbdslam_v2_tpu.io.native_loader import (
    NativeTumLoader,
    decode_depth,
    decode_rgb,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain/libpng unavailable"
)

W, H = 80, 60


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    from rgbdslam_v2_tpu.core.camera import Intrinsics
    from rgbdslam_v2_tpu.io import SyntheticWorld, render_sequence
    from rgbdslam_v2_tpu.io.synthetic import save_as_tum_dataset

    cam = Intrinsics(fx=80.0, fy=80.0, cx=40.0, cy=30.0, width=W, height=H)
    world = SyntheticWorld.create(seed=0, texture_size=128, cam=cam)
    poses, rgbs, depths = render_sequence(world, 5, seed=2)
    out = tmp_path_factory.mktemp("seq")
    save_as_tum_dataset(out, poses, rgbs, depths)
    return out, rgbs, depths


def test_single_shot_decode_matches_cv2(tum_dir):
    out, rgbs, depths = tum_dir
    from rgbdslam_v2_tpu.io import TumDataset

    ds = TumDataset.open(out)
    ts, rgb_ref, depth_ref = ds.load(0)  # cv2 path
    rgb = decode_rgb(out / ds.pairs[0][1], W, H)
    depth = decode_depth(out / ds.pairs[0][3], W, H)
    np.testing.assert_array_equal(rgb, rgb_ref)
    np.testing.assert_allclose(depth, depth_ref, atol=1e-6)


def test_threaded_loader_order_and_content(tum_dir):
    out, rgbs, depths = tum_dir
    from rgbdslam_v2_tpu.io import TumDataset

    ds = TumDataset.open(out)
    loader = NativeTumLoader(ds, width=W, height=H, threads=3, queue_depth=2)
    frames = list(loader)
    assert len(frames) == 5
    for i, (ts, rgb, depth) in enumerate(frames):
        assert ts == ds.pairs[i][0]
        np.testing.assert_array_equal(rgb, rgbs[i])
        np.testing.assert_allclose(depth, depths[i], atol=1.0 / 5000.0)
    loader.close()
