"""Wire-format tests for the packed per-frame ingest (compact_frame).

The yc12 format trades exactness for 3.4x fewer bytes on the tunnel link
(the throughput bound): 10/12-bit sqrt-coded stride-s depth + 4:2:0 chroma
at stride 4s + optional 6-bit dithered luma.
These tests pin the decode error budget and raw/yc12 behavioral parity.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from rgbdslam_v2_tpu.core.camera import Intrinsics
from rgbdslam_v2_tpu.graph.manager import (
    DEPTH_SCALE,
    _d12_lut,
    _pack12,
    _prepare_and_extract,
    _unpack_yc12,
    compact_frame,
)


def _cam(h=120, w=160):
    return Intrinsics(fx=130.0, fy=130.0, cx=w / 2, cy=h / 2, width=w, height=h)


def test_d12_roundtrip_error_budget():
    """Sqrt-coded 12-bit depth: absolute error <= sqrt(d16)/16 counts
    (half a quantization step), i.e. mm-scale in meters."""
    d16 = np.arange(0, 65536, 7, dtype=np.uint16)
    q = _d12_lut()[d16].astype(np.float64)
    back = q * q / 256.0
    err_counts = np.abs(back - d16.astype(np.float64))
    budget = np.maximum(np.sqrt(d16.astype(np.float64)) / 16.0, 0.51)
    # the 12-bit code saturates at q=4095 <=> d16 ~ 65520 (z = 13.10 m at
    # the TUM scale — beyond maximum_depth); below that the budget holds
    in_range = d16 <= 65504
    assert (err_counts[in_range] <= budget[in_range] + 1e-6).all()
    # zero is exact (invalid stays invalid)
    assert _d12_lut()[0] == 0


def test_pack12_unpack_device_exact():
    rng = np.random.default_rng(0)
    q = rng.integers(0, 4096, 4800).astype(np.uint16)
    packed = _pack12(q)
    b = jnp.asarray(packed).reshape(-1, 3).astype(jnp.uint32)
    q0 = b[:, 0] | ((b[:, 1] & 0x0F) << 8)
    q1 = (b[:, 1] >> 4) | (b[:, 2] << 4)
    out = np.asarray(jnp.stack([q0, q1], -1).reshape(-1))
    np.testing.assert_array_equal(out, q)


@pytest.mark.parametrize("depth_bits", [10, 12])
def test_yc12_unpack_depth_and_color(depth_bits):
    cam = _cam()
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 255, (cam.height, cam.width, 3), np.uint8)
    depth = rng.uniform(0.5, 6.0, (cam.height, cam.width)).astype(np.float32)
    packed = compact_frame(rgb, depth, 2, fmt="yc12", gray_bits=8,
                           depth_bits=depth_bits)
    gray8, depth_small, color = _unpack_yc12(
        jnp.asarray(packed), cam.height, cam.width, 2, gray_bits=8,
        depth_bits=depth_bits,
    )
    # depth: matches the stride-2 subsample within the quantizer budget:
    # |err| <= sqrt(d16)/16 counts at 12 bit, sqrt(d16)/4 at 10 bit
    ref = np.round(depth[::2, ::2] * DEPTH_SCALE) / DEPTH_SCALE
    err = np.abs(np.asarray(depth_small) - ref)
    z = ref
    divisor = 16.0 if depth_bits == 12 else 4.0
    assert (
        err <= (np.sqrt(z * DEPTH_SCALE) / divisor + 1.0) / DEPTH_SCALE
    ).all()
    # color: reconstruction within chroma-subsampling error on smooth areas;
    # a constant-color frame reconstructs near-exactly
    flat = np.full((cam.height, cam.width, 3), (200, 64, 120), np.uint8)
    packed2 = compact_frame(flat, depth, 2, fmt="yc12", gray_bits=8,
                            depth_bits=depth_bits)
    _, _, color2 = _unpack_yc12(
        jnp.asarray(packed2), cam.height, cam.width, 2, gray_bits=8,
        depth_bits=depth_bits,
    )
    assert np.abs(np.asarray(color2).astype(int) - flat[::2, ::2]).max() <= 3


def test_gray6_pack_roundtrip():
    """6-bit luma wire option: exact 6-bit roundtrip with bit-replication
    decode; max abs error vs the original u8 is one quantization step."""
    from rgbdslam_v2_tpu.graph.manager import _pack6

    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, 480 * 8, np.uint8)
    packed = _pack6(g)
    assert packed.nbytes == g.size * 3 // 4
    b = jnp.asarray(packed).reshape(-1, 3).astype(jnp.uint32)
    q = np.asarray(jnp.stack(
        [
            b[:, 0] & 0x3F,
            (b[:, 0] >> 6) | ((b[:, 1] & 0x0F) << 2),
            (b[:, 1] >> 4) | ((b[:, 2] & 0x03) << 4),
            b[:, 2] >> 2,
        ],
        axis=-1,
    ).reshape(-1))
    np.testing.assert_array_equal(q, g >> 2)
    recon = (q << 2) | (q >> 4)
    assert np.abs(recon.astype(int) - g.astype(int)).max() <= 4


def test_gray6_dither_unbiased():
    """Bayer dithering before the 6-bit truncation: over any flat 4x4 patch
    the decoded mean tracks the original within ~1 gray level (plain
    truncation biases by up to -3), and per-pixel error stays within one
    quantization step."""
    from rgbdslam_v2_tpu.graph.manager import _dither6

    H, W = 32, 64
    for level in (37, 100, 201, 254):
        g = np.full((H, W), level, np.uint8)
        q = (_dither6(g) >> 2).astype(np.int32)
        recon = (q << 2) | (q >> 4)
        err = recon - int(level)
        assert np.abs(err.mean()) <= 1.2, (level, err.mean())
        assert np.abs(err).max() <= 4
    # gradient image: decoded image correlates tightly with the original
    ramp = np.tile(np.arange(W, dtype=np.uint8) * 4, (H, 1))
    q = (_dither6(ramp) >> 2).astype(np.int32)
    recon = (q << 2) | (q >> 4)
    assert np.abs(recon - ramp.astype(np.int32)).mean() < 2.0


def test_gray5_pack_roundtrip():
    """5-bit luma wire option: exact 5-bit roundtrip through the device
    decoder's bit layout; max abs error vs the original u8 is one step."""
    from rgbdslam_v2_tpu.graph.manager import _pack5, _unpack_yc12

    rng = np.random.default_rng(9)
    H, W = 8, 16
    g = rng.integers(0, 256, (H, W)).astype(np.uint8)
    packed = _pack5(g.reshape(-1))
    assert packed.nbytes == g.size * 5 // 8
    # splice the luma bytes into a full yc12 buffer (zero depth/chroma)
    n_d = (H // 2) * (W // 2) // 4 * 5
    n_c = 2 * (H // 4) * (W // 4)
    buf = np.concatenate([packed, np.zeros(n_d + n_c, np.uint8)])
    gray8, _, _ = _unpack_yc12(jnp.asarray(buf), H, W, 2, gray_bits=5)
    q = np.asarray(gray8)
    np.testing.assert_array_equal(q >> 3, g >> 3)  # exact 5-bit codes
    assert np.abs(q.astype(int) - g.astype(int)).max() <= 8


def test_gray5_dither_unbiased():
    """Bayer dithering scaled to the 5-bit step keeps the decoded mean
    within ~1.5 gray levels of the original on flat patches (plain
    truncation biases by up to -7)."""
    from rgbdslam_v2_tpu.graph.manager import _dither6

    H, W = 32, 64
    for level in (37, 100, 201, 254):
        g = np.full((H, W), level, np.uint8)
        q = (_dither6(g, bits=5) >> 3).astype(np.int32)
        recon = (q << 3) | (q >> 2)
        err = recon - int(level)
        assert np.abs(err.mean()) <= 1.6, (level, err.mean())
        assert np.abs(err).max() <= 8


def test_gray5_ingest_extracts():
    """gray_bits=5 end-to-end through _prepare_and_extract: keypoints still
    fire on a textured frame and the depth path is unaffected."""
    from rgbdslam_v2_tpu.io import SyntheticWorld
    from rgbdslam_v2_tpu.models.orb import OrbExtractor

    cam = _cam()
    world = SyntheticWorld.create(seed=0, texture_size=256, cam=cam)
    T = world.orbit_trajectory(4, seed=1)[1]
    rgb_f, depth = world.render(T)
    rgb = (np.asarray(rgb_f) * 255).astype(np.uint8)
    ext = OrbExtractor(max_keypoints=128, n_levels=3)
    packed = compact_frame(rgb, np.asarray(depth), 2, fmt="yc12", gray_bits=5)
    kp, ds, _ = _prepare_and_extract(
        ext, cam, 2, 0.1, 10.0, False, jnp.asarray(packed),
        fmt="yc12", gray_bits=5,
    )
    packed8 = compact_frame(rgb, np.asarray(depth), 2, fmt="yc12",
                            gray_bits=8)
    kp8, ds8, _ = _prepare_and_extract(
        ext, cam, 2, 0.1, 10.0, False, jnp.asarray(packed8), fmt="yc12",
        gray_bits=8,
    )
    n5 = int(np.asarray(kp.valid).sum())
    n8 = int(np.asarray(kp8.valid).sum())
    assert n5 >= int(0.7 * n8), (n5, n8)
    np.testing.assert_allclose(np.asarray(ds), np.asarray(ds8))


def test_gray6_ingest_extracts():
    """gray_bits=6 end-to-end through _prepare_and_extract: keypoints still
    fire on a textured frame and depth path is unaffected."""
    from rgbdslam_v2_tpu.io import SyntheticWorld
    from rgbdslam_v2_tpu.models.orb import OrbExtractor

    cam = _cam()
    world = SyntheticWorld.create(seed=0, texture_size=256, cam=cam)
    T = world.orbit_trajectory(4, seed=1)[1]
    rgb_f, depth = world.render(T)
    rgb = (np.asarray(rgb_f) * 255).astype(np.uint8)
    ext = OrbExtractor(max_keypoints=128, n_levels=3)
    packed = compact_frame(rgb, np.asarray(depth), 2, fmt="yc12", gray_bits=6)
    kp, ds, _ = _prepare_and_extract(
        ext, cam, 2, 0.1, 10.0, False, jnp.asarray(packed),
        fmt="yc12", gray_bits=6,
    )
    packed8 = compact_frame(rgb, np.asarray(depth), 2, fmt="yc12",
                            gray_bits=8)
    kp8, ds8, _ = _prepare_and_extract(
        ext, cam, 2, 0.1, 10.0, False, jnp.asarray(packed8), fmt="yc12",
        gray_bits=8,
    )
    n6 = int(np.asarray(kp.valid).sum())
    n8 = int(np.asarray(kp8.valid).sum())
    assert n6 >= int(0.8 * n8), (n6, n8)
    np.testing.assert_allclose(np.asarray(ds), np.asarray(ds8))


def test_yc12_matches_raw_keypoints(monkeypatch):
    """The extracted keypoints from yc12 and raw ingest agree: identical
    detector input (gray is bit-identical), depth differs only by the
    12-bit quantization. The native C encoder is bypassed so both formats
    derive luma from the same (cv2) converter — the wire formats are what
    is under test here; native-vs-numpy byte equality lives in
    test_native_compact.py."""
    from rgbdslam_v2_tpu.io import SyntheticWorld, native_loader
    from rgbdslam_v2_tpu.models.orb import OrbExtractor

    monkeypatch.setattr(native_loader, "compact_yc12", lambda *a: None)
    cam = _cam()
    world = SyntheticWorld.create(seed=0, texture_size=256, cam=cam)
    T = world.orbit_trajectory(4, seed=1)[2]
    rgb_f, depth = world.render(T)
    rgb = (np.asarray(rgb_f) * 255).astype(np.uint8)
    depth = np.asarray(depth)
    ext = OrbExtractor(max_keypoints=128, n_levels=3)
    outs = {}
    for fmt in ("raw", "yc12"):
        packed = compact_frame(rgb, depth, 2, fmt=fmt, gray_bits=8)
        kp, ds, _ = _prepare_and_extract(
            ext, cam, 2, 0.1, 10.0, False, jnp.asarray(packed), fmt=fmt,
            gray_bits=8,
        )
        outs[fmt] = (kp, np.asarray(ds))
    kp_r, ds_r = outs["raw"]
    kp_y, ds_y = outs["yc12"]
    # same detector input -> same pixel locations for the valid set
    np.testing.assert_allclose(
        np.asarray(kp_y.uv)[np.asarray(kp_y.valid)],
        np.asarray(kp_r.uv)[np.asarray(kp_r.valid)],
        atol=1e-4,
    )
    # depth maps agree to the quantization budget
    both = (ds_r > 0) & (ds_y > 0)
    assert np.abs(ds_r - ds_y)[both].max() < 0.01
    # keypoint z within mm-scale where both valid
    vr = np.asarray(kp_r.valid) & np.asarray(kp_y.valid)
    dz = np.abs(np.asarray(kp_y.xyz)[:, 2] - np.asarray(kp_r.xyz)[:, 2])[vr]
    assert dz.max() < 0.02
