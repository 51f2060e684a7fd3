"""Native yc12 wire encoder (native/compact_ingest.cpp) vs the numpy path.

The C encoder must be BIT-EXACT against the numpy packer in
graph.manager.compact_frame (same dither, depth quantization, packing,
chroma rounding) so switching between them never changes device behavior.
Gray uses the numpy-fallback BT.601 formula, so the comparison forces the
fallback (cv2's SIMD cvtColor differs by at most 1 LSB and is replaced
entirely when the native encoder is available).
"""
import sys

import numpy as np
import pytest

from rgbdslam_v2_tpu.graph import manager as mgr
from rgbdslam_v2_tpu.io import native_loader


pytestmark = pytest.mark.skipif(
    not native_loader.native_available(), reason="native toolchain missing"
)


def _numpy_pack(monkeypatch, rgb, depth, stride, gray_bits, depth_bits=10):
    """compact_frame forced onto the pure-numpy path (no native, no cv2)."""
    monkeypatch.setattr(native_loader, "compact_yc12", lambda *a: None)
    monkeypatch.setitem(sys.modules, "cv2", None)  # import cv2 -> ImportError
    return mgr.compact_frame(rgb, depth, stride, fmt="yc12",
                             gray_bits=gray_bits, depth_bits=depth_bits)


@pytest.mark.parametrize("gray_bits", [5, 6, 8])
@pytest.mark.parametrize("depth_bits", [10, 12])
@pytest.mark.parametrize("depth_kind", ["u16", "f32"])
def test_native_matches_numpy_bytes(monkeypatch, gray_bits, depth_bits,
                                    depth_kind):
    rng = np.random.default_rng(7)
    H, W = 120, 160
    rgb = rng.integers(0, 256, (H, W, 3), np.uint8)
    if depth_kind == "u16":
        depth = rng.integers(0, 40000, (H, W)).astype(np.uint16)
    else:
        depth = rng.uniform(0.0, 8.0, (H, W)).astype(np.float32)
        depth[0, :6] = [np.nan, np.inf, -np.inf, -1.0, 0.0, 20.0]
    native = native_loader.compact_yc12(rgb, depth, 2, gray_bits, depth_bits,
                                        4)
    assert native is not None
    ref = _numpy_pack(monkeypatch, rgb, depth, 2, gray_bits,
                      depth_bits=depth_bits)
    assert native.shape == ref.shape
    assert np.array_equal(native, ref)


def test_native_gray_input(monkeypatch):
    rng = np.random.default_rng(8)
    H, W = 120, 160
    gray = rng.integers(0, 256, (H, W), np.uint8)
    depth = rng.integers(0, 40000, (H, W)).astype(np.uint16)
    native = native_loader.compact_yc12(gray, depth, 2, 6)
    ref = _numpy_pack(monkeypatch, gray, depth, 2, 6)
    assert np.array_equal(native, ref)


def test_compact_frame_uses_native_by_default():
    """The product path routes yc12 through the C encoder when built."""
    rng = np.random.default_rng(9)
    H, W = 120, 160
    rgb = rng.integers(0, 256, (H, W, 3), np.uint8)
    depth = rng.integers(0, 40000, (H, W)).astype(np.uint16)
    # both sides at the package ingest defaults (8-bit luma / 12-bit depth)
    via_manager = mgr.compact_frame(rgb, depth, 2, fmt="yc12")
    direct = native_loader.compact_yc12(rgb, depth, 2, 8, 12)
    assert np.array_equal(via_manager, direct)
    # and at the delta-wire code space (6/10)
    via_manager = mgr.compact_frame(rgb, depth, 2, fmt="yc12",
                                    gray_bits=6, depth_bits=10)
    direct = native_loader.compact_yc12(rgb, depth, 2, 6, 10)
    assert np.array_equal(via_manager, direct)


def test_unsupported_layout_returns_none():
    depth = np.zeros((8, 8), np.float64)  # unsupported depth dtype
    rgb = np.zeros((8, 8, 3), np.uint8)
    assert native_loader.compact_yc12(rgb, depth, 2, 6) is None
