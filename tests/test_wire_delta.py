"""Temporal-delta wire coding (tpu_wire_delta): closed-loop DPCM on the
yc12 wire codes (P-frames ship 4-bit luma + 5-bit depth-code residuals
against the previous frame's reconstruction; graph/manager.py delta_encode
/ _unpack_yc12_delta). The reference ships nothing per frame (sensor DMA
lands in host RAM, node.cpp:101-240); behind a serialized ~40 MB/s tunnel
the wire format is the ingest design, and delta coding is the round-4
throughput lever (336 -> 211 KB/frame at VGA/s2)."""
import numpy as np
import jax.numpy as jnp
import pytest

from rgbdslam_v2_tpu.config import ParameterServer
from rgbdslam_v2_tpu.core.camera import Intrinsics
from rgbdslam_v2_tpu.graph.manager import (
    GraphManager,
    _host_unpack_codes,
    _unpack_yc12,
    _unpack_yc12_delta,
    compact_frame,
    delta_encode,
    wire_delta_len,
    wire_intra_len,
)

H, W, S = 48, 64, 2
CAM = Intrinsics(fx=50.0, fy=50.0, cx=W / 2, cy=H / 2, width=W, height=H)


def _frame(seed, drift=0):
    """Smooth synthetic gray+depth pair; drift shifts content slightly."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    gray = (
        128
        + 80 * np.sin((xx + drift) / 9.0)
        + 40 * np.cos((yy - drift) / 7.0)
        + rng.normal(0, 1.5, (H, W))
    )
    gray8 = np.clip(gray, 0, 255).astype(np.uint8)
    d16 = (5000 + 1500 * np.sin((xx + yy + drift) / 11.0)).astype(np.uint16)
    return gray8, d16


def test_p_frame_roundtrip_matches_intra_when_unclamped():
    """With small inter-frame change every residual fits in its budget, so
    the P-frame reconstruction is BIT-IDENTICAL to shipping frame B as an
    absolute I-frame."""
    ga, da = _frame(0, drift=0)
    gb, db = _frame(0, drift=1)  # small shift: residuals well inside ±8/±16
    intra_a = compact_frame(ga, da, S, gray_bits=6, depth_bits=10)
    qg, qd = _host_unpack_codes(intra_a, H, W, S)
    out = delta_encode(gb, db, qg, qd, S, max_clamp=0.05)
    assert out is not None, "small drift should not trip the clamp budget"
    packed, new_qg, new_qd = out
    assert packed.size == wire_delta_len(H, W, S)
    assert packed.size < wire_intra_len(H, W, S)

    # device decode of the P frame, predicting from the I-frame codes
    gray_i, depth_i, color_i, codes_i = _unpack_yc12(
        jnp.asarray(intra_a), H, W, S, return_codes=True
    )
    gray_p, depth_p, color_p, codes_p = _unpack_yc12_delta(
        jnp.asarray(packed), H, W, S, codes_i
    )
    # reference: frame B shipped absolute
    intra_b = compact_frame(gb, db, S, gray_bits=6, depth_bits=10)
    gray_b, depth_b, color_b = _unpack_yc12(jnp.asarray(intra_b), H, W, S)
    np.testing.assert_array_equal(np.asarray(gray_p), np.asarray(gray_b))
    np.testing.assert_allclose(
        np.asarray(depth_p), np.asarray(depth_b), rtol=0, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(color_p), np.asarray(color_b))
    # device state == host mirror, bit for bit (closed loop)
    np.testing.assert_array_equal(np.asarray(codes_p[0]), new_qg)
    np.testing.assert_array_equal(np.asarray(codes_p[1]), new_qd)


def test_clamped_residuals_converge_without_divergence():
    """A change larger than one residual step converges over a few P-frames
    (clamped DPCM) while host mirror and device state stay identical."""
    ga, da = _frame(1)
    gb = np.clip(ga.astype(np.int16) + 40, 0, 255).astype(np.uint8)  # +10 q
    intra = compact_frame(ga, da, S, gray_bits=6, depth_bits=10)
    qg, qd = _host_unpack_codes(intra, H, W, S)
    codes_dev = _unpack_yc12(jnp.asarray(intra), H, W, S, return_codes=True)[3]
    for it in range(3):
        out = delta_encode(gb, da, qg, qd, S, max_clamp=1.1)  # never I
        assert out is not None
        packed, qg, qd = out
        _, _, _, codes_dev = _unpack_yc12_delta(
            jnp.asarray(packed), H, W, S, codes_dev
        )
        np.testing.assert_array_equal(np.asarray(codes_dev[0]), qg)
        np.testing.assert_array_equal(np.asarray(codes_dev[1]), qd)
    # +10 code steps at ±8/frame reach the target by the 2nd P-frame
    target = _host_unpack_codes(compact_frame(gb, da, S, gray_bits=6, depth_bits=10), H, W, S)[0]
    np.testing.assert_array_equal(qg, target)


def test_scene_cut_falls_back_to_i_frame():
    ga, da = _frame(2)
    gb = (255 - ga)  # inverted scene: luma residuals clamp everywhere
    db = (12000 - da).astype(np.uint16)
    intra = compact_frame(ga, da, S, gray_bits=6, depth_bits=10)
    qg, qd = _host_unpack_codes(intra, H, W, S)
    assert delta_encode(gb, db, qg, qd, S, max_clamp=0.02) is None


def test_native_encoder_matches_numpy():
    from rgbdslam_v2_tpu.io.native_loader import (
        delta_encode_native,
        native_available,
    )

    if not native_available():
        pytest.skip("native toolchain unavailable")
    ga, da = _frame(3)
    gb, db = _frame(3, drift=1)
    intra = compact_frame(ga, da, S, gray_bits=6, depth_bits=10)
    qg_n, qd_n = _host_unpack_codes(intra, H, W, S)
    qg_p, qd_p = qg_n.copy(), qd_n.copy()
    nat = delta_encode_native(gb, db, qg_n, qd_n, S, 0.05)
    assert nat is not None and nat != "clamped"
    packed_n, _, _ = nat
    # numpy reference (gray 2D + u16 depth: both paths use identical math)
    import rgbdslam_v2_tpu.io.native_loader as nl

    orig = nl.delta_encode_native
    nl.delta_encode_native = lambda *a, **k: None
    try:
        packed_p, qg_p, qd_p = delta_encode(gb, db, qg_p, qd_p, S, 0.05)
    finally:
        nl.delta_encode_native = orig
    np.testing.assert_array_equal(packed_n, packed_p)
    np.testing.assert_array_equal(qg_n, qg_p)
    np.testing.assert_array_equal(qd_n, qd_p)


def test_manager_wire_encode_i_then_p(monkeypatch):
    p = ParameterServer(
        dict(
            max_keypoints=64,
            tpu_max_nodes=8,
            tpu_max_edges=64,
            tpu_candidate_batch=2,
            tpu_wire_delta=True,
        )
    )
    m = GraphManager(CAM, p)
    assert m.wire_delta
    ga, da = _frame(4)
    gb, db = _frame(4, drift=1)
    b0 = m._wire_encode(ga, da.astype(np.float32) / 5000.0)
    assert b0.size == wire_intra_len(H, W, S)  # first frame ships absolute
    b1 = m._wire_encode(gb, db.astype(np.float32) / 5000.0)
    assert b1.size == wire_delta_len(H, W, S)  # second rides the delta
    gc, dc = (255 - ga), (12000 - da).astype(np.uint16)  # inverted scene
    b2 = m._wire_encode(gc, dc.astype(np.float32) / 5000.0)
    assert b2.size == wire_intra_len(H, W, S)  # scene cut -> I again
