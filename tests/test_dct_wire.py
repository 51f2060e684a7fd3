"""Fixed-rate block-DCT luma wire (ops/dct_wire.py, tpu_ingest_format=ydct).

The wire exists because frame bytes bound end-to-end fps on the eager
tunnel (WIRE.md); its quality gate is feature-geometry stability, checked
here structurally (device decode == numpy reference bit-exactly, PSNR and
corner preservation on synthetic content) and end-to-end (a ydct SLAM run
tracks within the yc12 ATE envelope). Reference analog: none — the
reference's sensor frames arrive via host DMA (node.cpp:101-240)."""
import numpy as np
import pytest

from rgbdslam_v2_tpu.ops.dct_wire import (
    BIT_ALLOC, DCT8, SYNTHESIS, ZIGZAG, dct_luma_len,
    decode_luma_dct_dev, decode_luma_dct_np, encode_luma_dct,
)


def _test_image(H=160, W=160, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = (
        96 + 60 * np.sin(xx / 9.0) * np.cos(yy / 13.0)
        + 40 * ((xx // 20 + yy // 20) % 2)  # blocky texture edges
        + rng.normal(0, 3.0, (H, W))        # sensor-ish noise
    )
    return np.clip(img, 0, 255).astype(np.uint8)


def test_dct8_orthonormal():
    np.testing.assert_allclose(DCT8 @ DCT8.T, np.eye(8), atol=1e-6)
    # synthesis rows are the flattened separable basis patterns
    assert SYNTHESIS.shape == (len(BIT_ALLOC), 64)


def test_zigzag_is_permutation_prefix():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    assert ZIGZAG[0] == 0  # DC first


def test_wire_length_matches():
    img = _test_image()
    wire = encode_luma_dct(img)
    assert wire.dtype == np.uint8
    assert len(wire) == dct_luma_len(*img.shape)
    # fixed rate: a different image codes to the same length
    assert len(encode_luma_dct(_test_image(seed=5))) == len(wire)


def test_device_decode_matches_numpy_bitexact():
    img = _test_image()
    wire = encode_luma_dct(img)
    ref = decode_luma_dct_np(wire, *img.shape)
    dev = np.asarray(decode_luma_dct_dev(wire, *img.shape))
    # identical integer output (same f32 matmul + rint on both ends)
    assert np.array_equal(ref, dev)


def test_roundtrip_quality():
    img = _test_image()
    dec = decode_luma_dct_np(encode_luma_dct(img), *img.shape)
    mse = np.mean((dec.astype(np.float32) - img) ** 2)
    psnr = 10 * np.log10(255.0**2 / mse)
    assert psnr > 34.0, psnr
    # DC (local mean) is near-lossless: block means stay within 1 gray level
    bm = lambda x: x.astype(np.float32).reshape(  # noqa: E731
        img.shape[0] // 8, 8, img.shape[1] // 8, 8).mean((1, 3))
    assert np.abs(bm(dec) - bm(img)).max() < 1.0


def test_quality_points_roundtrip_and_isolation():
    """Every named spec (tpu_dct_quality) encodes/decodes bit-exactly on
    device vs numpy, lengths are distinct (jit programs stay shape-keyed),
    and quality increases monotonically with rate."""
    from rgbdslam_v2_tpu.ops import dct_wire as dw

    img = _test_image()
    lens, psnrs = [], []
    try:
        for q in sorted(dw.SPECS):
            dw.set_quality(q)
            wire = dw.encode_luma_dct(img)
            assert len(wire) == dw.dct_luma_len(*img.shape)
            ref = dw.decode_luma_dct_np(wire, *img.shape)
            dev = np.asarray(dw.decode_luma_dct_dev(wire, *img.shape))
            assert np.array_equal(ref, dev), q
            lens.append(len(wire))
            mse = np.mean((ref.astype(np.float32) - img) ** 2)
            psnrs.append(10 * np.log10(255.0 ** 2 / mse))
    finally:
        dw.set_quality("2.3")
    assert lens == sorted(set(lens)), lens  # distinct, increasing
    assert psnrs == sorted(psnrs), psnrs    # rate buys quality
    with pytest.raises(ValueError):
        dw.set_quality("9.9")


def test_quality_param_reaches_encoder_and_manager():
    """tpu_dct_quality set on the ParameterServer changes the wire length
    the manager allocates and the native encoder's output length."""
    from rgbdslam_v2_tpu.config import ParameterServer
    from rgbdslam_v2_tpu.core.camera import Intrinsics
    from rgbdslam_v2_tpu.graph.manager import GraphManager, compact_frame
    from rgbdslam_v2_tpu.ops import dct_wire as dw

    cam = Intrinsics(fx=130.0, fy=130.0, cx=80.0, cy=60.0,
                     width=160, height=120)
    rgb = np.repeat(_test_image(120, 160)[..., None], 3, axis=2)
    depth = np.full((120, 160), 9000, np.uint16)
    lens = {}
    try:
        for q in ("2.3", "3.1"):
            params = ParameterServer(dict(
                tpu_ingest_format="ydct", tpu_dct_quality=q,
                max_keypoints=64, tpu_max_nodes=8, tpu_max_edges=32,
                tpu_candidate_batch=2,
            ))
            m = GraphManager(cam, params)
            assert dw.QUALITY == q
            wire = compact_frame(rgb, depth, m.emm_stride, fmt="ydct",
                                 depth_bits=m.depth_bits)
            lens[q] = len(wire)
            del m
    finally:
        dw.set_quality("2.3")
    assert lens["3.1"] > lens["2.3"], lens


def test_ydct_end_to_end_slam():
    """ydct ingest through the full fast path: tracks like yc12."""
    from rgbdslam_v2_tpu.config import ParameterServer
    from rgbdslam_v2_tpu.core.camera import Intrinsics
    from rgbdslam_v2_tpu.io import SyntheticWorld, render_sequence
    from rgbdslam_v2_tpu.pipeline import SlamPipeline

    cam = Intrinsics(fx=130.0, fy=130.0, cx=80.0, cy=60.0,
                     width=160, height=120)
    world = SyntheticWorld.create(seed=0, cam=cam)
    poses, rgbs, depths = render_sequence(world, 12, seed=3)
    stamps = np.arange(len(rgbs)) / 30.0
    ates = {}
    for fmt in ("ydct", "yc12"):
        params = ParameterServer(dict(
            tpu_ingest_format=fmt, max_keypoints=256, tpu_max_nodes=32,
            tpu_max_edges=256, tpu_candidate_batch=4, ransac_iterations=96,
            keep_all_nodes=True, min_matches=12,
        ))
        pipe = SlamPipeline(cam, params)
        assert pipe.manager.ingest_fmt == fmt
        pipe.run_arrays(rgbs, depths, stamps, gt_poses=poses)
        est = np.asarray(pipe.manager.graph.poses[: pipe.manager.n_nodes])
        err = np.linalg.norm(
            est[:, :3, 3] - np.asarray(poses)[:, :3, 3], axis=1)
        ates[fmt] = float(np.sqrt((err**2).mean()))
    assert ates["ydct"] < max(3.0 * ates["yc12"], 0.02), ates


def test_native_encoder_near_exact():
    """C encoder (native/compact_ingest.cpp compact_ydct) vs numpy encode:
    same wire length, identical depth/chroma tails, and luma codes equal
    except +-1 at quantizer boundaries (double vs f32-GEMM accumulation) in
    a <0.5% fraction — both decode within 2 gray levels through the ONE
    canonical decoder."""
    from rgbdslam_v2_tpu.io.native_loader import compact_ydct, native_available

    if not native_available():
        pytest.skip("native toolchain unavailable")
    img = _test_image(H=160, W=160)
    depth = np.full(img.shape, 2.0, np.float32)
    wire_c = compact_ydct(img, depth, 2)
    assert wire_c is not None
    wire_np = encode_luma_dct(img)
    nl = dct_luma_len(*img.shape)
    assert len(wire_c) > nl
    dn = decode_luma_dct_np(wire_c[:nl], *img.shape).astype(np.int32)
    dp = decode_luma_dct_np(wire_np, *img.shape).astype(np.int32)
    assert np.abs(dn - dp).max() <= 2
    assert (dn != dp).mean() < 0.05
    from rgbdslam_v2_tpu.ops.dct_wire import _decode_codes_np

    nb = (img.shape[0] // 8) * (img.shape[1] // 8)
    qc, qn = _decode_codes_np(wire_c[:nl], nb), _decode_codes_np(wire_np, nb)
    ndiff = sum(int((a != b).sum()) for a, b in zip(qc, qn))
    maxd = max(int(np.abs(a - b).max()) for a, b in zip(qc, qn))
    assert maxd <= 1 and ndiff < 0.005 * nb * len(qc), (maxd, ndiff)


def test_pipelined_drain_matches_blocking():
    """tpu_drain_pipelined stages summary pulls one drain behind (WIRE.md:
    each blocking d2h costs >=28 ms on the eager tunnel) — the final graph
    must be IDENTICAL to the unpipelined drain, and a blocking flush
    (keep_newest=0) must leave no staged batches behind."""
    from rgbdslam_v2_tpu.config import ParameterServer
    from rgbdslam_v2_tpu.core.camera import Intrinsics
    from rgbdslam_v2_tpu.io import SyntheticWorld, render_sequence
    from rgbdslam_v2_tpu.pipeline import SlamPipeline

    cam = Intrinsics(fx=130.0, fy=130.0, cx=80.0, cy=60.0,
                     width=160, height=120)
    world = SyntheticWorld.create(seed=0, cam=cam)
    poses, rgbs, depths = render_sequence(world, 14, seed=3)
    stamps = np.arange(len(rgbs)) / 30.0
    results = {}
    for pipelined in (True, False):
        params = ParameterServer(dict(
            max_keypoints=256, tpu_max_nodes=32, tpu_max_edges=256,
            tpu_candidate_batch=4, ransac_iterations=96, min_matches=12,
            keep_all_nodes=True, tpu_drain_interval=3,
            tpu_drain_pipelined=pipelined, optimizer_skip_step=0,
        ))
        pipe = SlamPipeline(cam, params)
        pipe.run_arrays(rgbs, depths, stamps, gt_poses=poses)
        m = pipe.manager
        m._drain_pending()  # blocking flush
        assert not m._staged_drains and not m._pending
        results[pipelined] = (
            m.n_nodes, m.n_edges,
            [m.edge_i_host[i] for i in range(m.n_edges)],
            [m.edge_j_host[i] for i in range(m.n_edges)],
            np.asarray(m.graph.poses[: m.n_nodes]),
        )
    a, b = results[True], results[False]
    assert a[0] == b[0] and a[1] == b[1]
    assert a[2] == b[2] and a[3] == b[3]
    np.testing.assert_allclose(a[4], b[4], atol=1e-5)


def test_ydct_falls_back_when_not_divisible():
    from rgbdslam_v2_tpu.config import ParameterServer
    from rgbdslam_v2_tpu.core.camera import Intrinsics
    from rgbdslam_v2_tpu.graph.manager import GraphManager

    cam = Intrinsics(fx=100.0, fy=100.0, cx=66.0, cy=50.0,
                     width=132, height=100)  # 100 % 8 != 0
    m = GraphManager(cam, ParameterServer(dict(
        tpu_ingest_format="ydct", tpu_max_nodes=8, tpu_max_edges=64,
        tpu_candidate_batch=2, max_keypoints=64,
    )))
    assert m.ingest_fmt in ("yc12", "raw")


def test_ydct_retrace_second_config_no_tracer_leak():
    """Two static configs tracing the ydct-decoding step program in ONE
    process: _dev_consts must not cache a traced constant from the first
    trace (UnexpectedTracerError regression — hit by multi-variant A/B
    queues, tools/ab_ate.py r5def-approx after r5def)."""
    from rgbdslam_v2_tpu.config import ParameterServer
    from rgbdslam_v2_tpu.core.camera import Intrinsics
    from rgbdslam_v2_tpu.pipeline import SlamPipeline

    cam = Intrinsics(fx=130.0, fy=130.0, cx=80.0, cy=60.0,
                     width=160, height=120)
    rgb = np.repeat(_test_image(120, 160)[..., None], 3, axis=2)
    depth = np.full((120, 160), 9000, np.uint16)
    base = dict(tpu_ingest_format="ydct", max_keypoints=64, tpu_max_nodes=8,
                tpu_max_edges=64, tpu_candidate_batch=2, keep_all_nodes=True)
    for k, over in enumerate((dict(), dict(tpu_approx_select=True))):
        pipe = SlamPipeline(cam, ParameterServer(dict(base, **over)))
        for t in range(2):
            pipe.process_frame(rgb, depth, t / 30.0)
        assert pipe.manager.n_nodes == 2, (k, over)
