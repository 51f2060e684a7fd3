"""ROS bag (format 2.0) container + playback tests.

The writer must produce structurally conformant bags (magic, bag header,
chunks, connection/index/chunk-info records) and the reader must recover
the identical frames — this validates both sides without shipping TUM data.
Playback parity target: the reference's processBagfile buffered feed
(reference: src/openni_listener.cpp:218-340).
"""
import bz2
import struct

import numpy as np
import pytest

from rgbdslam_v2_tpu.io.rosbag import (
    MAGIC,
    BagReader,
    BagWriter,
    ImageMsg,
    TransformStamped,
    decode_tf,
    encode_tf,
    read_rgbd_frames,
    read_tf_trajectory,
    write_rgbd_bag,
)


def _mk_frames(n=5, h=24, w=32, seed=0):
    rng = np.random.default_rng(seed)
    rgbs = rng.integers(0, 255, (n, h, w, 3), dtype=np.uint8)
    depths = rng.uniform(0.5, 3.0, (n, h, w)).astype(np.float32)
    stamps = 1.0e9 + np.arange(n) / 30.0
    return stamps, rgbs, depths


def test_image_roundtrip_rgb8_and_32fc1():
    stamps, rgbs, depths = _mk_frames(1)
    raw = ImageMsg.encode(float(stamps[0]), "/camera", rgbs[0])
    msg = ImageMsg.decode(raw)
    assert msg.encoding == "rgb8"
    assert abs(msg.stamp - stamps[0]) < 1e-6
    np.testing.assert_array_equal(msg.as_array(), rgbs[0])

    raw = ImageMsg.encode(float(stamps[0]), "/camera", depths[0])
    msg = ImageMsg.decode(raw)
    assert msg.encoding == "32FC1"
    np.testing.assert_allclose(msg.as_array(), depths[0])


def test_image_16uc1_millimeters():
    d16 = np.full((4, 6), 1500, np.uint16)  # 1500 mm
    msg = ImageMsg.decode(ImageMsg.encode(0.5, "/c", d16))
    assert msg.encoding == "16UC1"
    np.testing.assert_allclose(msg.as_array(), 1.5)  # meters


def test_tf_roundtrip():
    tr = TransformStamped(12.25, "/world", "/kinect",
                          np.array([1.0, -2.0, 0.5]),
                          np.array([0.0, 0.0, 0.0, 1.0]))
    out = decode_tf(encode_tf([tr]))
    assert len(out) == 1
    assert out[0].frame_id == "/world" and out[0].child_frame_id == "/kinect"
    np.testing.assert_allclose(out[0].translation, tr.translation)
    np.testing.assert_allclose(out[0].quaternion, tr.quaternion)


def test_bag_roundtrip_frames_and_tf(tmp_path):
    stamps, rgbs, depths = _mk_frames(5)
    gt = np.tile(np.eye(4), (5, 1, 1))
    gt[:, 0, 3] = np.arange(5) * 0.1
    path = write_rgbd_bag(tmp_path / "seq.bag", stamps, rgbs, depths,
                          gt_poses=gt)
    assert path.read_bytes().startswith(MAGIC)

    frames = list(read_rgbd_frames(path))
    assert len(frames) == 5
    for i, (ts, rgb, depth) in enumerate(frames):
        assert abs(ts - stamps[i]) < 1e-6
        np.testing.assert_array_equal(rgb, rgbs[i])
        np.testing.assert_allclose(depth, depths[i], atol=1e-6)

    tf_stamps, rows = read_tf_trajectory(path, child_frame="/kinect")
    assert len(tf_stamps) == 5
    np.testing.assert_allclose(rows[:, 0], np.arange(5) * 0.1, atol=1e-9)


def test_bag_structure_has_index_and_chunkinfo(tmp_path):
    """The writer emits bag-header/chunk/connection/index/chunk-info records
    with correct op codes and counts (format 2.0 conformance)."""
    stamps, rgbs, depths = _mk_frames(3)
    path = write_rgbd_bag(tmp_path / "s.bag", stamps, rgbs, depths)
    blob = path.read_bytes()
    off, ops = len(MAGIC), []
    while off < len(blob):
        (hlen,) = struct.unpack_from("<I", blob, off)
        hdr = blob[off + 4 : off + 4 + hlen]
        # find the op field
        hoff = 0
        op = None
        while hoff < len(hdr):
            (n,) = struct.unpack_from("<I", hdr, hoff)
            item = hdr[hoff + 4 : hoff + 4 + n]
            if item.startswith(b"op="):
                op = item[3]
            hoff += 4 + n
        ops.append(op)
        (dlen,) = struct.unpack_from("<I", blob, off + 4 + hlen)
        off += 8 + hlen + dlen
    assert ops[0] == 0x03  # bag header first
    assert 0x05 in ops and 0x07 in ops and 0x04 in ops and 0x06 in ops
    # bag header rewritten with real counts
    reader = BagReader(path)
    n_msgs = sum(1 for _ in reader.records())
    assert n_msgs == 6  # 3 rgb + 3 depth
    assert len(reader.connections) == 2


def test_bz2_chunk_decompression(tmp_path):
    """Reader handles bz2-compressed chunks (rosbag's default -j mode)."""
    stamps, rgbs, depths = _mk_frames(2)
    src = write_rgbd_bag(tmp_path / "raw.bag", stamps, rgbs, depths)
    blob = src.read_bytes()
    # recompress every chunk record as bz2
    out, off = [blob[: len(MAGIC)]], len(MAGIC)
    while off < len(blob):
        (hlen,) = struct.unpack_from("<I", blob, off)
        hdr_raw = blob[off + 4 : off + 4 + hlen]
        (dlen,) = struct.unpack_from("<I", blob, off + 4 + hlen)
        data = blob[off + 8 + hlen : off + 8 + hlen + dlen]
        if b"op=\x05" in hdr_raw:
            from rgbdslam_v2_tpu.io.rosbag import _decode_header, _encode_header

            fields = _decode_header(hdr_raw)
            fields["compression"] = b"bz2"
            hdr_raw = _encode_header(fields)
            data = bz2.compress(data)
        out.append(struct.pack("<I", len(hdr_raw)) + hdr_raw
                   + struct.pack("<I", len(data)) + data)
        off += 8 + hlen + dlen
    dst = tmp_path / "bz2.bag"
    dst.write_bytes(b"".join(out))
    frames = list(read_rgbd_frames(dst))
    assert len(frames) == 2
    np.testing.assert_array_equal(frames[0][1], rgbs[0])


def test_approximate_time_pairing_drops_unmatched(tmp_path):
    """Depth messages with no RGB within the window are dropped (the
    ApproximateTime-sync drop behavior)."""
    stamps, rgbs, depths = _mk_frames(4)
    with BagWriter(tmp_path / "gap.bag") as bag:
        for i in range(4):
            if i != 2:  # drop rgb frame 2
                bag.write_image("/camera/rgb/image_color", float(stamps[i]),
                                rgbs[i])
            bag.write_image("/camera/depth/image", float(stamps[i]),
                            depths[i])
    frames = list(read_rgbd_frames(tmp_path / "gap.bag",
                                   max_difference=0.005))
    assert len(frames) == 3


@pytest.mark.heavy
def test_pipeline_run_bag(tmp_path):
    """End-to-end: synthetic sequence -> bag -> SlamPipeline.run_bag ->
    trajectory matches the TUM-dir path frame count."""
    from rgbdslam_v2_tpu.config import ParameterServer
    from rgbdslam_v2_tpu.core.camera import Intrinsics
    from rgbdslam_v2_tpu.io import SyntheticWorld, render_sequence
    from rgbdslam_v2_tpu.pipeline import SlamPipeline

    cam = Intrinsics(fx=130.0, fy=130.0, cx=80.0, cy=60.0,
                     width=160, height=120)
    world = SyntheticWorld.create(seed=0, texture_size=256, cam=cam)
    n = 8
    poses, rgbs, depths = render_sequence(world, n, seed=2)
    stamps = 1e9 + np.arange(n) / 30.0
    bag = write_rgbd_bag(tmp_path / "seq.bag", stamps, rgbs, depths,
                         gt_poses=poses)

    params = ParameterServer(
        dict(max_keypoints=256, tpu_max_nodes=16, tpu_max_edges=256,
             tpu_candidate_batch=4, ransac_iterations=128, min_matches=12,
             optimizer_skip_step=100, keep_all_nodes=True)
    )
    pipe = SlamPipeline(cam, params)
    pipe.run_bag(bag)
    assert pipe.manager.n_nodes == n
    est_stamps, est_poses = pipe.manager.trajectory()
    assert len(est_stamps) == n

    out = pipe.save_bagfile(tmp_path / "result.bag")
    tf_stamps, rows = read_tf_trajectory(out, child_frame="/camera")
    assert len(tf_stamps) == n
    np.testing.assert_allclose(rows[0, :3], np.asarray(est_poses)[0, :3, 3],
                               atol=1e-6)


def test_u16_depth_units_roundtrip(tmp_path):
    """TUM-quantized u16 depth (1/5000 m) must round-trip through a bag in
    METERS — writing raw u16 would be decoded as 16UC1 millimeters by any
    ROS consumer (a 5x scale error)."""
    stamps, rgbs, _ = _mk_frames(2)
    d16 = np.full((24, 32), 5000, np.uint16)  # 1.0 m in TUM units
    path = write_rgbd_bag(tmp_path / "u16.bag", stamps, rgbs, [d16, d16])
    frames = list(read_rgbd_frames(path))
    assert len(frames) == 2
    np.testing.assert_allclose(frames[0][2], 1.0, atol=1e-6)
