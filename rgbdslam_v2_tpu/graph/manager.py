"""GraphManager: host orchestration of the SLAM pose graph.

Capability parity with the reference's GraphManager
(reference: src/graph_manager.{h,cpp}):
  addNode              graph_manager.cpp:681  (first-node handling :360-402)
  nodeComparisons      :421-658 (predecessor match, motion gates, candidate
                        fan-out, edge insertion, fallback edges, keyframes)
  candidate selection  getPotentialEdgeTargetsWithDijkstra :204-324
                        (sequential predecessors + geodesic neighbors +
                         random keyframe sampling)
  optimizeGraph        :900-1066 (skip-step, chi² convergence — optim/)
  pruneEdgesWithError  :1106-1246 (chi²-based pruning; consecutive edges
                        fall back to constant-position)
  motion gates         isBigTrafo/isSmallTrafo misc.cpp:272-344

Division of labor (TPU-first): all per-frame compute — feature extraction,
B-candidate matching/RANSAC/EMM, graph optimization — runs in jitted device
kernels; this class only does O(nodes) bookkeeping: ids, adjacency BFS,
keyframe lists, and accept/reject decisions on scalar results.
"""
from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Dict, List, Optional, Set

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ParameterServer, default_params
from ..core import se3
from ..core.camera import Intrinsics
from ..core.frames import Frame
from ..models.orb import OrbExtractor
from ..models.types import Keypoints
from ..optim.pose_graph import GraphState, edge_chi2, make_graph_state, optimize
from .compare import CompareResult, compare_to_candidates
from .node_store import NodeStore

logger = logging.getLogger("rgbdslam.graph")

EDGE_SEQUENTIAL = 0
EDGE_LOOP = 1
EDGE_ODOMETRY = 2
EDGE_CONST_POSITION = 3


DEPTH_SCALE = 5000.0  # TUM PNG quantization: depth_meters = png_u16 / 5000


_D12_LUT = None


def _d12_lut():
    """u16 depth count -> 12-bit sqrt code: q = round(sqrt(256 * d16)).

    Decode d16' = q^2 / 256 — relative error <= sqrt(d16)/8 counts
    (1.3 mm at 3 m, 2.5 mm at 10 m at the TUM 1/5000 scale), 20-70x below
    the sensor's 0.01 z^2 noise floor. Monotone, 0 -> 0 (invalid stays
    invalid)."""
    global _D12_LUT
    if _D12_LUT is None:
        d = np.arange(65536, dtype=np.float64)
        _D12_LUT = np.clip(np.round(np.sqrt(d * 256.0)), 0, 4095).astype(
            np.uint16
        )
    return _D12_LUT


def _pack12(q: np.ndarray) -> np.ndarray:
    """(N,) u12-in-u16, N even -> (3N/2,) u8 little-endian nibble packing."""
    a = q.reshape(-1, 2)
    lo = a[:, 0].astype(np.uint32)
    hi = a[:, 1].astype(np.uint32)
    out = np.empty((a.shape[0], 3), np.uint8)
    out[:, 0] = lo & 0xFF
    out[:, 1] = ((lo >> 8) & 0x0F) | ((hi & 0x0F) << 4)
    out[:, 2] = hi >> 4
    return out.reshape(-1)


_D10_LUT = None


def _d10_lut():
    """u16 depth -> 10-bit sqrt code: q = round(sqrt(16 * d16)), decode
    d16' = q^2 / 16. Error <= sqrt(d16)/2 counts: 3.5 mm at 1 m, 6 mm at
    3 m — still 3-15x below the 0.01 z^2 sensor noise floor, for 1.25 B
    per sample on the wire instead of 1.5 (the link is the throughput
    bound; see compact_frame)."""
    global _D10_LUT
    if _D10_LUT is None:
        d = np.arange(65536, dtype=np.float64)
        _D10_LUT = np.clip(np.round(np.sqrt(d * 16.0)), 0, 1023).astype(
            np.uint16
        )
    return _D10_LUT


def _pack10(q: np.ndarray) -> np.ndarray:
    """(N,) u10-in-u16, N % 4 == 0 -> (5N/4,) u8 little-endian bit stream."""
    a = q.reshape(-1, 4).astype(np.uint32)
    out = np.empty((a.shape[0], 5), np.uint8)
    out[:, 0] = a[:, 0] & 0xFF
    out[:, 1] = (a[:, 0] >> 8) | ((a[:, 1] & 0x3F) << 2)
    out[:, 2] = (a[:, 1] >> 6) | ((a[:, 2] & 0x0F) << 4)
    out[:, 3] = (a[:, 2] >> 4) | ((a[:, 3] & 0x03) << 6)
    out[:, 4] = a[:, 3] >> 2
    return out.reshape(-1)


def _chroma_mult(H: int, W: int, stride: int) -> int:
    """Chroma plane stride multiplier: 4 (i.e. stride 4s, viz-only color at
    1/16 the luma area) when the frame divides evenly, else the denser 2."""
    cs = 4 * stride
    return 4 if (H % cs == 0 and W % cs == 0) else 2


def _pack6(gray8: np.ndarray) -> np.ndarray:
    """(N,) u8 gray, N % 4 == 0 -> (3N/4,) u8: 6-bit luma, 4 px per 3 B."""
    a = (gray8.reshape(-1, 4) >> 2).astype(np.uint8)
    out = np.empty((a.shape[0], 3), np.uint8)
    out[:, 0] = a[:, 0] | ((a[:, 1] & 0x03) << 6)
    out[:, 1] = (a[:, 1] >> 2) | ((a[:, 2] & 0x0F) << 4)
    out[:, 2] = (a[:, 2] >> 4) | (a[:, 3] << 2)
    return out.reshape(-1)


def _pack5_codes(codes: np.ndarray) -> np.ndarray:
    """(N,) u8 values < 32, N % 8 == 0 -> (5N/8,) u8 little-endian bit
    stream (shared by the 5-bit luma wire and the depth-residual wire)."""
    a = codes.reshape(-1, 8).astype(np.uint8)
    out = np.empty((a.shape[0], 5), np.uint8)
    out[:, 0] = a[:, 0] | ((a[:, 1] & 0x07) << 5)
    out[:, 1] = (a[:, 1] >> 3) | (a[:, 2] << 2) | ((a[:, 3] & 0x01) << 7)
    out[:, 2] = (a[:, 3] >> 1) | ((a[:, 4] & 0x0F) << 4)
    out[:, 3] = (a[:, 4] >> 4) | (a[:, 5] << 1) | ((a[:, 6] & 0x03) << 6)
    out[:, 4] = (a[:, 6] >> 2) | (a[:, 7] << 3)
    return out.reshape(-1)


def _pack5(gray8: np.ndarray) -> np.ndarray:
    """(N,) u8 gray, N % 8 == 0 -> (5N/8,) u8: 5-bit luma, 8 px per 5 B."""
    return _pack5_codes(gray8 >> 3)


def _pack4(codes: np.ndarray) -> np.ndarray:
    """(N,) u8 values < 16, N % 2 == 0 -> (N/2,) u8 (low nibble first)."""
    a = codes.reshape(-1, 2)
    return (a[:, 0] | (a[:, 1] << 4)).astype(np.uint8)


_BAYER4 = np.array(
    [[0, 8, 2, 10], [12, 4, 14, 6], [3, 11, 1, 9], [15, 7, 13, 5]],
    np.uint16,
)
_dither_plane_cache: dict = {}


def _dither6(gray8: np.ndarray, bits: int = 6) -> np.ndarray:
    """Ordered (Bayer 4x4) dithering before the `bits`-bit truncation.

    Plain >>2 truncation produces spatially-correlated banding that flips
    BRIEF pair comparisons consistently across a region (measured: protocol
    ATE 0.0229 vs 0.0192 m at 8 bit). Adding the tiled Bayer offset
    (scaled to one quantization step, zero-mean after decode) before the
    shift converts that bias into high-frequency noise the descriptor's
    smoothing averages out. The g>>bits term cancels the device decoder's
    bit-replication bias (decode(q) = q<<(8-bits) + q>>(2*bits-8)
    ~ g + g/2^bits), making the decoded mean track the original. One
    vectorized i16 add over the plane (~0.3 ms at VGA)."""
    H, W = gray8.shape
    off = _dither_plane_cache.get((H, W, bits))
    if off is None:
        off = (_BAYER4[
            np.arange(H)[:, None] % 4, np.arange(W)[None, :] % 4
        ] >> (bits - 4)).astype(np.int16)  # 16 Bayer levels -> one q step
        _dither_plane_cache[(H, W, bits)] = off
    g = gray8.astype(np.int16)
    return np.clip(g + off - (g >> bits), 0, 255).astype(np.uint8)


def maybe_scale_depth(depth, factor: float):
    """depth_scaling_factor support (reference misc.cpp:502, node.cpp:705):
    scale raw depth before quantization/ingest. u16 counts are converted to
    meters (the compact encoder's float path re-quantizes)."""
    if factor == 1.0 or depth is None:
        return depth
    depth = np.asarray(depth)
    if depth.dtype == np.uint16:
        return depth.astype(np.float32) * (factor / DEPTH_SCALE)
    return depth * np.float32(factor)


def compact_frame(rgb, depth, stride: int, fmt: str = "yc12",
                  gray_bits: int = 8, depth_bits: int = 12):
    """Host-side ingest compaction into ONE packed uint8 buffer.

    One buffer means ONE transfer per frame — each h2d through the tunnel
    pays a fixed round-trip, and the tunnel link runs at ~30-45 MB/s, so
    the payload size directly bounds throughput (the reference ships
    nothing: its sensor DMA lands in host RAM, node.cpp:101-240; a TPU has
    to ship the frame over the wire, so the wire format IS the ingest
    design).

    fmt="yc12" (336 KB at 640x480/s2 defaults vs 1.15 MB raw, 2.1 MB
    naive): [Y | depth | Cb | Cr]
      - Y (gray) full-res: the feature detector's input; also the luma of
        the reconstructed export color (one plane serves both). 6-bit
        Bayer-dithered by default (gray_bits).
      - depth sqrt-coded at the cloud stride s (depth_bits 10 -> 1.25 B or
        12 -> 1.5 B per sample): EMM/clouds use stride-s depth anyway;
        feature depth reads the stride-s cell (quantization error mm-scale
        and 3-15x below the 0.01 z^2 sensor noise, see _d10_lut/_d12_lut).
      - chroma at stride 4s (2s for frames that don't divide), upsampled
        on device (4:2:0-style): export color is visualization-only.
    fmt="raw": [gray u8 | depth u16 full | color u8 at stride] — lossless
    fallback (odd frame sizes, precision studies).
    """
    rgb = np.asarray(rgb)
    depth = np.asarray(depth)
    H, W = depth.shape
    if fmt == "yc12":
        # Single-pass C encoder (native/compact_ingest.cpp): bit-exact for
        # the u8-RGB/u16-or-f32-depth layouts, ~0.3 ms vs ~3 ms numpy on
        # the one host core; None -> numpy fallback below.
        from ..io.native_loader import compact_yc12 as _native_yc12

        out = _native_yc12(rgb, depth, stride, gray_bits, depth_bits,
                           _chroma_mult(H, W, stride))
        if out is not None:
            return out
    if fmt == "ydct":
        # Single-pass C DCT encoder (native/compact_ingest.cpp
        # compact_ydct): ~0.6 ms vs ~4-6 ms numpy; None -> numpy fallback.
        from ..io.native_loader import compact_ydct as _native_ydct

        out = _native_ydct(rgb, depth, stride, depth_bits,
                           _chroma_mult(H, W, stride))
        if out is not None:
            return out
    if rgb.ndim == 3:
        try:  # cv2's SIMD cvtColor is ~20x the numpy reduction (14 -> 0.7 ms)
            import cv2

            gray8 = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
        except Exception:
            r16 = rgb.astype(np.uint16)
            gray8 = (
                (r16[..., 0] * 77 + r16[..., 1] * 150 + r16[..., 2] * 29) >> 8
            ).astype(np.uint8)
    else:
        gray8 = (
            rgb if rgb.dtype == np.uint8
            else np.clip(rgb * (255.0 if rgb.dtype.kind == "f" else 1.0), 0, 255).astype(np.uint8)
        )
    if depth.dtype == np.uint16:
        d16 = depth
    else:
        d = np.nan_to_num(depth, nan=0.0, posinf=0.0, neginf=0.0)
        d16 = np.clip(d * DEPTH_SCALE, 0, 65535).astype(np.uint16)

    if fmt in ("yc12", "ydct"):
        if fmt == "ydct":
            # fixed-rate block-DCT luma (ops/dct_wire.py): ~2.3 bits/px,
            # device decode is one MXU matmul fused into the step program
            from ..ops.dct_wire import encode_luma_dct

            gray_wire = encode_luma_dct(gray8)
        elif gray_bits == 6:
            gray_wire = _pack6(_dither6(gray8).reshape(-1))
        elif gray_bits == 5:
            gray_wire = _pack5(_dither6(gray8, bits=5).reshape(-1))
        else:
            gray_wire = gray8.reshape(-1)
        dsub = d16[::stride, ::stride].reshape(-1)
        if depth_bits == 10:
            d12 = _pack10(_d10_lut()[dsub])
        else:
            d12 = _pack12(_d12_lut()[dsub])
        cs = _chroma_mult(H, W, stride) * stride
        if rgb.ndim == 3:
            sub = rgb[::cs, ::cs].astype(np.float32)
            r, g, b = sub[..., 0], sub[..., 1], sub[..., 2]
            cb = np.clip(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b, 0, 255)
            cr = np.clip(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b, 0, 255)
            cb = cb.astype(np.uint8)
            cr = cr.astype(np.uint8)
        else:
            cb = np.full((H // cs, W // cs), 128, np.uint8)
            cr = np.full((H // cs, W // cs), 128, np.uint8)
        return np.concatenate(
            [gray_wire, d12, cb.reshape(-1), cr.reshape(-1)]
        )

    if rgb.ndim == 3:
        color_small = np.ascontiguousarray(rgb[::stride, ::stride])
    else:
        color_small = np.zeros(
            (depth[::stride].shape[0], depth[0, ::stride].shape[0], 3), np.uint8
        )
    return np.concatenate([
        gray8.reshape(-1),
        np.ascontiguousarray(d16).view(np.uint8).reshape(-1),
        color_small.reshape(-1),
    ])


def _unpack_compact(packed, H: int, W: int, stride: int):
    """Device-side inverse of compact_frame(fmt="raw"): packed u8 ->
    (gray u8 (H,W), depth u16 (H,W), color u8 (h,w,3)). Pure slicing/bitcast
    — fuses into the consuming program for free."""
    n_gray = H * W
    n_depth = 2 * H * W
    h = (H + stride - 1) // stride
    w = (W + stride - 1) // stride
    gray8 = packed[:n_gray].reshape(H, W)
    d8 = packed[n_gray : n_gray + n_depth].reshape(H * W, 2)
    depth16 = jax.lax.bitcast_convert_type(d8, jnp.uint16).reshape(H, W)
    color = packed[n_gray + n_depth : n_gray + n_depth + h * w * 3].reshape(
        h, w, 3
    )
    return gray8, depth16, color


def _unpack5_codes_dev(b5):
    """Device inverse of _pack5_codes: (5K,) u8 -> (8K,) u32 values < 32."""
    b = b5.reshape(-1, 5).astype(jnp.uint32)
    return jnp.stack(
        [
            b[:, 0] & 0x1F,
            (b[:, 0] >> 5) | ((b[:, 1] & 0x03) << 3),
            (b[:, 1] >> 2) & 0x1F,
            (b[:, 1] >> 7) | ((b[:, 2] & 0x0F) << 1),
            (b[:, 2] >> 4) | ((b[:, 3] & 0x01) << 4),
            (b[:, 3] >> 1) & 0x1F,
            (b[:, 3] >> 6) | ((b[:, 4] & 0x07) << 2),
            b[:, 4] >> 3,
        ],
        axis=-1,
    ).reshape(-1)


def _decode_color_small(packed, off: int, gray8, stride: int, cm: int,
                        h: int, w: int, hc: int, wc: int):
    """Shared yc12 color tail: Cb/Cr planes at stride cm*s + the luma plane
    -> (h, w, 3) u8 (BT.601 inverse; visualization-only color)."""
    cb = packed[off : off + hc * wc].reshape(hc, wc).astype(jnp.float32)
    cr = packed[off + hc * wc : off + 2 * hc * wc].reshape(hc, wc).astype(
        jnp.float32
    )
    # Y for the color plane: average-pool via reshape (contiguous reads) —
    # a [::s, ::s] strided slice of the u8 plane lowers to a scalar-path
    # gather (~0.8 ms/frame); the reshape-mean is a vector reduction and a
    # better 4:2:0 downsample anyway
    y = jnp.mean(
        gray8.reshape(h, stride, w, stride).astype(jnp.float32), axis=(1, 3)
    )
    cb2 = jnp.repeat(jnp.repeat(cb, cm, 0), cm, 1)[:h, :w] - 128.0
    cr2 = jnp.repeat(jnp.repeat(cr, cm, 0), cm, 1)[:h, :w] - 128.0
    r = y + 1.402 * cr2
    g = y - 0.344136 * cb2 - 0.714136 * cr2
    bch = y + 1.772 * cb2
    return jnp.clip(
        jnp.stack([r, g, bch], axis=-1), 0.0, 255.0
    ).astype(jnp.uint8)


def _unpack_yc12(packed, H: int, W: int, stride: int, gray_bits: int = 6,
                 depth_bits: int = 10, return_codes: bool = False):
    """Device-side inverse of compact_frame(fmt="yc12"). Defaults are the
    DELTA-WIRE code space (6/10); product callers always pass explicit bits: packed u8 ->
    (gray u8 (H,W), depth_small f32 meters (h,w), color u8 (h,w,3))
    [+ the raw wire codes (gray q u8, depth q u16) when return_codes —
    the temporal-delta coder's reference state].

    Depth: sqrt codes -> d16 = q^2/2^(2b-16) -> meters (b = depth_bits).
    Color: Y from the stride-s gray plane + Cb/Cr nearest-upsampled from
    stride 2s-or-4s (BT.601 inverse) — all elementwise, fuses into the
    step program. gray_bits=6 unpacks the 4-px-per-3-B luma with
    bit-replication ((q<<2)|(q>>4)); gray_bits=5 the 8-px-per-5-B form
    ((q<<3)|(q>>2))."""
    if gray_bits == "dct":
        from ..ops.dct_wire import dct_luma_len

        n_gray = dct_luma_len(H, W)
    elif gray_bits == 8:
        n_gray = H * W
    elif gray_bits == 6:
        n_gray = (H * W // 4) * 3
    else:
        n_gray = (H * W // 8) * 5
    h, w = H // stride, W // stride
    cm = _chroma_mult(H, W, stride)
    hc, wc = H // (cm * stride), W // (cm * stride)
    codes_g = None
    if gray_bits == "dct":
        from ..ops.dct_wire import decode_luma_dct_dev

        gray8 = decode_luma_dct_dev(packed[:n_gray], H, W)
    elif gray_bits == 5:
        q = _unpack5_codes_dev(packed[:n_gray]).reshape(H, W)
        gray8 = ((q << 3) | (q >> 2)).astype(jnp.uint8)
        codes_g = q.astype(jnp.uint8)
    elif gray_bits == 6:
        g = packed[:n_gray].reshape(-1, 3).astype(jnp.uint32)
        q = jnp.stack(
            [
                g[:, 0] & 0x3F,
                (g[:, 0] >> 6) | ((g[:, 1] & 0x0F) << 2),
                (g[:, 1] >> 4) | ((g[:, 2] & 0x03) << 4),
                g[:, 2] >> 2,
            ],
            axis=-1,
        ).reshape(H, W)
        gray8 = ((q << 2) | (q >> 4)).astype(jnp.uint8)
        codes_g = q.astype(jnp.uint8)
    else:
        gray8 = packed[:n_gray].reshape(H, W)
    if depth_bits == 10:
        n_d12 = (h * w // 4) * 5
        b = packed[n_gray : n_gray + n_d12].reshape(-1, 5).astype(jnp.uint32)
        q0 = b[:, 0] | ((b[:, 1] & 0x03) << 8)
        q1 = (b[:, 1] >> 2) | ((b[:, 2] & 0x0F) << 6)
        q2 = (b[:, 2] >> 4) | ((b[:, 3] & 0x3F) << 4)
        q3 = (b[:, 3] >> 6) | (b[:, 4] << 2)
        qi = jnp.stack([q0, q1, q2, q3], axis=-1).reshape(h, w)
        q = qi.astype(jnp.float32)
        depth_small = q * q * jnp.float32(1.0 / (16.0 * DEPTH_SCALE))
    else:
        n_d12 = (h * w // 2) * 3
        b = packed[n_gray : n_gray + n_d12].reshape(-1, 3).astype(jnp.uint32)
        q0 = b[:, 0] | ((b[:, 1] & 0x0F) << 8)
        q1 = (b[:, 1] >> 4) | (b[:, 2] << 4)
        qi = jnp.stack([q0, q1], axis=-1).reshape(h, w)
        q = qi.astype(jnp.float32)
        depth_small = q * q * jnp.float32(1.0 / (256.0 * DEPTH_SCALE))
    off = n_gray + n_d12
    color = _decode_color_small(packed, off, gray8, stride, cm, h, w, hc, wc)
    if return_codes:
        return gray8, depth_small, color, (codes_g, qi.astype(jnp.uint16))
    return gray8, depth_small, color


def wire_intra_len(H: int, W: int, stride: int, gray_bits: int = 6,
                   depth_bits: int = 10) -> int:
    """Byte length of one compact_frame(fmt="yc12") intra buffer."""
    n_gray = {8: H * W, 6: (H * W // 4) * 3, 5: (H * W // 8) * 5}[gray_bits]
    h, w = H // stride, W // stride
    n_d = (h * w // 4) * 5 if depth_bits == 10 else (h * w // 2) * 3
    cs = _chroma_mult(H, W, stride) * stride
    return n_gray + n_d + 2 * (H // cs) * (W // cs)


def wire_delta_len(H: int, W: int, stride: int) -> int:
    """Byte length of one temporal-delta (P) wire buffer: 4-bit luma
    residuals + 5-bit depth-code residuals + the absolute chroma tail."""
    h, w = H // stride, W // stride
    cs = _chroma_mult(H, W, stride) * stride
    return H * W // 2 + (h * w // 8) * 5 + 2 * (H // cs) * (W // cs)


def _unpack_yc12_delta(packed, H: int, W: int, stride: int, wire_prev):
    """Device-side decode of a temporal-delta (P) frame.

    Closed-loop DPCM against the previous frame's RECONSTRUCTED wire codes
    (wire_prev = (gray q u8 (H,W), depth q u16 (h,w)) — the host encoder
    mirrors this exact integer arithmetic, so host and device states never
    drift): luma residuals are 4-bit (r = clamp(q_cur - q_prev, -8, 7)),
    depth sqrt-code residuals 5-bit (clamp ±16). The reference ships
    nothing per frame (sensor DMA lands in host RAM, node.cpp:101-240); on
    a TPU behind a ~40 MB/s tunnel the wire format IS the ingest design,
    and consecutive frames overlap ~95%, so shipping the temporal delta
    cuts the dominant frame cost by ~37% (336 -> 211 KB at VGA/s2)."""
    h, w = H // stride, W // stride
    cm = _chroma_mult(H, W, stride)
    hc, wc = H // (cm * stride), W // (cm * stride)
    prev_g, prev_d = wire_prev
    n_l = H * W // 2
    b = packed[:n_l].astype(jnp.int16)
    r = jnp.stack([b & 0xF, b >> 4], axis=-1).reshape(H, W) - 8
    qg = jnp.clip(prev_g.astype(jnp.int16) + r, 0, 63).astype(jnp.uint32)
    gray8 = ((qg << 2) | (qg >> 4)).astype(jnp.uint8)
    n_d = (h * w // 8) * 5
    rd = _unpack5_codes_dev(packed[n_l : n_l + n_d]).reshape(h, w).astype(
        jnp.int32
    ) - 16
    qd = jnp.clip(prev_d.astype(jnp.int32) + rd, 0, 1023)
    qf = qd.astype(jnp.float32)
    depth_small = qf * qf * jnp.float32(1.0 / (16.0 * DEPTH_SCALE))
    color = _decode_color_small(
        packed, n_l + n_d, gray8, stride, cm, h, w, hc, wc
    )
    return gray8, depth_small, color, (
        qg.astype(jnp.uint8), qd.astype(jnp.uint16)
    )


def _host_unpack_codes(packed: np.ndarray, H: int, W: int, stride: int,
                       gray_bits: int = 6, depth_bits: int = 10):
    """Host-side wire-code extraction from an INTRA yc12 buffer: the delta
    encoder's state mirror after an I-frame. Reading the codes back off the
    produced buffer (instead of re-deriving them from the pixels) makes the
    mirror exact no matter which encoder produced it (native C, cv2 or
    numpy gray paths)."""
    assert gray_bits == 6 and depth_bits == 10, "delta wire needs 6/10 codes"
    n_gray = (H * W // 4) * 3
    g = packed[:n_gray].reshape(-1, 3).astype(np.uint16)
    qg = np.stack(
        [
            g[:, 0] & 0x3F,
            (g[:, 0] >> 6) | ((g[:, 1] & 0x0F) << 2),
            (g[:, 1] >> 4) | ((g[:, 2] & 0x03) << 4),
            g[:, 2] >> 2,
        ],
        axis=-1,
    ).reshape(H, W).astype(np.uint8)
    h, w = H // stride, W // stride
    n_d = (h * w // 4) * 5
    b = packed[n_gray : n_gray + n_d].reshape(-1, 5).astype(np.uint16)
    qd = np.stack(
        [
            b[:, 0] | ((b[:, 1] & 0x03) << 8),
            (b[:, 1] >> 2) | ((b[:, 2] & 0x0F) << 6),
            (b[:, 2] >> 4) | ((b[:, 3] & 0x3F) << 4),
            (b[:, 3] >> 6) | (b[:, 4].astype(np.uint16) << 2),
        ],
        axis=-1,
    ).reshape(h, w)
    return qg, qd


def delta_encode(rgb, depth, prev_qg: np.ndarray, prev_qd: np.ndarray,
                 stride: int, max_clamp: float = 0.02):
    """Host-side temporal-delta (P) encoder — exact mirror of
    _unpack_yc12_delta. Returns (packed, new_qg, new_qd) or None when the
    clamped-residual fraction exceeds max_clamp (fast motion / scene
    change / depth flicker: the caller ships an I-frame instead, so
    accuracy degrades to at-worst the absolute wire format, never below).
    """
    rgb = np.asarray(rgb)
    depth = np.asarray(depth)
    H, W = depth.shape
    from ..io.native_loader import delta_encode_native

    nat = delta_encode_native(rgb, depth, prev_qg, prev_qd, stride, max_clamp)
    if nat is not None:
        return None if nat == "clamped" else nat
    if rgb.ndim == 3:
        try:
            import cv2

            gray8 = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
        except Exception:
            r16 = rgb.astype(np.uint16)
            gray8 = (
                (r16[..., 0] * 77 + r16[..., 1] * 150 + r16[..., 2] * 29) >> 8
            ).astype(np.uint8)
    else:
        gray8 = (
            rgb if rgb.dtype == np.uint8
            else np.clip(
                rgb * (255.0 if rgb.dtype.kind == "f" else 1.0), 0, 255
            ).astype(np.uint8)
        )
    if depth.dtype == np.uint16:
        d16 = depth
    else:
        d = np.nan_to_num(depth, nan=0.0, posinf=0.0, neginf=0.0)
        d16 = np.clip(d * DEPTH_SCALE, 0, 65535).astype(np.uint16)
    q_cur = (_dither6(gray8) >> 2).astype(np.int16)
    r = q_cur - prev_qg.astype(np.int16)
    rc = np.clip(r, -8, 7)
    qd_cur = _d10_lut()[d16[::stride, ::stride]].astype(np.int32)
    rd = qd_cur - prev_qd.astype(np.int32)
    rdc = np.clip(rd, -16, 15)
    n_clamp = int(np.count_nonzero(r != rc)) + int(
        np.count_nonzero(rd != rdc)
    )
    if n_clamp > max_clamp * (r.size + rd.size):
        return None
    new_qg = (prev_qg.astype(np.int16) + rc).astype(np.uint8)
    new_qd = (prev_qd.astype(np.int32) + rdc).astype(np.uint16)
    cs = _chroma_mult(H, W, stride) * stride
    if rgb.ndim == 3:
        sub = rgb[::cs, ::cs].astype(np.float32)
        rr, gg, bb = sub[..., 0], sub[..., 1], sub[..., 2]
        cb = np.clip(128.0 - 0.168736 * rr - 0.331264 * gg + 0.5 * bb, 0, 255)
        cr = np.clip(128.0 + 0.5 * rr - 0.418688 * gg - 0.081312 * bb, 0, 255)
        cb = cb.astype(np.uint8)
        cr = cr.astype(np.uint8)
    else:
        cb = np.full((H // cs, W // cs), 128, np.uint8)
        cr = np.full((H // cs, W // cs), 128, np.uint8)
    packed = np.concatenate(
        [
            _pack4((rc + 8).astype(np.uint8).reshape(-1)),
            _pack5_codes((rdc + 16).astype(np.uint8).reshape(-1)),
            cb.reshape(-1),
            cr.reshape(-1),
        ]
    )
    return packed, new_qg, new_qd


@functools.partial(
    jax.jit,
    static_argnames=("extractor", "cam", "stride", "min_depth", "max_depth",
                     "use_feature_min_depth", "fmt", "gray_bits",
                     "depth_bits"),
)
def _prepare_and_extract(
    extractor, cam, stride, min_depth, max_depth, use_feature_min_depth,
    packed, fmt: str = "yc12", gray_bits: int = 8, depth_bits: int = 12
):
    """Fused per-frame device prep on the PACKED compact ingest buffer:
    unpack (slice/bitcast), u8 gray -> f32, depth decode -> meters + masking,
    feature depth plane, keypoint extraction — ONE dispatch, ONE h2d."""
    from ..models.orb import feature_depth_map

    H, W = cam.height, cam.width
    if fmt in ("yc12", "ydct"):
        gray8, depth_m, color_small = _unpack_yc12(
            packed, H, W, stride,
            "dct" if fmt == "ydct" else gray_bits, depth_bits
        )
        kp, depth_small = _finish_yc12(
            extractor, cam, stride, min_depth, max_depth,
            use_feature_min_depth, gray8, depth_m,
        )
        return kp, depth_small, color_small
    gray8, depth16, color_small = _unpack_compact(packed, H, W, stride)
    depth = depth16.astype(jnp.float32) * jnp.float32(1.0 / DEPTH_SCALE)
    valid = (depth > min_depth) & (depth < max_depth)
    depth = jnp.where(valid, depth, 0.0)
    gray = gray8.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    kp = extractor(gray, feature_depth_map(depth, valid, use_feature_min_depth), cam)
    return kp, depth[::stride, ::stride], color_small


def _finish_yc12(extractor, cam, stride, min_depth, max_depth,
                 use_feature_min_depth, gray8, depth_m):
    """Shared yc12 tail: depth masking + feature-depth plane + keypoint
    extraction (used by the absolute and temporal-delta ingest paths)."""
    from ..models.orb import feature_depth_map

    H, W = cam.height, cam.width
    valid_s = (depth_m > min_depth) & (depth_m < max_depth)
    depth_small = jnp.where(valid_s, depth_m, 0.0)
    # feature depth reads the stride-s cell (nearest upsample); the
    # reference reads the full-res center pixel (node.cpp:940-944) —
    # the difference is the intra-cell depth gradient, mm-scale off
    # discontinuities, and depth-invalid cells stay invalid
    depth_full = jnp.repeat(
        jnp.repeat(depth_small, stride, 0), stride, 1
    )[:H, :W]
    valid_full = depth_full > 0
    gray = gray8.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    kp = extractor(
        gray,
        feature_depth_map(depth_full, valid_full, use_feature_min_depth),
        cam,
    )
    return kp, depth_small


def _prepare_and_extract_wire(
    extractor, cam, stride, min_depth, max_depth, use_feature_min_depth,
    packed, wire_prev, gray_bits: int = 6, depth_bits: int = 10
):
    """Temporal-delta-aware variant of _prepare_and_extract (traced inside
    the fused device step). Dispatches I vs P by the packed buffer LENGTH —
    a trace-time constant, so each frame type gets its own cached compiled
    step and no in-program branching exists. Returns the wire codes as a
    4th output; the caller threads them into the next frame's call."""
    H, W = cam.height, cam.width
    if int(packed.shape[0]) == wire_intra_len(H, W, stride, gray_bits,
                                              depth_bits):
        gray8, depth_m, color_small, codes = _unpack_yc12(
            packed, H, W, stride, gray_bits, depth_bits, return_codes=True
        )
    else:
        gray8, depth_m, color_small, codes = _unpack_yc12_delta(
            packed, H, W, stride, wire_prev
        )
    kp, depth_small = _finish_yc12(
        extractor, cam, stride, min_depth, max_depth, use_feature_min_depth,
        gray8, depth_m,
    )
    return kp, depth_small, color_small, codes


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _commit_node(
    store: NodeStore,
    graph: GraphState,
    kp: Keypoints,
    depth_small,
    color_small,
    new_id,  # () int32
    base_id,  # () int32 — pose anchor node
    base_T_new,  # (4, 4) — anchor-relative pose (identity for fallback)
    edge_start,  # () int32 — first free edge slot
    e_i,  # (B,) int32
    e_j,  # (B,) int32
    e_meas,  # (B, 4, 4)
    e_info,  # (B, 6, 6)
    e_active,  # (B,) bool
):
    """Insert a node + a batch of edges in ONE donated device call.

    Donation makes the (large) store/graph updates in-place — without it
    every insert copies hundreds of MB of HBM per frame.
    """
    from ..ops.emm import emm_pool_maps

    store = store._replace(
        uv=store.uv.at[new_id].set(kp.uv),
        xyz=store.xyz.at[new_id].set(kp.xyz),
        desc=store.desc.at[new_id].set(kp.desc.astype(store.desc.dtype)),
        kp_valid=store.kp_valid.at[new_id].set(kp.valid),
        depth=store.depth.at[new_id].set(jnp.reshape(depth_small, (-1,))),
        emm_lohi=store.emm_lohi.at[new_id].set(
            jnp.reshape(emm_pool_maps(depth_small), (-1,))
        ),
        emm_zs=store.emm_zs.at[new_id].set(store.zs_row(depth_small)),
        color=store.color.at[new_id].set(store.color_row(color_small)),
    )
    new_pose = graph.poses[base_id] @ base_T_new
    B = e_i.shape[0]
    sl = jnp.arange(B) + edge_start
    graph = graph._replace(
        poses=graph.poses.at[new_id].set(new_pose),
        node_active=graph.node_active.at[new_id].set(True),
        edge_i=graph.edge_i.at[sl].set(jnp.where(e_active, e_i, graph.edge_i[sl])),
        edge_j=graph.edge_j.at[sl].set(jnp.where(e_active, e_j, graph.edge_j[sl])),
        edge_meas=graph.edge_meas.at[sl].set(
            jnp.where(e_active[:, None, None], e_meas, graph.edge_meas[sl])
        ),
        edge_info=graph.edge_info.at[sl].set(
            jnp.where(e_active[:, None, None], e_info, graph.edge_info[sl])
        ),
        edge_active=graph.edge_active.at[sl].set(
            e_active | graph.edge_active[sl]
        ),
    )
    return store, graph


def _icp_rescue_body(
    T0, new_depth_small, cand_depth, cam_small, iterations, emm_skip,
    sigma_depth, variant="gicp",
):
    """Dense ICP refinement + bidirectional EMM gate.

    The reference's GICP/ICP fallback validates its result with the same
    observation likelihood as visual edges (node.cpp:1381-1413). variant
    selects plane-to-plane GICP (the algorithm the reference ships,
    external/gicp/gicp.h:85) or point-to-plane ICP (its PCL-ICP alternative,
    icp.cpp:47-89)."""
    from ..core.camera import backproject_grid
    from ..ops.emm import observation_likelihood
    from ..ops.icp import icp_plane_to_plane, icp_point_to_plane

    new_pts = backproject_grid(new_depth_small, cam_small)
    cand_pts = backproject_grid(cand_depth, cam_small)
    nv = new_depth_small > 0
    cv = cand_depth > 0
    icp_fn = icp_plane_to_plane if variant == "gicp" else icp_point_to_plane
    # converged needs >= 50 pairs at bench scale (320x240 grid, 4800
    # stride-4 samples); miniature grids (e.g. the 80x60 hard-sequence
    # suite, 300 samples) can never reach 50 with the 5 cm correspondence
    # gate under quadratic depth noise — scale the bar with the sampled
    # area, never above the full-scale 50
    n_src = (cam_small.height // 4) * (cam_small.width // 4)
    res = icp_fn(
        T0, new_pts, nv, cand_pts, cv, iterations=iterations,
        min_pairs=min(50, max(16, n_src // 16)),
    )
    a = observation_likelihood(
        res.transform, new_pts, nv, cand_depth, cam_small, emm_skip, sigma_depth
    )
    b = observation_likelihood(
        se3.inv(res.transform), cand_pts, cv, new_depth_small, cam_small,
        emm_skip, sigma_depth,
    )
    n_in = a.inliers + b.inliers
    n_out = a.outliers + b.outliers
    n_all = a.all_projected + b.all_projected
    q = n_in.astype(jnp.float32) / jnp.maximum(n_in + n_out, 1)
    frac = n_in.astype(jnp.float32) / jnp.maximum(n_all, 1)
    return res.transform, res.rmse, res.n_pairs, res.converged, q, frac


_icp_rescue_kernel = functools.partial(
    jax.jit,
    static_argnames=(
        "cam_small", "iterations", "emm_skip", "sigma_depth", "variant"
    ),
)(_icp_rescue_body)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cam_small", "iterations", "emm_skip", "sigma_depth", "variant"
    ),
)
def _icp_rescue_batch_kernel(
    T0s,  # (B, 4, 4) seeds
    new_depth_small,  # (h, w)
    cand_depths,  # (B, h, w)
    cam_small,
    iterations,
    emm_skip,
    sigma_depth,
    variant="gicp",
):
    """ICP-rescue ALL failed candidates in ONE vmapped dispatch — the
    reference runs its ICP fallback per matchNodePair, i.e. for loop
    candidates too (node.cpp:1381-1413); the TPU analog batches them."""
    return jax.vmap(
        lambda T0, cd: _icp_rescue_body(
            T0, new_depth_small, cd, cam_small, iterations, emm_skip,
            sigma_depth, variant,
        )
    )(T0s, cand_depths)


@functools.partial(
    jax.jit,
    static_argnames=("cam_small", "iterations", "emm_skip", "sigma_depth",
                     "variant", "obs_threshold"),
    donate_argnums=(0,),
)
def _retro_rescue_kernel(
    graph: GraphState,
    depth_store,  # (N, h*w) f32 — NodeStore.depth (read-only here)
    new_ids,  # (B,) int32
    pred_ids,  # (B,) int32
    slots,  # (B,) int32 — the fallback edges' slots in the graph
    active,  # (B,) bool — padding mask
    prev0,  # (T (4,4) f32, ok bool, new_id int32) of the previous dispatch's
    #         last rescue — chains constant-velocity seeds across drains
    cam_small,
    iterations: int,
    emm_skip: int,
    sigma_depth: float,
    variant: str,
    obs_threshold: float,
):
    """Retroactive GICP rescue of constant-position fallback edges — the
    fast path's analog of the reference's ICP fallback (node.cpp:1381-1413).

    The fully-on-device step cannot run dense ICP per frame without paying
    for it on every (healthy) frame; instead, when a batched drain discovers
    frames that fell back to constant-position edges (feature starvation:
    darkness, blur, low texture), ONE vmapped dispatch re-aligns each such
    frame against its predecessor's stored depth plane-to-plane, EMM-gates
    the result exactly like a visual edge, and rewrites the fallback edge's
    measurement+information in place (Z = pred_T_new, the graph's edge
    convention). Zero blocking d2h: the per-item verdict flags ride the same
    async-copy channel as step summaries and are consumed at the next drain.
    """
    h, w = cam_small.height, cam_small.width
    d_new = depth_store[new_ids].reshape(-1, h, w)
    d_pred = depth_store[pred_ids].reshape(-1, h, w)
    # Seeding is the whole game here: feature starvation usually hits
    # geometrically plain views too (walls), where depth-only alignment
    # leaves the slide directions unobservable and GICP's prior holds the
    # SEED along them. An identity seed then freezes the trajectory
    # (measured: rescue error == the full 4.5 cm/frame motion), while a
    # constant-velocity seed leaves ~0.02 cm / 0.06 deg error on the same
    # frames. So: the first starved frame seeds from the last two tracked
    # poses, every consecutive starved frame chains the previous rescue's
    # result (scan, not vmap), and the chain carries ACROSS drain batches
    # via prev0 (the last rescue of the previous dispatch).
    prev0_T, prev0_ok, prev0_id = prev0

    def step(carry, inp):
        pT, pok, pid, ppose = carry
        nid, pid_k, dn, dp, act = inp
        consec = pok & (pid_k == pid)
        const_vel = se3.inv(
            graph.poses[jnp.maximum(pid_k - 1, 0)]
        ) @ graph.poses[pid_k]
        seed = jnp.where(consec, pT, const_vel)
        p_pred = jnp.where(consec, ppose, graph.poses[pid_k])
        T, rmse, n_pairs, conv, q, frac = _icp_rescue_body(
            seed, dn, dp, cam_small, iterations, emm_skip, sigma_depth,
            variant,
        )
        ok = act & conv
        if obs_threshold > 0:
            ok = ok & (q > obs_threshold) & (frac > 0.25)
        new_pose = p_pred @ T
        carry = (
            jnp.where(ok, T, seed),
            ok,
            nid,
            jnp.where(ok, new_pose, graph.poses[nid]),
        )
        return carry, (T, ok, n_pairs, rmse, q, new_pose)

    init = (prev0_T, prev0_ok, prev0_id, graph.poses[prev0_id])
    carry, (T, ok, n_pairs, rmse, q, new_pose) = jax.lax.scan(
        step, init, (new_ids, pred_ids, d_new, d_pred, active)
    )
    info_scale = jnp.clip(
        n_pairs.astype(jnp.float32) / (rmse**2 + 4e-4), 0.0, 1e6
    )
    info = jnp.eye(6, dtype=jnp.float32)[None] * info_scale[:, None, None]
    # masked scatter via OOB-drop: rejected/padding rows write nowhere, so
    # duplicate padded slots can never clobber a real update
    e_cap = graph.edge_meas.shape[0]
    n_cap = graph.poses.shape[0]
    idx = jnp.where(ok, slots, e_cap)
    graph = graph._replace(
        edge_meas=graph.edge_meas.at[idx].set(T, mode="drop"),
        edge_info=graph.edge_info.at[idx].set(info, mode="drop"),
        # pose write-back re-anchors the const-pos chain so later drains'
        # const-velocity seeds (and the online optimizer's start point)
        # see the rescued trajectory, not the frozen one
        poses=graph.poses.at[jnp.where(ok, new_ids, n_cap)].set(
            new_pose, mode="drop"
        ),
    )
    flags = jnp.stack(
        [ok.astype(jnp.float32), n_pairs.astype(jnp.float32), rmse, q],
        axis=1,
    )
    return graph, flags, (carry[0], carry[1])


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "huber_delta", "pcg_iters", "solver"),
    donate_argnums=(0,),
)
def _inaffected_kernel(
    graph: GraphState,
    gi,  # (ncap,) int32 global node ids (padded with gi[0])
    ge,  # (ecap,) int32 global edge ids (padded with ge[0])
    li,  # (ecap,) int32 local edge endpoints
    lj,  # (ecap,) int32
    nfix,  # (ncap,) bool — border nodes held fixed
    nact,  # (ncap,) bool
    eact,  # (ecap,) bool
    free_mask,  # (ncap,) bool — which local poses scatter back
    iterations: int = 3,
    huber_delta: float = 1.0,
    pcg_iters: int = 24,
    solver: str = "dense",
):
    """Gather the affected subgraph, optimize it, scatter poses back — ONE
    donated dispatch (pose_relative_to=inaffected, graph_manager.cpp:889-992).
    Eagerly building the subgraph on the host cost ~10 one-op dispatches per
    online optimize (~1 ms each through the tunnel)."""
    sub = GraphState(
        poses=graph.poses[gi],
        node_active=nact,
        node_fixed=nfix,
        edge_i=li,
        edge_j=lj,
        edge_meas=graph.edge_meas[ge],
        edge_info=graph.edge_info[ge],
        edge_active=eact,
    )
    sub, chi2, _ = optimize(
        sub,
        iterations=iterations,
        huber_delta=huber_delta,
        pcg_iters=pcg_iters,
        solver=solver,
    )
    new_poses = jnp.where(free_mask[:, None, None], sub.poses, graph.poses[gi])
    graph = graph._replace(poses=graph.poses.at[gi].set(new_poses))
    return graph, chi2


@dataclasses.dataclass
class MatchDecision:
    """Host-side record of one accepted/rejected candidate comparison."""

    cand_id: int
    accepted: bool
    reason: str
    n_inliers: int = 0
    rmse: float = 0.0
    emm_quality: float = 1.0


class GraphManager:
    def __init__(
        self,
        cam: Intrinsics,
        params: Optional[ParameterServer] = None,
        extractor: Optional[OrbExtractor] = None,
    ):
        self.params = params or default_params()
        p = self.params
        self.cam = cam
        self.n_cap = p["tpu_max_nodes"]
        self.e_cap = p["tpu_max_edges"]
        self.k_cap = p["max_keypoints"]
        self.cand_batch = p["tpu_candidate_batch"]
        self.emm_stride = p["cloud_creation_skip_step"]
        s = self.emm_stride
        self.ingest_fmt = p["tpu_ingest_format"]
        self.gray_bits = p["tpu_gray_bits"]
        self.depth_bits = p["tpu_depth_bits"]
        if self.ingest_fmt == "ydct" and (cam.height % 8 or cam.width % 8):
            logger.warning(
                "frame %dx%d not divisible by 8; ydct ingest falls back "
                "to yc12", cam.width, cam.height
            )
            self.ingest_fmt = "yc12"
        if self.ingest_fmt == "ydct":
            from ..ops import dct_wire

            dct_wire.set_quality(str(p["tpu_dct_quality"]))
        if self.ingest_fmt in ("yc12", "ydct") and (
            cam.height % (2 * s) or cam.width % (2 * s)
        ):
            logger.warning(
                "frame %dx%d not divisible by 2*stride=%d; ingest falls "
                "back to raw", cam.width, cam.height, 2 * s
            )
            self.ingest_fmt = "raw"
        if self.gray_bits == 5 and (cam.height * cam.width) % 8:
            logger.warning(
                "frame area %% 8 != 0; tpu_gray_bits=5 falls back to 6"
            )
            self.gray_bits = 6
        # temporal-delta wire coding (P-frames predict from the previous
        # frame's reconstructed codes; see _unpack_yc12_delta)
        self.wire_delta = bool(p["tpu_wire_delta"])
        if self.wire_delta and not (
            self.ingest_fmt == "yc12"
            and (cam.height * cam.width) % 2 == 0
            and ((cam.height // s) * (cam.width // s)) % 8 == 0
        ):
            logger.warning(
                "tpu_wire_delta needs the yc12 format and aligned frame "
                "sizes; disabled"
            )
            self.wire_delta = False
        if self.wire_delta and (self.gray_bits, self.depth_bits) != (6, 10):
            # the delta scheme's residual codes are defined over the 6-bit
            # luma / 10-bit sqrt-depth quantizers; enabling it implies them.
            # This DOWNGRADES the accuracy defaults (8/12) — the r4 wire A/B
            # measured 6-bit luma costing ~60% L1 protocol ATE — so warn and
            # write the effective values back so introspection matches.
            logger.warning(
                "tpu_wire_delta implies gray_bits=6/depth_bits=10 "
                "(requested %d/%d): expect an L1-ATE cost vs the 8/12 "
                "defaults (see PARITY.md wire A/B)",
                self.gray_bits, self.depth_bits,
            )
            self.gray_bits, self.depth_bits = 6, 10
            p.set("tpu_gray_bits", 6)
            p.set("tpu_depth_bits", 10)
        self._wire_qg: Optional[np.ndarray] = None  # host mirror, luma codes
        self._wire_qd: Optional[np.ndarray] = None  # host mirror, depth codes
        self._wire_dev = None  # device-side (qg, qd) from the last fast step
        self._wire_synced = False  # device state matches the host mirror
        self.cam_small = Intrinsics(
            fx=cam.fx / s,
            fy=cam.fy / s,
            cx=cam.cx / s,
            cy=cam.cy / s,
            width=cam.width // s,
            height=cam.height // s,
        )
        # detector/extractor families are fused on TPU (one kernel computes
        # keypoints AND descriptors); mixing families like the reference's
        # detector!=extractor combos is not supported — SIFT wins if either
        # side requests it (parameter_server.cpp checkValues analog).
        family = (
            p["feature_detector_type"].upper(),
            p["feature_extractor_type"].upper(),
        )
        if extractor is not None:
            self.extractor = extractor
        elif any(f in ("SIFT", "SIFTGPU") for f in family):
            from ..models.sift import SiftExtractor

            self.extractor = SiftExtractor(
                max_keypoints=self.k_cap,
                use_root_sift=p["squareroot_descriptor_space"],
            )
        else:
            known = ("ORB", "FAST", "BRIEF", "BRISK", "FREAK")
            for f in family:
                if f not in known:
                    # the reference warns + falls back to ORB for unbuilt
                    # families (SURF; features.cpp:144-160)
                    logger.warning(
                        "feature family %s not built; falling back to ORB "
                        "(reference behavior, features.cpp:144-160)", f
                    )
            self.extractor = OrbExtractor(
                max_keypoints=self.k_cap,
                fast_threshold=0.06,
                grid=p["detector_grid_resolution"] + 1,
                # 'BRIEF' extractor = un-steered binary tests; 'BRISK' =
                # smoothed ring pairs (ops/brisk.py); 'FREAK' = retinal
                # fields (ops/freak.py) — features.cpp:135-160
                oriented=family[1] != "BRIEF",
                descriptor={"BRISK": "brisk", "FREAK": "freak"}.get(
                    family[1], "brief"
                ),
                approx_select=p["tpu_approx_select"],
            )
        desc_dim = (
            128
            if "Sift" in type(self.extractor).__name__
            else getattr(self.extractor, "desc_bits", 256)
        )
        if "Sift" in type(self.extractor).__name__:
            desc_dtype = jnp.float32
        else:
            # tpu_descriptor_dtype: int8 ±1 rides the MXU Hamming path;
            # bf16/float32 use the (monotone-equivalent for ±1) L2 path.
            desc_dtype = {
                "int8": jnp.int8,
                "bf16": jnp.bfloat16,
                "float32": jnp.float32,
            }[p["tpu_descriptor_dtype"]]
        self.store = NodeStore.create(
            self.n_cap,
            self.k_cap,
            desc_dim,
            self.cam_small.height,
            self.cam_small.width,
            desc_dtype=desc_dtype,
            store_color=p["store_pointclouds"],
            emm_skip=p["emm_skip_step"],
        )
        self.graph = make_graph_state(self.n_cap, self.e_cap)
        self.n_nodes = 0
        self.n_edges = 0
        self.n_loop_edges = 0
        self.n_seq_edges = 0
        self.timestamps: List[float] = []
        self.keyframes: List[int] = [0]
        self.adjacency: Dict[int, Set[int]] = {}
        self.edge_types: List[int] = []
        self.edge_pairs: List[tuple] = []
        self._key = jax.random.PRNGKey(p["tpu_seed"])
        # fast-path RNG: a host counter folded into a fixed key in-program
        # (device_step) — no per-frame host-side split
        self._seed_counter = int(p["tpu_seed"]) * 1_000_003
        self._rng = np.random.default_rng(p["tpu_seed"])
        self.last_decisions: List[MatchDecision] = []
        self.nodes_since_optimize = 0
        self.mapping_enabled = True  # toggleMapping capability (localization-only)
        self.odometry = None  # OdometryProvider (use_robot_odom)
        # localizationUpdate outputs (graph_manager.cpp:660-679)
        self.localization_pose: Optional[np.ndarray] = None
        self.localization_trajectory: List[tuple] = []
        self._loc_poses_host: Optional[np.ndarray] = None  # frozen-map mirror
        # pose_relative_to=inaffected: nodes optimized so far (watermark)
        self._nodes_opt_watermark = 0
        # host mirrors of edge metadata (sync-free fixation/pruning and
        # O(E) subgraph selection as numpy vector ops, not python loops)
        self.edge_active_host = np.zeros(self.e_cap, bool)
        self.edge_i_host = np.full(self.e_cap, -1, np.int32)
        self.edge_j_host = np.full(self.e_cap, -1, np.int32)
        # first-node replacement check (graph_manager.cpp:762-769)
        self._kp_count0 = -1
        self._first_pose = np.eye(4, dtype=np.float32)
        self._clear_queue: List[int] = []  # clear_non_keyframes batching
        self._jit_extract = jax.jit(
            lambda g, d: self.extractor(g, d, self.cam)
        )
        # Adaptive detection (DetectorAdjuster analog,
        # feature_adjuster.cpp:131-175): the FAST threshold is a compile-time
        # constant of the fused detect kernel, so instead of continuous
        # adjustment (a recompile per value) the threshold moves on a ladder
        # of halvings below the configured base — at most adjuster_max_
        # iterations rungs, each a cached compiled variant. Feedback is the
        # drained n_valid_kp summary (zero extra syncs on the fast path).
        self._base_threshold = getattr(self.extractor, "fast_threshold", None)
        self._extractor_rungs: Dict[float, object] = {}
        self._sharded_cmp = None  # mesh-sharded compare (tpu_mesh_devices>1)
        # fast-path (device-decided) bookkeeping
        self._pending = []  # (new_id, padded_cand_ids, summary)
        self._staged_drains = []  # [(pend, stacked summaries)] in flight
        self._contrast_ema = None  # host luma-contrast EMA (starvation alert)
        self._starved_mode = False  # contrast collapsed: drains go sync
        # retroactive fast-path ICP rescues in flight: (pred_ids, slots,
        # flags device array with async copy started) — see
        # _retro_rescue_kernel / _dispatch_retro_rescue
        self._pending_rescues = []
        self.n_icp_rescues = 0
        self._last_rescue = None  # (T dev, ok dev, new_id) of the last rescue
        self._retrieval_scores = None  # deferred appearance retrieval (id, counts)
        self._edge_cursor = 0  # slot allocator (fast path pre-allocates B+1)

    # ------------------------------------------------------------------
    def set_odometry_provider(self, provider):
        """Attach an OdometryProvider (graph_mgr_odom capability)."""
        self.odometry = provider

    # ------------------------------------------------------------------
    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def extract(self, frame: Frame) -> Keypoints:
        from ..models.orb import feature_depth_map

        return self._jit_extract(
            frame.gray,
            feature_depth_map(
                frame.depth, frame.valid, self.params["use_feature_min_depth"]
            ),
        )

    # ------------------------------------------------------------------
    def select_candidates(self, new_id: int, kp: Optional[Keypoints] = None) -> List[int]:
        """Sequential predecessors + geodesic BFS neighbors + random keyframes
        (+ optional appearance-based global retrieval, loop_closing.cpp
        capability, when global_loop_candidates > 0)."""
        p = self.params
        B = self.cand_batch
        preds = list(range(new_id - 1, max(-1, new_id - 1 - p["predecessor_candidates"]), -1))
        out = list(preds)

        # geodesic neighborhood: BFS from the predecessor over graph edges,
        # excluding direct predecessors; sample with 1/depth weighting
        if new_id >= 1 and len(out) < B:
            start = new_id - 1
            depth_of = {start: 0}
            frontier = [start]
            for d in range(1, p["geodesic_depth"] + 1):
                nxt = []
                for u in frontier:
                    for v in self.adjacency.get(u, ()):  # neighbors
                        if v not in depth_of:
                            depth_of[v] = d
                            nxt.append(v)
                frontier = nxt
            cand = [v for v in depth_of if v not in out and v != new_id and depth_of[v] > 0]
            if cand:
                w = np.asarray([1.0 / depth_of[v] for v in cand])
                w = w / w.sum()
                n_geo = min(p["neighbor_candidates"], len(cand), B - len(out))
                if n_geo > 0:
                    sel = self._rng.choice(len(cand), size=n_geo, replace=False, p=w)
                    out.extend(cand[i] for i in sel)

        # appearance-based global retrieval (exact, one MXU matmul)
        n_global = p["global_loop_candidates"]
        if n_global > 0 and kp is not None and len(out) < B and new_id > 4:
            from .loop_closing import retrieve_loop_candidates

            hits = retrieve_loop_candidates(
                kp,
                self.store,
                self.n_nodes,
                exclude_ids=out + [new_id],
                top_n=min(n_global, B - len(out)),
            )
            out.extend(h for h in hits if h not in out)
        elif n_global > 0 and kp is None and len(out) < B \
                and self._retrieval_scores is not None:
            # pipelined path: consume the deferred on-device retrieval
            # dispatched after the PREVIOUS frame's commit. Only if its
            # async copy has actually landed — pulling an in-flight array
            # would block the host on the whole device queue (the zero-sync
            # property the pipeline depends on); a not-yet-ready score set
            # simply waits one more frame (scores stay valid: adjacent
            # frames see the same scene).
            _qid, counts_dev = self._retrieval_scores
            ready = getattr(counts_dev, "is_ready", lambda: True)()
            if ready:
                counts = np.asarray(counts_dev)
                self._retrieval_scores = None  # consumed: next commit re-arms
                n_added = 0
                min_hits = p["tpu_retrieval_min_matches"]
                for i in np.argsort(-counts):
                    i = int(i)
                    if counts[i] >= min_hits and i not in out and i != new_id:
                        out.append(i)
                        n_added += 1
                    # cap at the configured budget (the kp-direct path uses
                    # top_n=min(n_global, B-len(out)) — same bound here, so
                    # appearance hits cannot crowd out keyframe sampling)
                    if n_added >= n_global or len(out) >= B:
                        break

        # random keyframe sampling (loop-closure discovery)
        kf_pool = [k for k in self.keyframes if k not in out and k != new_id]
        n_rand = min(len(kf_pool), B - len(out), max(p["min_sampled_candidates"], 0))
        if n_rand > 0:
            sel = self._rng.choice(len(kf_pool), size=n_rand, replace=False)
            out.extend(kf_pool[i] for i in sel)
        return out[:B]

    # ------------------------------------------------------------------
    @staticmethod
    def _motion_magnitude(T: np.ndarray, dt: float):
        """Host-side (numpy) translation m/s and rotation deg/s — no device
        round trips in the per-frame decision path."""
        dt = max(dt, 1e-3)
        trans = float(np.linalg.norm(T[:3, 3])) / dt
        tr = float(T[0, 0] + T[1, 1] + T[2, 2])
        rot = float(np.degrees(np.arccos(np.clip((tr - 1.0) * 0.5, -1.0, 1.0)))) / dt
        return trans, rot

    def _motion_small(self, T: np.ndarray, dt: float) -> bool:
        """isSmallTrafo: motion below per-second minimum -> redundant frame."""
        p = self.params
        trans, rot = self._motion_magnitude(T, dt)
        return trans < p["min_translation_meter"] and rot < p["min_rotation_degree"]

    def _motion_sane(self, T: np.ndarray, dt: float) -> bool:
        """isBigTrafo inverse: reject impossibly fast motion."""
        p = self.params
        trans, rot = self._motion_magnitude(T, dt)
        return trans <= p["max_translation_meter"] and rot <= p["max_rotation_degree"]

    # ------------------------------------------------------------------
    def _add_edge(self, i: int, j: int, meas: np.ndarray, info_scale: float, etype: int):
        self._add_edge_full(
            i, j, meas, np.eye(6, dtype=np.float32) * info_scale, etype
        )

    def _add_edge_full(self, i: int, j: int, meas: np.ndarray, info: np.ndarray, etype: int):
        e = self.n_edges
        if e >= self.e_cap:
            raise RuntimeError("edge capacity exceeded")
        info = jnp.asarray(info, jnp.float32)
        self.graph = self.graph._replace(
            edge_i=self.graph.edge_i.at[e].set(i),
            edge_j=self.graph.edge_j.at[e].set(j),
            edge_meas=self.graph.edge_meas.at[e].set(jnp.asarray(meas)),
            edge_info=self.graph.edge_info.at[e].set(info),
            edge_active=self.graph.edge_active.at[e].set(True),
        )
        self.n_edges += 1
        self.edge_active_host[e] = True
        self.edge_i_host[e], self.edge_j_host[e] = i, j
        self.adjacency.setdefault(i, set()).add(j)
        self.adjacency.setdefault(j, set()).add(i)
        self.edge_types.append(etype)
        self.edge_pairs.append((i, j))
        if etype == EDGE_LOOP:
            self.n_loop_edges += 1
        elif etype == EDGE_SEQUENTIAL:
            self.n_seq_edges += 1

    def _activate_node(self, idx: int, pose: jnp.ndarray, fixed: bool = False):
        self.graph = self.graph._replace(
            poses=self.graph.poses.at[idx].set(pose),
            node_active=self.graph.node_active.at[idx].set(True),
            node_fixed=self.graph.node_fixed.at[idx].set(fixed),
        )

    def _commit(self, kp, depth_small, color_small, new_id, base_id,
                base_T_new, edges):
        """One donated device call: node insert + pose + edge batch; host
        bookkeeping for adjacency/keyframe structures."""
        B_e = self.cand_batch + 2
        if len(edges) > B_e:
            edges = edges[:B_e]
        if self.n_edges + len(edges) > self.e_cap:
            raise RuntimeError("edge capacity exceeded")
        ei = np.zeros(B_e, np.int32)
        ej = np.zeros(B_e, np.int32)
        meas = np.broadcast_to(np.eye(4, dtype=np.float32), (B_e, 4, 4)).copy()
        info = np.zeros((B_e, 6, 6), np.float32)
        act = np.zeros(B_e, bool)
        for s, (i, j, m, inf, _t) in enumerate(edges):
            ei[s], ej[s], meas[s], info[s], act[s] = i, j, m, inf, True
        self.store, self.graph = _commit_node(
            self.store,
            self.graph,
            kp,
            depth_small,
            color_small,
            jnp.asarray(new_id, jnp.int32),
            jnp.asarray(base_id, jnp.int32),
            jnp.asarray(base_T_new, jnp.float32),
            jnp.asarray(self.n_edges, jnp.int32),
            jnp.asarray(ei),
            jnp.asarray(ej),
            jnp.asarray(meas),
            jnp.asarray(info),
            jnp.asarray(act),
        )
        for (i, j, _m, _inf, etype) in edges:
            self.edge_active_host[self.n_edges] = True
            self.edge_i_host[self.n_edges] = i
            self.edge_j_host[self.n_edges] = j
            self.n_edges += 1
            self.adjacency.setdefault(i, set()).add(j)
            self.adjacency.setdefault(j, set()).add(i)
            self.edge_types.append(etype)
            self.edge_pairs.append((i, j))
            if etype == EDGE_LOOP:
                self.n_loop_edges += 1
            elif etype == EDGE_SEQUENTIAL:
                self.n_seq_edges += 1

    # ------------------------------------------------------------------
    def add_node(
        self,
        frame: Frame,
        timestamp: float,
        ground_truth_pose: Optional[np.ndarray] = None,
    ) -> bool:
        """Compatibility wrapper over the raw-array fast path."""
        img = frame.rgb if frame.rgb.ndim == 3 else frame.gray
        return self.add_frame(img, frame.depth, timestamp, ground_truth_pose)

    def add_frame(
        self,
        rgb,
        depth,
        timestamp: float,
        ground_truth_pose: Optional[np.ndarray] = None,
        compact=None,
    ) -> bool:
        """Process one frame; returns True if the node entered the graph.

        compact: optional pre-packed ingest buffer (compact_frame), possibly
        already device_put by a prefetching caller; rgb/depth are ignored
        when given.

        Device-call budget per frame (the TPU-first hot path): one fused
        prepare+extract dispatch, one candidate-comparison dispatch, one
        scalar result pull, one donated commit — plus an amortized optimize.
        """
        p = self.params
        new_id0 = self.n_nodes
        fast = (
            new_id0 > 0
            and p["keep_all_nodes"]
            and self.mapping_enabled
            and not p["use_robot_odom"]
            and not p["use_robot_odom_only"]
            and p["min_translation_meter"] <= 0
            and p["min_rotation_degree"] <= 0
        )
        if compact is None:
            depth = maybe_scale_depth(depth, p["depth_scaling_factor"])
            if self.wire_delta and fast:
                # encode at dispatch time so the host mirror and the device
                # wire state advance in lockstep (a P-frame is only valid
                # against the state the device actually holds)
                compact = self._wire_encode(rgb, depth)
            else:
                compact = compact_frame(rgb, depth, self.emm_stride,
                                        fmt=self.ingest_fmt,
                                        gray_bits=self.gray_bits,
                                        depth_bits=self.depth_bits)
        # ---- fast path: whole step decided and committed on device --------
        if fast:
            if new_id0 >= self.n_cap:
                raise RuntimeError("node capacity exceeded")
            return self._add_frame_device(compact, timestamp, new_id0, new_id0 - 1)
        self._wire_synced = False  # slow-path frames bypass the delta state

        kp, depth_small, color_small = _prepare_and_extract(
            self.extractor,
            self.cam,
            self.emm_stride,
            p["minimum_depth"],
            p["maximum_depth"],
            p["use_feature_min_depth"],
            jnp.asarray(compact),
            fmt=self.ingest_fmt,
            gray_bits=self.gray_bits,
            depth_bits=self.depth_bits,
        )

        eye4 = np.eye(4, dtype=np.float32)
        if self.n_nodes == 0:
            # firstNode (graph_manager.cpp:360-402): fixed at GT or identity.
            pose = (
                np.asarray(ground_truth_pose, np.float32)
                if ground_truth_pose is not None
                else eye4
            )
            self._commit(
                kp, depth_small, color_small, new_id=0, base_id=0,
                base_T_new=pose, edges=[],
            )
            self.graph = self.graph._replace(
                node_fixed=self.graph.node_fixed.at[0].set(True)
            )
            self.n_nodes = 1
            self._nodes_opt_watermark = 1
            self.timestamps.append(timestamp)
            self.keyframes = [0]
            self.last_decisions = []
            self._first_pose = pose  # kept for first-node replacement
            self._kp_count0 = int(jax.device_get(kp.count()))
            return True

        new_id = self.n_nodes
        if new_id >= self.n_cap:
            raise RuntimeError("node capacity exceeded")
        pred_id0 = new_id - 1
        dt0 = max(timestamp - self.timestamps[pred_id0], 1e-3)

        # ---- odometry-only mode (use_robot_odom_only, graph_mgr_odom) -----
        if p["use_robot_odom_only"]:
            if self.odometry is None:
                raise RuntimeError("use_robot_odom_only without an odometry provider")
            delta = self.odometry.delta(self.timestamps[pred_id0], timestamp)
            if delta is None:
                return False
            from .odometry import odometry_information

            info = odometry_information(dt0, p["odometry_information_factor"])
            self._commit(
                kp, depth_small, color_small, new_id, pred_id0,
                np.asarray(delta, np.float32),
                edges=[(pred_id0, new_id, np.asarray(delta, np.float32), info, EDGE_ODOMETRY)],
            )
            self.n_nodes += 1
            self.timestamps.append(timestamp)
            return True

        cand_ids = self.select_candidates(new_id, kp)
        B = self.cand_batch
        padded = (cand_ids + [cand_ids[0]] * B)[:B]
        cand_idx = jnp.asarray(padded, jnp.int32)

        res: CompareResult = self._compare_dispatch(
            kp, depth_small, cand_idx, self._next_key()
        )
        # Pull scalars to host in ONE transfer (kp count rides along for the
        # detector adjuster when enabled).
        if self._base_threshold is not None and p["adjuster_max_iterations"] > 0:
            host, n_kp = jax.device_get((res, kp.count()))
            self._adapt_detector(int(n_kp))
        else:
            host = jax.device_get(res)
        T_all = host.transform
        n_inl = host.n_inliers
        rmse = host.rmse
        ok = host.ransac_ok
        emm_q = host.emm_quality
        emm_f = host.emm_inlier_frac

        pred_id = new_id - 1
        dt_pred = max(timestamp - self.timestamps[pred_id], 1e-3)
        decisions: List[MatchDecision] = []
        accepted: List[int] = []  # positions into cand list
        seen: Set[int] = set()
        emm_thresh = p["observability_threshold"]
        for b, cid in enumerate(padded):
            if cid in seen:
                continue
            seen.add(cid)
            d = MatchDecision(
                cand_id=cid,
                accepted=False,
                reason="",
                n_inliers=int(n_inl[b]),
                rmse=float(rmse[b]),
                emm_quality=float(emm_q[b]),
            )
            if not ok[b]:
                d.reason = "ransac_failed"
            elif emm_thresh > 0 and not (
                emm_q[b] > emm_thresh and emm_f[b] > 0.25
            ):
                d.reason = "emm_rejected"
            else:
                dt = max(abs(timestamp - self.timestamps[cid]), 1e-3)
                # sanity gate applies to sequential motion only (reference
                # checks predecessor motion; loop closures may be large)
                if cid == pred_id and not self._motion_sane(T_all[b], dt):
                    d.reason = "motion_insane"
                else:
                    d.accepted = True
                    d.reason = "ok"
                    accepted.append(b)
            decisions.append(d)
        mc = p["max_connections"]
        if mc > 0 and len(accepted) > mc:
            # "enough is enough" (node.cpp:1310-1312): keep the mc best
            accepted = sorted(
                accepted, key=lambda b: -int(n_inl[b])
            )[:mc]
        self.last_decisions = decisions

        # ---- localization-only mode (localizationUpdate semantics,
        # graph_manager.cpp:660-679): estimate the current pose from the best
        # accepted match WITHOUT growing the graph or the store. ------------
        if not self.mapping_enabled:
            if accepted:
                best_b = max(accepted, key=lambda b: n_inl[b])
                cid = padded[best_b]
                # poses are frozen in localization mode; toggle_mapping(False)
                # pulled a host mirror once, so no per-frame device_get here
                if self._loc_poses_host is None:
                    self._loc_poses_host = self.poses()
                world_T_cand = np.asarray(
                    self._loc_poses_host[cid], np.float32
                )
                pose = world_T_cand @ np.asarray(T_all[best_b], np.float32)
                self.localization_pose = pose
                self.localization_trajectory.append((timestamp, pose))
                return True
            return False

        # Redundancy filter: motion to predecessor too small -> drop frame
        # (isSmallTrafo semantics; keep if it's been long since last node).
        pred_pos = next(
            (i for i, b in enumerate(accepted) if padded[b] == pred_id), None
        )
        if (
            pred_pos is not None
            and len(accepted) > 0
            and self._motion_small(T_all[accepted[pred_pos]], dt_pred)
        ):
            return False

        # ---- ICP fallback rescue (use_icp; node.cpp:1381-1413): the
        # reference runs its ICP fallback per matchNodePair — predecessor
        # AND loop candidates. All visually-failed candidates are rescued in
        # ONE batched dispatch: dense point-to-plane ICP seeded by the
        # failed RANSAC transform (identity for the predecessor), each
        # result EMM-gated like a visual edge.
        icp_results: Dict[int, tuple] = {}  # cid -> (T, info, n, rmse)
        accepted_ids_now = {padded[b] for b in accepted}
        if p["use_icp"]:
            failed = [
                d.cand_id for d in decisions
                if not d.accepted and d.cand_id not in accepted_ids_now
            ]
            if failed:
                icp_results = self._icp_rescue_batch(
                    depth_small, failed, padded, T_all, ok
                )
                for cid, (T_icp, _info, n_pairs, rmse_icp) in icp_results.items():
                    decisions.append(
                        MatchDecision(
                            cand_id=cid, accepted=True, reason="icp",
                            n_inliers=int(n_pairs), rmse=float(rmse_icp),
                        )
                    )
        icp_edge = icp_results.get(pred_id)

        eye4 = np.eye(4, dtype=np.float32)
        edges = []  # (i, j, meas, info6x6, etype)
        base_id, base_T_new = pred_id, eye4
        if accepted:
            # Initial pose from the best (most inliers) accepted edge.
            best_b = max(accepted, key=lambda b: n_inl[b])
            base_id = padded[best_b]
            base_T_new = np.asarray(T_all[best_b], np.float32)
            geodesic = self._geodesic_set(pred_id, p["geodesic_depth"])
            for b in accepted:
                cid = padded[b]
                info_scale = float(n_inl[b]) / max(float(rmse[b]) ** 2, 1e-4)
                info = np.eye(6, dtype=np.float32) * info_scale
                if p["tpu_edge_info"] == "hessian":
                    h6 = np.asarray(host.info6[b], np.float32)
                    tr = float(np.trace(h6)) / 6.0
                    if np.isfinite(h6).all() and tr > 0:
                        info = h6 * (info_scale / tr)
                etype = (
                    EDGE_SEQUENTIAL
                    if (cid == pred_id or cid in geodesic)
                    else EDGE_LOOP
                )
                edges.append(
                    (cid, new_id, np.asarray(T_all[b], np.float32),
                     info, etype)
                )
        if icp_results:
            geodesic = self._geodesic_set(pred_id, p["geodesic_depth"])
            for cid, (T_icp, info_icp, _n, _r) in icp_results.items():
                etype = (
                    EDGE_SEQUENTIAL
                    if (cid == pred_id or cid in geodesic)
                    else EDGE_LOOP
                )
                edges.append((cid, new_id, T_icp, info_icp, etype))
            if not accepted and icp_edge is not None:
                base_id, base_T_new = pred_id, icp_edge[0]
        if not edges:
            if p["keep_all_nodes"] or (
                p["keep_good_nodes"]
                and int(jax.device_get(kp.count())) > p["min_keypoints"]
            ):
                # Fallback constant-position edge (graph_manager.cpp:636-655).
                info_scale = p["constant_position_information"] / dt_pred
                edges.append(
                    (pred_id, new_id, eye4,
                     np.eye(6, dtype=np.float32) * info_scale,
                     EDGE_CONST_POSITION)
                )
            else:
                # First-node replacement (graph_manager.cpp:762-769): if the
                # graph still only holds the first node and this unmatched
                # frame has more features, it becomes the new first node.
                if new_id == 1:
                    n_new = int(jax.device_get(kp.count()))
                    if n_new > self._kp_count0:
                        self._commit(
                            kp, depth_small, color_small, new_id=0, base_id=0,
                            base_T_new=self._first_pose, edges=[],
                        )
                        self.timestamps[0] = timestamp
                        self._kp_count0 = n_new
                return False

        # Robot odometry edge alongside visual edges (graph_mgr_odom.cpp:62).
        if p["use_robot_odom"] and self.odometry is not None:
            delta = self.odometry.delta(self.timestamps[pred_id], timestamp)
            if delta is not None:
                from .odometry import odometry_information

                info = odometry_information(dt_pred, p["odometry_information_factor"])
                edges.append((pred_id, new_id, np.asarray(delta, np.float32), info, EDGE_ODOMETRY))

        self._commit(kp, depth_small, color_small, new_id, base_id, base_T_new, edges)
        self.n_nodes += 1
        self.timestamps.append(timestamp)

        # Keyframe bookkeeping (addKeyframe :784-809): if no accepted edge
        # reaches the latest keyframe, the predecessor becomes a keyframe.
        if not any(padded[b] in self.keyframes for b in accepted):
            if self.keyframes[-1] != pred_id:
                self.keyframes.append(pred_id)
        self._maybe_clear_non_keyframes(new_id)

        self.nodes_since_optimize += 1
        if self.nodes_since_optimize >= p["optimizer_skip_step"]:
            # online: dispatch async with a lighter budget; the final
            # evaluation protocol runs the heavy blocking optimization
            self.optimize(
                iterations=p["online_optimizer_iterations"],
                blocking=False,
                pcg_iters=24,
            )
        return True

    # ------------------------------------------------------------------
    def _step_cfg(self) -> dict:
        """Static config kwargs shared by slam_step and slam_step2."""
        p = self.params
        return dict(
            extractor=self.extractor,
            cam=self.cam,
            cam_small=self.cam_small,
            stride=self.emm_stride,
            ingest_fmt=self.ingest_fmt,
            gray_bits=self.gray_bits,
            depth_bits=self.depth_bits,
            min_depth=p["minimum_depth"],
            max_depth=p["maximum_depth"],
            max_matches=p["max_matches"],
            ratio=p["nn_distance_ratio"],
            n_hypotheses=p["ransac_iterations"],
            max_mahal_sq=p["max_dist_for_inliers"] ** 2,
            min_inliers=p["min_matches"],
            emm_skip=p["emm_skip_step"],
            sigma_depth=p["sigma_depth"],
            sample_size=p["sample_candidates"],
            refine_iterations=p["refine_iterations"],
            projective_iterations=p["g2o_transformation_refinement"],
            emm_exact=p["tpu_emm_exact"],
            edge_info_mode=p["tpu_edge_info"],
            observability_threshold=p["observability_threshold"],
            max_translation_per_s=p["max_translation_meter"],
            max_rotation_deg_per_s=p["max_rotation_degree"],
            const_pos_information=p["constant_position_information"],
            keep_all=True,
            use_feature_min_depth=p["use_feature_min_depth"],
            wire_delta=self.wire_delta,
        )

    def _wire_dev_init(self):
        """Zero device wire state: I-frames ignore it (they rebuild state
        from their own codes) but passing a consistent pytree structure
        keeps the step at two compiled variants (I and P) instead of three.
        """
        if self._wire_dev is None:
            s = self.emm_stride
            self._wire_dev = (
                jnp.zeros((self.cam.height, self.cam.width), jnp.uint8),
                jnp.zeros(
                    (self.cam.height // s, self.cam.width // s), jnp.uint16
                ),
            )
        return self._wire_dev

    def _wire_encode(self, rgb, depth) -> np.ndarray:
        """Delta-aware host wire encoder for the fast path: ship a P-frame
        (residuals vs the mirrored device reconstruction) when the device
        state is synced and the clamp budget holds; otherwise an absolute
        I-frame (whose codes _add_frame_device reads back into the mirror).
        """
        if self._wire_synced and self._wire_qg is not None:
            out = delta_encode(
                rgb, depth, self._wire_qg, self._wire_qd, self.emm_stride,
                self.params["tpu_wire_delta_max_clamp"],
            )
            if out is not None:
                packed, self._wire_qg, self._wire_qd = out
                return packed
        packed = compact_frame(rgb, depth, self.emm_stride, fmt="yc12",
                               gray_bits=self.gray_bits,
                               depth_bits=self.depth_bits)
        self._wire_qg, self._wire_qd = _host_unpack_codes(
            packed, self.cam.height, self.cam.width, self.emm_stride,
            self.gray_bits, self.depth_bits,
        )
        # valid because every _wire_encode caller dispatches this buffer
        # through the delta fast path next (the device rebuilds its state
        # from the I-frame codes)
        self._wire_synced = True
        return packed

    def _frame_slots(self, new_id: int, timestamp: float):
        """Candidate selection + padding + dt vector for one frame of the
        fast path (shared by the single and paired dispatches)."""
        cand_ids = self.select_candidates(new_id)  # host, possibly-stale
        B = self.cand_batch
        padded = (cand_ids + [cand_ids[0]] * B)[:B]
        dup = [False] * len(cand_ids) + [True] * (B - len(cand_ids))
        dup = dup[:B]
        dts = [max(abs(timestamp - self.timestamps[c]), 1e-3) for c in padded]
        pred_id = new_id - 1
        # slot 0 must be the predecessor (fallback dt uses cand_dt[0])
        if padded[0] != pred_id and pred_id in padded:
            k = padded.index(pred_id)
            padded[0], padded[k] = padded[k], padded[0]
            dup[0], dup[k] = dup[k], dup[0]
            dts[0], dts[k] = dts[k], dts[0]
        return padded, dup, dts

    def can_group(self, n: int = 2) -> bool:
        """True when the next n frames may go through the fused n-frame
        device step (same preconditions as the single fast path, plus at
        least one existing node to anchor poses)."""
        p = self.params
        return (
            self.n_nodes > 0
            and p["keep_all_nodes"]
            and self.mapping_enabled
            and not p["use_robot_odom"]
            and not p["use_robot_odom_only"]
            and p["min_translation_meter"] <= 0
            and p["min_rotation_degree"] <= 0
            and self.n_nodes + n <= self.n_cap
            and self.n_edges + n * (self.cand_batch + 1) <= self.e_cap
        )

    def can_pair(self) -> bool:
        return self.can_group(2)

    def add_frame_pair(self, compact0, ts0, compact1, ts1) -> None:
        """TWO consecutive frames in ONE device dispatch; see
        add_frame_group."""
        self.add_frame_group((compact0, compact1), (ts0, ts1))

    def add_frame_group(self, compacts, tss) -> None:
        """N consecutive frames in ONE device dispatch (slam_stepN):
        divides the per-frame fixed dispatch cost — the round-5 bound, see
        WIRE.md and make_slam_stepN — by N (tpu_frames_per_step=N).
        Caller must check can_group(len(compacts)) first."""
        from .device_step import make_slam_stepN

        p = self.params
        B = self.cand_batch
        n = len(compacts)
        ids = [self.n_nodes + k for k in range(n)]
        # frame k selects against host state that already includes frames
        # < k (their timestamps; adjacency remains one drain stale, as
        # always) — append as we go, roll back after
        slots = []
        added = 0
        try:
            for k in range(n):
                slots.append(self._frame_slots(ids[k], tss[k]))
                if k < n - 1:
                    self.timestamps.append(tss[k])
                    self.n_nodes += 1
                    added += 1
        finally:
            for _ in range(added):
                self.timestamps.pop()
            self.n_nodes -= added
        e_starts = [self.n_edges + k * (B + 1) for k in range(n)]
        self._seed_counter += n
        if len({len(c) for c in compacts}) == 1 and all(
            isinstance(c, np.ndarray) for c in compacts
        ):
            packed_n = np.stack(compacts)  # ONE h2d buffer
        else:  # delta-wire I/P mix: lengths differ, ship as a tuple
            packed_n = tuple(compacts)
        self.store, self.graph, sums, new_wire = make_slam_stepN(n)(
            self.store,
            self.graph,
            packed_n,
            np.asarray(ids, np.int32),
            np.asarray([i - 1 for i in ids], np.int32),
            np.asarray([s[0] for s in slots], np.int32),
            np.asarray([s[1] for s in slots], bool),
            np.asarray([s[2] for s in slots], np.float32),
            np.asarray(e_starts, np.int32),
            np.asarray(
                [self._seed_counter - n + 1 + k for k in range(n)],
                np.uint32,
            ),
            self._wire_dev_init() if self.wire_delta else None,
            **self._step_cfg(),
        )
        if self.wire_delta:
            self._wire_dev = new_wire
            self._wire_synced = True
        for k in range(n):
            self.n_edges = e_starts[k] + B + 1
            self.edge_pairs.extend([None] * (B + 1))
            self.edge_types.extend([-1] * (B + 1))
            if not p["tpu_drain_pipelined"]:
                sums[k].copy_to_host_async()
            self._pending.append((ids[k], list(slots[k][0]), e_starts[k],
                                  sums[k]))
            self.n_nodes += 1
            self.timestamps.append(tss[k])
        if p["global_loop_candidates"] > 0 and ids[-1] >= 8 \
                and self._retrieval_scores is None:
            from .loop_closing import global_match_scores_from_store

            counts = global_match_scores_from_store(
                self.store, np.int32(ids[-1]), np.int32(self.n_nodes)
            )
            counts.copy_to_host_async()
            self._retrieval_scores = (ids[-1], counts)
        # evaluate every alert (the tracker is stateful) before combining
        alerts = [self._starvation_alert(c) for c in compacts]
        if any(alerts):
            self._drain_pending()  # see _add_frame_device: ladder latency
        self._consume_ready_staged()
        if len(self._pending) >= p["tpu_drain_interval"]:
            self._drain_pending(keep_newest=2)
        self.nodes_since_optimize += n
        if self.nodes_since_optimize >= p["optimizer_skip_step"]:
            self.optimize(
                iterations=p["online_optimizer_iterations"],
                blocking=False,
                pcg_iters=24,
            )

    def _add_frame_device(self, compact, timestamp, new_id, pred_id) -> bool:
        """Zero-host-round-trip step (see graph/device_step.py): dispatch one
        donated device program; bookkeeping drains in batches.

        compact: packed u8 ingest buffer (compact_frame); numpy or an
        already-device_put array (the pipeline prefetches it)."""
        from .device_step import slam_commit, slam_compute

        p = self.params
        B = self.cand_batch
        padded, dup, dts = self._frame_slots(new_id, timestamp)

        edge_start = self.n_edges
        if edge_start + B + 1 > self.e_cap:
            raise RuntimeError("edge capacity exceeded")
        if self.wire_delta and len(compact) == wire_intra_len(
            self.cam.height, self.cam.width, self.emm_stride,
            self.gray_bits, self.depth_bits,
        ):
            # absolute I-frame entering the delta path (first fast frame,
            # clamp fallback, or a precomputed buffer): refresh the host
            # mirror from the wire codes themselves so it matches the
            # device reconstruction bit-for-bit
            self._wire_qg, self._wire_qd = _host_unpack_codes(
                np.asarray(compact), self.cam.height, self.cam.width,
                self.emm_stride, self.gray_bits, self.depth_bits,
            )
        # All small args go in as NUMPY values: eager jnp.asarray on the host
        # dispatches one tiny device op per argument (~1 ms each through the
        # tunnel); jit bundles numpy args into the call instead.
        # TWO queued dispatches: compute (reads state) then commit (donated
        # scatter-only) — see device_step._commit_body for why the split.
        self._seed_counter += 1
        (rows, new_pose, e_i, e_j, e_meas, e_info, e_active, summary,
         new_wire) = \
            slam_compute(
                self.store,
                self.graph,
                compact,
                np.int32(new_id),
                np.int32(pred_id),
                np.asarray(padded, np.int32),
                np.asarray(dup, bool),
                np.asarray(dts, np.float32),
                np.uint32(self._seed_counter),
                self._wire_dev_init() if self.wire_delta else None,
                **self._step_cfg(),
            )
        if self.wire_delta:
            self._wire_dev = new_wire
            self._wire_synced = True
        self.store, self.graph = slam_commit(
            self.store, self.graph, rows, new_pose,
            np.int32(new_id), np.int32(edge_start),
            e_i, e_j, e_meas, e_info, e_active,
        )
        # Reserve the B+1 slots; host lists fill at drain time.
        self.n_edges = edge_start + B + 1
        self.edge_pairs.extend([None] * (B + 1))
        self.edge_types.extend([-1] * (B + 1))
        # Start the device->host copy of the packed summary NOW: the drain
        # happens several frames later, so the transfer lands long before
        # it's read and the drain's device_get never pays the link
        # round-trip (on the tunnel a blocking pull costs ~40-80 ms).
        if not p["tpu_drain_pipelined"]:
            summary.copy_to_host_async()
        self._pending.append((new_id, list(padded), edge_start, summary))
        self.n_nodes += 1
        self.timestamps.append(timestamp)
        if p["global_loop_candidates"] > 0 and new_id >= 8 \
                and self._retrieval_scores is None:
            # deferred appearance retrieval: the store now holds this frame's
            # descriptors; score all nodes on device and async-pull. The
            # result is consumed by a later frame's candidate selection ONCE
            # its copy has landed (select_candidates polls is_ready) — the
            # self-pacing keeps the path strictly zero-sync: one retrieval
            # in flight at a time, re-armed after each consumption. Loop
            # hypotheses stay valid over the few frames of lag (adjacent
            # frames see the same scene).
            from .loop_closing import global_match_scores_from_store

            counts = global_match_scores_from_store(
                self.store, np.int32(new_id), np.int32(self.n_nodes)
            )
            counts.copy_to_host_async()
            self._retrieval_scores = (new_id, counts)
        if self._starvation_alert(compact):
            # contrast collapsed THIS frame: flush everything, including
            # this frame's summary, so the adaptive ladder reacts on the
            # next frame instead of a drain interval later
            self._drain_pending()
        self._consume_ready_staged()
        if len(self._pending) >= p["tpu_drain_interval"]:
            # keep the newest 2 entries pending: their device steps are still
            # in flight, and pulling them would stall the host for the whole
            # queue depth (~100 ms); entries 2+ frames old have landed
            self._drain_pending(keep_newest=2)
        self.nodes_since_optimize += 1
        if self.nodes_since_optimize >= p["optimizer_skip_step"]:
            self.optimize(
                iterations=p["online_optimizer_iterations"],
                blocking=False,
                pcg_iters=24,
            )
        return True

    def _drain_pending(self, keep_newest: int = 0):
        """Batch-pull step summaries; update adjacency/keyframes/edge lists.

        keep_newest > 0 leaves the most recent entries pending (their device
        steps may still be in flight; the async copies of older entries have
        landed, so pulling them is free). All blocking/consistency paths call
        with keep_newest=0.

        tpu_drain_pipelined restructures the pull for the eager tunnel
        (WIRE.md: every blocking d2h costs >=28 ms): instead of getting N
        separate summary buffers, the drain stacks them into ONE device
        array (one tiny dispatch), starts its async copy, and processes it
        at the NEXT drain — by then the copy landed, so the get is
        host-local and the per-drain fixed cost (~80 ms measured,
        tools/frame_budget.py) drops to ~0. Bookkeeping lags at most one
        extra drain interval; consistency paths (keep_newest=0) flush the
        staged batch synchronously, so every blocking caller still sees
        fully current host mirrors."""
        self._consume_rescues()
        batches = []  # (pend entries, stacked array or None)
        if len(self._pending) > keep_newest:
            if keep_newest:
                pend = self._pending[:-keep_newest]
                self._pending = self._pending[-keep_newest:]
            else:
                pend = self._pending
                self._pending = []
            shapes = {s.shape for (_, _, _, s) in pend}
            if (self.params["tpu_drain_pipelined"] and len(shapes) == 1
                    and not self._starved_mode):
                stack = jnp.stack([s for (_, _, _, s) in pend])
                stack.copy_to_host_async()
                self._staged_drains.append((pend, stack))
                if keep_newest:
                    # consume staged batches whose async copy already
                    # landed (is_ready is a local check, no round trip);
                    # cap the in-flight queue at 2 so host bookkeeping
                    # never lags unboundedly on a stalled tunnel
                    while self._staged_drains and (
                        len(self._staged_drains) > 2
                        or getattr(self._staged_drains[0][1], "is_ready",
                                   lambda: True)()
                    ):
                        batches.append(self._staged_drains.pop(0))
                else:
                    while self._staged_drains:
                        batches.append(self._staged_drains.pop(0))
            else:
                # drains must land in frame order: anything already staged
                # predates this pend (mixed-shape pend or a live toggle of
                # tpu_drain_pipelined), so flush the staged queue first
                while self._staged_drains:
                    batches.append(self._staged_drains.pop(0))
                batches.append((pend, None))
        elif keep_newest == 0 and self._staged_drains:
            while self._staged_drains:
                batches.append(self._staged_drains.pop(0))
        if not batches:
            return
        retro_fallbacks = []  # (new_id, fb_slot) for the ICP rescue
        for pend, stack in batches:
            if stack is not None:
                flats = list(np.asarray(stack))
            else:
                flats = jax.device_get([s for (_, _, _, s) in pend])
            self._drain_batch(pend, flats, retro_fallbacks)
        # Feature starvation kills the pipelining win: the adaptive ladder
        # (_adapt_detector) reacts to drained keypoint counts, and the one-
        # drain staging lag doubles its reaction latency — measured 2x the
        # constant-position edges / +50% ATE on the dark_stretch suite. So
        # while the ladder is engaged (threshold below base), consume the
        # just-staged batch synchronously too: one blocking pull per
        # STARVED drain (~30 ms on the tunnel) buys back the old latency
        # exactly when the ladder must react inside the starved stretch.
        while (self._staged_drains and self._base_threshold is not None
               and self.extractor.fast_threshold < self._base_threshold):
            pend, stack = self._staged_drains.pop(0)
            self._drain_batch(pend, list(np.asarray(stack)), retro_fallbacks)
        if retro_fallbacks and self.params["use_icp"]:
            self._dispatch_retro_rescue(retro_fallbacks)

    def _starvation_alert(self, packed) -> bool:
        """Host-side early warning for an abrupt scene-contrast collapse
        (auto-exposure failure / lights off — the dark_stretch regime),
        from the packed wire's luma bytes at zero device syncs.

        Why: the zero-pull fast path learns keypoint counts only at drain
        time, and the pipelined drain consumes summaries only once their
        async copy lands behind the dispatch queue — measured 10+ frames of
        adaptive-detector lag, which doubled the constant-position edges on
        the dark_stretch suite (the ladder engaged after the dark stretch
        had passed). A >2.5x contrast step on the host triggers ONE fully
        blocking drain (~100 ms on the tunnel, once per lighting event) so
        the ladder sees the starved count on the very next frame. The EMA
        re-bases on alert, so a sustained dark stretch alerts once."""
        if self.wire_delta or not isinstance(packed, np.ndarray):
            return False  # P-frame residuals / device-put buffers: skip
        H, W = self.cam.height, self.cam.width
        if self.ingest_fmt == "ydct":
            from ..ops.dct_wire import BIT_ALLOC

            # DC bit-plane bytes (block means): exactly the right signal
            n = ((H // 8) * (W // 8) * int(BIT_ALLOC[0]) + 7) // 8
        elif self.ingest_fmt == "yc12" and self.gray_bits == 6:
            n = (H * W // 4) * 3
        elif self.ingest_fmt == "yc12" and self.gray_bits == 5:
            n = (H * W // 8) * 5
        else:  # raw / yc12 gray8: plain luma bytes
            n = H * W
        c = float(np.asarray(packed[:n:127], np.float32).std()) + 1e-3
        ema = self._contrast_ema
        if ema is None:
            self._contrast_ema = c
            return False
        alert = abs(float(np.log(c / ema))) > 0.916  # log(2.5)
        if alert:
            # a collapse ENTERS starved mode (drains go synchronous until
            # contrast recovers: at starvation thresholds the ladder needs
            # per-drain feedback, and matching failures need the rescue
            # machinery to see fresh summaries); a recovery CLEARS it
            self._starved_mode = c < ema
            self._contrast_ema = c
        else:
            self._contrast_ema = 0.9 * ema + 0.1 * c
        return alert

    def _consume_ready_staged(self):
        """Per-frame zero-sync consumption of staged drain batches whose
        async copy landed (tpu_drain_pipelined): keeps the adaptive-detector
        feedback latency at ~the transfer RTT (1-2 frames) instead of a
        full drain interval — the onset lag is what turned the dark_stretch
        suite's constant-position edges from 7 to 14."""
        retro = []
        while self._staged_drains and getattr(
                self._staged_drains[0][1], "is_ready", lambda: True)():
            pend, stack = self._staged_drains.pop(0)
            self._drain_batch(pend, list(np.asarray(stack)), retro)
        if retro and self.params["use_icp"]:
            self._dispatch_retro_rescue(retro)

    def _drain_batch(self, pend, flats, retro_fallbacks):
        from .device_step import StepSummary

        for (new_id, padded, edge_start, _), flat in zip(pend, flats):
            s = StepSummary.unpack(np.asarray(flat), len(padded))
            pred_id = new_id - 1
            B = len(padded)
            accepted_ids = []
            geodesic = self._geodesic_set(pred_id, self.params["geodesic_depth"])
            decisions = []
            for b, cid in enumerate(padded):
                slot = edge_start + b
                self.edge_i_host[slot] = cid
                self.edge_j_host[slot] = new_id
                if bool(s.accepted[b]):
                    etype = (
                        EDGE_SEQUENTIAL
                        if (cid == pred_id or cid in geodesic)
                        else EDGE_LOOP
                    )
                    self.edge_pairs[slot] = (cid, new_id)
                    self.edge_types[slot] = etype
                    self.edge_active_host[slot] = True
                    self.adjacency.setdefault(cid, set()).add(new_id)
                    self.adjacency.setdefault(new_id, set()).add(cid)
                    accepted_ids.append(cid)
                    if etype == EDGE_LOOP:
                        self.n_loop_edges += 1
                    else:
                        self.n_seq_edges += 1
                else:
                    self.edge_pairs[slot] = (cid, new_id)
                decisions.append(
                    MatchDecision(
                        cand_id=cid,
                        accepted=bool(s.accepted[b]),
                        reason="ok" if bool(s.accepted[b]) else "rejected",
                        n_inliers=int(s.n_inliers[b]),
                        rmse=float(s.rmse[b]),
                        emm_quality=float(s.emm_quality[b]),
                    )
                )
            fb_slot = edge_start + B
            self.edge_pairs[fb_slot] = (pred_id, new_id)
            self.edge_i_host[fb_slot] = pred_id
            self.edge_j_host[fb_slot] = new_id
            if bool(s.fallback_used):
                self.edge_types[fb_slot] = EDGE_CONST_POSITION
                self.edge_active_host[fb_slot] = True
                self.adjacency.setdefault(pred_id, set()).add(new_id)
                self.adjacency.setdefault(new_id, set()).add(pred_id)
                retro_fallbacks.append((new_id, fb_slot))
            self.last_decisions = decisions
            # keyframe bookkeeping (addKeyframe :784-809)
            if not any(c in self.keyframes for c in accepted_ids):
                if self.keyframes[-1] != pred_id:
                    self.keyframes.append(pred_id)
            self._maybe_clear_non_keyframes(new_id)
            # adaptive detection feedback (newest drained frame's count)
            self._adapt_detector(s.n_valid_kp)

    def _dispatch_retro_rescue(self, fallbacks):
        """ONE batched on-device GICP rescue of this drain's constant-
        position fallback edges (zero blocking d2h; verdict flags drain
        later). fallbacks: [(new_id, fb_slot)]."""
        p = self.params
        cap = max(int(p["tpu_drain_interval"]), 1)
        for k0 in range(0, len(fallbacks), cap):
            chunk = fallbacks[k0 : k0 + cap]
            n = len(chunk)
            new_ids = [nid for nid, _ in chunk] + [chunk[0][0]] * (cap - n)
            slots = [sl for _, sl in chunk] + [chunk[0][1]] * (cap - n)
            active = [True] * n + [False] * (cap - n)
            if self._last_rescue is None:
                prev0 = (
                    jnp.eye(4, dtype=jnp.float32),
                    jnp.asarray(False),
                    np.int32(0),
                )
            else:
                prev0 = self._last_rescue
            self.graph, flags, (lT, lok) = _retro_rescue_kernel(
                self.graph,
                self.store.depth,
                np.asarray(new_ids, np.int32),
                np.asarray(new_ids, np.int32) - 1,
                np.asarray(slots, np.int32),
                np.asarray(active, bool),
                prev0,
                self.cam_small,
                int(p["icp_max_iterations"]),
                int(p["emm_skip_step"]),
                float(p["sigma_depth"]),
                str(p["icp_variant"]),
                float(p["observability_threshold"]),
            )
            self._last_rescue = (lT, lok, np.int32(chunk[-1][0]))
            flags.copy_to_host_async()
            self._pending_rescues.append((list(new_ids[:n]), slots[:n], flags))

    def _consume_rescues(self):
        """Fold landed retro-rescue verdicts into the host mirrors (edge
        types/counters); called from every drain, so the bookkeeping lags
        the in-place device edge update by at most one drain interval."""
        if not self._pending_rescues:
            return
        pend, self._pending_rescues = self._pending_rescues, []
        for new_ids, slots, flags_dev in pend:
            flags = np.asarray(flags_dev)
            for k, (nid, slot) in enumerate(zip(new_ids, slots)):
                if flags[k, 0] > 0:
                    self.edge_types[slot] = EDGE_SEQUENTIAL
                    self.n_seq_edges += 1
                    self.n_icp_rescues += 1
                    self.last_decisions.append(
                        MatchDecision(
                            cand_id=nid - 1, accepted=True, reason="icp",
                            n_inliers=int(flags[k, 1]),
                            rmse=float(flags[k, 2]),
                            emm_quality=float(flags[k, 3]),
                        )
                    )

    # ------------------------------------------------------------------
    def _compare_kwargs(self) -> dict:
        p = self.params
        return dict(
            cam_fx=self.cam.fx,
            cam_fy=self.cam.fy,
            max_matches=p["max_matches"],
            ratio=p["nn_distance_ratio"],
            n_hypotheses=p["ransac_iterations"],
            max_mahal_sq=p["max_dist_for_inliers"] ** 2,
            min_inliers=p["min_matches"],
            emm_skip=p["emm_skip_step"],
            sigma_depth=p["sigma_depth"],
            sample_size=p["sample_candidates"],
            refine_iterations=p["refine_iterations"],
            projective_iterations=p["g2o_transformation_refinement"],
            cam_cx=self.cam.cx,
            cam_cy=self.cam.cy,
            emm_exact=p["tpu_emm_exact"],
            edge_info_mode=p["tpu_edge_info"],
        )

    def _compare_dispatch(self, kp, depth_small, cand_idx, key) -> CompareResult:
        """Candidate comparison, optionally sharded over a device mesh.

        tpu_mesh_devices > 1 routes the candidate axis through
        parallel.sharded_compare (shard_map over the "c" axis of a 1-D
        mesh — the ICI scale axis of the frontend, SURVEY §2.3); the
        candidate batch must divide evenly over the mesh. Single-device
        (default) calls the local batched kernel."""
        n_mesh = self.params["tpu_mesh_devices"]
        if n_mesh > 1 and self.cand_batch % n_mesh == 0:
            if self._sharded_cmp is None:
                from ..parallel import candidate_mesh
                from ..parallel.sharded import sharded_compare

                mesh = candidate_mesh(n_mesh)
                kw = self._compare_kwargs()
                cam_small = self.cam_small
                self._sharded_cmp = jax.jit(
                    lambda kp, ds, store, ci, key: sharded_compare(
                        mesh, kp, ds, store, ci, key, cam_small, **kw
                    )
                )
            return self._sharded_cmp(
                kp, depth_small, self.store, cand_idx, key
            )
        return compare_to_candidates(
            kp, depth_small, self.store, cand_idx, key, self.cam_small,
            **self._compare_kwargs(),
        )

    # ------------------------------------------------------------------
    def _adapt_detector(self, n_valid_kp: int):
        """Stateful low-texture adaptation (DetectorAdjuster semantics,
        feature_adjuster.cpp:131-175): too few depth-valid corners -> halve
        the FAST threshold for the NEXT frames; saturated detection ->
        step back toward the configured base. Ladder depth is bounded by
        adjuster_max_iterations (0 disables, like the reference's
        non-adjustable detectors)."""
        p = self.params
        max_rungs = p["adjuster_max_iterations"]
        if self._base_threshold is None or max_rungs <= 0:
            return
        t = self.extractor.fast_threshold
        # Fire on real starvation only: below min_keypoints (or too few to
        # clear the match gate), matching cannot sustain tracking — the
        # reference's adjuster exists to recover that case
        # (feature_adjuster.cpp:131-175). A higher bar (e.g. k_cap/2)
        # measurably hurts: on the bench scene it halves the threshold on
        # ordinary frames and floods the top-K with noise corners
        # (protocol ATE L1 0.0283 vs 0.0257 at 6-bit luma, tools/ab_ate.py).
        low_bar = max(p["min_keypoints"], 2 * p["min_matches"])
        # sufficient_matches (parameter_server.cpp:88): when set below the
        # keypoint budget it raises the adaptive detector's target, exactly
        # the "honored by the adjustable detectors" semantics
        if p["sufficient_matches"] < self.k_cap:
            low_bar = max(low_bar, p["sufficient_matches"])
        new_t = t
        if n_valid_kp < low_bar:
            floor = self._base_threshold * (0.5 ** max_rungs)
            new_t = max(t * 0.5, floor)
        elif n_valid_kp >= self.k_cap and t < self._base_threshold:
            new_t = min(t * 2.0, self._base_threshold)
        if new_t == t:
            return
        ext = self._extractor_rungs.get(new_t)
        if ext is None:
            ext = dataclasses.replace(self.extractor, fast_threshold=new_t)
            self._extractor_rungs[new_t] = ext
        logger.info("detector threshold %.4f -> %.4f (%d valid keypoints)",
                    t, new_t, n_valid_kp)
        self.extractor = ext

    # ------------------------------------------------------------------
    def _geodesic_set(self, start: int, depth: int) -> Set[int]:
        seen = {start}
        frontier = [start]
        for _ in range(depth):
            nxt = []
            for u in frontier:
                for v in self.adjacency.get(u, ()):
                    if v not in seen:
                        seen.add(v)
                        nxt.append(v)
            frontier = nxt
        return seen

    # ------------------------------------------------------------------
    def _fixation_mask(self) -> np.ndarray:
        """pose_relative_to strategies (graph_manager.cpp:911-937), computed
        entirely host-side: a device sync here would serialize every online
        optimize dispatch (the host metadata fully determines the mask)."""
        strategy = self.params["pose_relative_to"]
        mask = np.zeros(self.n_cap, bool)
        if strategy == "previous" and self.n_nodes > 1:
            mask[self.n_nodes - 2] = True
        elif strategy == "largest_loop" and self.n_loop_edges > 0:
            # fix everything before the earliest node touched by a loop edge
            loop_nodes = [
                min(pair)
                for pair, t in zip(self.edge_pairs, self.edge_types)
                if t == EDGE_LOOP and pair is not None
            ]
            cutoff = min(loop_nodes) if loop_nodes else 0
            mask[: cutoff + 1] = True
        elif strategy == "inaffected" and 1 < self._nodes_opt_watermark:
            # fix everything already optimized; only nodes added since the
            # last optimize move (graph_manager.cpp:889-892, 969-992)
            mask[: min(self._nodes_opt_watermark, self.n_nodes)] = True
        else:  # "first" (default)
            mask[0] = True
        if not mask[: max(self.n_nodes, 1)].any():
            mask[0] = True
        if not self.mapping_enabled:
            mask[: self.n_nodes] = True
        return mask

    def _apply_fixation(self):
        self.graph = self.graph._replace(
            node_fixed=jnp.asarray(self._fixation_mask())
        )

    def _optimize_inaffected(self, iterations: int, blocking: bool,
                             pcg_iters: int) -> float:
        """Subgraph-only optimization (pose_relative_to=inaffected).

        Gathers the nodes added since the last optimize plus their border
        (older endpoints of their edges, held fixed) into a compact
        GraphState, optimizes it, and scatters the updated poses back —
        O(affected), not O(capacity), per online optimize
        (graph_manager.cpp:889-892, :969-992, :1031-1035).
        """
        w = self._nodes_opt_watermark
        ne = self.n_edges
        # subgraph selection as numpy vector ops over the host mirrors — the
        # python-loop version cost O(E) interpreter work per online optimize
        # (~20 ms at fr2's 37k edges on this 1-core host)
        ei = self.edge_i_host[:ne]
        ej = self.edge_j_host[:ne]
        sel = (
            self.edge_active_host[:ne]
            & (ei >= 0)
            & ((ei >= w) | (ej >= w))
        )
        sub_eids = np.nonzero(sel)[0]
        if sub_eids.size == 0:
            return 0.0
        sei, sej = ei[sub_eids], ej[sub_eids]
        nodes = np.unique(np.concatenate([sei, sej]))
        li = np.searchsorted(nodes, sei).astype(np.int32)
        lj = np.searchsorted(nodes, sej).astype(np.int32)
        n_nodes_sub, n_eids = len(nodes), len(sub_eids)
        # pad to pow-2 buckets so recompiles stay rare
        ncap = max(32, 1 << (n_nodes_sub - 1).bit_length())
        ecap = max(64, 1 << (n_eids - 1).bit_length())
        n_fix = nodes < w  # border nodes (already optimized) held fixed
        if not n_fix.any():  # nothing anchors the subgraph: fix its oldest
            n_fix = n_fix.copy()
            n_fix[0] = True
        # pad node slots with a FIXED node: every duplicate scatter index
        # then writes the identical (unchanged) pose — deterministic
        pad_node = nodes[int(np.argmax(n_fix))]
        node_pad = np.concatenate(
            [nodes, np.full(ncap - n_nodes_sub, pad_node, nodes.dtype)]
        ).astype(np.int32)
        eid_pad = np.concatenate(
            [sub_eids, np.full(ecap - n_eids, sub_eids[0], sub_eids.dtype)]
        ).astype(np.int32)
        li_pad = np.concatenate([li, np.full(ecap - n_eids, li[0], np.int32)])
        lj_pad = np.concatenate([lj, np.full(ecap - n_eids, lj[0], np.int32)])
        pad_false_n = np.zeros(ncap - n_nodes_sub, bool)
        p = self.params
        solver = {"cholesky": "dense", "dense": "dense", "pcg": "pcg"}.get(
            p["backend_solver"], "dense" if ncap <= 1024 else "pcg"
        )
        graph, chi2 = _inaffected_kernel(
            self.graph,
            node_pad,
            eid_pad,
            li_pad,
            lj_pad,
            np.concatenate([n_fix, ~pad_false_n]),
            np.concatenate([np.ones(n_nodes_sub, bool), pad_false_n]),
            np.concatenate(
                [np.ones(n_eids, bool), np.zeros(ecap - n_eids, bool)]
            ),
            np.concatenate([nodes >= w, pad_false_n]),
            iterations=iterations,
            huber_delta=p["huber_delta"],
            pcg_iters=pcg_iters,
            solver=solver,
        )
        self.graph = graph
        return float(chi2) if blocking else float("nan")

    def optimize(self, iterations: Optional[int] = None, blocking: bool = True,
                 pcg_iters: Optional[int] = None) -> float:
        """Pose-graph optimization. With blocking=False the call only
        *dispatches* the device computation and returns immediately — the
        TPU analog of the reference's background optimization thread
        (concurrent_optimization, graph_manager.cpp:900-909): the host keeps
        feeding frames while the optimizer output materializes.
        """
        # Non-blocking (online) optimize runs on a snapshot: leave the 2
        # newest frames' summaries in flight rather than stalling the host on
        # the device queue — their edges join the next optimize (the
        # reference's concurrent optimizer thread has the same lag,
        # graph_manager.cpp:900-909).
        self._drain_pending(keep_newest=0 if blocking else 2)
        p = self.params
        try:
            if (
                p["pose_relative_to"] == "inaffected"
                and self.mapping_enabled
                and 1 < self._nodes_opt_watermark < self.n_nodes
            ):
                return self._optimize_inaffected(
                    iterations or p["optimizer_iterations"],
                    blocking,
                    pcg_iters if pcg_iters is not None else 24,
                )
            solver = {"cholesky": "dense", "dense": "dense", "pcg": "pcg"}.get(
                p["backend_solver"], "auto"
            )
            self._apply_fixation()
            self.graph, chi2, n_it = optimize(
                self.graph,
                iterations=iterations or p["optimizer_iterations"],
                huber_delta=p["huber_delta"],
                pcg_iters=pcg_iters if pcg_iters is not None else 64,
                solver=solver,
            )
            if blocking:
                out = float(chi2)
                # diagnostic for wall-time draws: a 10x swing with the same
                # iteration count is the tunnel, not the optimizer
                self.last_optimize_iters = int(n_it)
                return out
            return float("nan")
        finally:
            self.nodes_since_optimize = 0
            # Non-blocking optimize drained with keep_newest=2: those frames'
            # edges were NOT part of the subgraph, so the watermark must stop
            # at the oldest still-pending node — advancing it to n_nodes would
            # permanently fix those nodes out of every later inaffected
            # optimize (they'd only ever move in a blocking full optimize).
            if self._pending:
                self._nodes_opt_watermark = min(
                    nid for (nid, _, _, _) in self._pending
                )
            else:
                self._nodes_opt_watermark = self.n_nodes

    # ------------------------------------------------------------------
    def prune_edges_above(self, threshold: float) -> int:
        """pruneEdgesWithErrorAbove (graph_manager.cpp:1106-1246).

        Deactivates non-sequential edges with chi² above threshold; pruned
        consecutive-node edges are replaced by constant-position edges.
        """
        self._drain_pending()
        chi2 = np.asarray(edge_chi2(self.graph))
        active = self.edge_active_host
        n_pruned = 0
        for e in range(self.n_edges):
            if not active[e] or chi2[e] <= threshold:
                continue
            i, j = self.edge_pairs[e]
            if abs(i - j) == 1 and self.edge_types[e] != EDGE_CONST_POSITION:
                # keep graph connected: replace with weak identity edge
                active[e] = False
                self._add_edge(
                    min(i, j),
                    max(i, j),
                    np.eye(4, dtype=np.float32),
                    self.params["constant_position_information"],
                    EDGE_CONST_POSITION,
                )
            else:
                active[e] = False
            n_pruned += 1
        self.graph = self.graph._replace(edge_active=jnp.asarray(active))
        return n_pruned

    # ------------------------------------------------------------------
    def poses(self) -> np.ndarray:
        return np.asarray(self.graph.poses[: self.n_nodes])

    def trajectory(self):
        return list(self.timestamps), self.poses()

    def reset(self):
        self.__init__(self.cam, self.params, self.extractor)

    def toggle_mapping(self, enabled: bool):
        """Localization-only mode (graph_manager2.cpp:25-35)."""
        self.mapping_enabled = enabled
        if not enabled:
            mask = np.zeros(self.n_cap, bool)
            mask[: self.n_nodes] = True
            self.graph = self.graph._replace(node_fixed=jnp.asarray(mask))
            self._drain_pending()
            self._loc_poses_host = self.poses()  # one pull; poses now frozen
        else:
            self._loc_poses_host = None

    def statistics(self) -> dict:
        self._drain_pending()
        return {
            "nodes": self.n_nodes,
            "edges": self.n_edges,
            "active_edges": int(self.edge_active_host.sum()),
            "loop_edges": self.n_loop_edges,
            "sequential_edges": self.n_seq_edges,
            "keyframes": len(self.keyframes),
        }

    # ------------------------------------------------------------------
    def delete_last_frame(self):
        """deleteLastFrame capability (graph_manager2.cpp:61): remove the
        newest node and its edges from the active graph."""
        self._drain_pending()
        if self.n_nodes <= 1:
            return
        nid = self.n_nodes - 1
        active = self.edge_active_host
        for e, pair in enumerate(self.edge_pairs):
            if pair is None:
                continue
            i, j = pair
            if i == nid or j == nid:
                active[e] = False
                self.adjacency.get(i, set()).discard(j)
                self.adjacency.get(j, set()).discard(i)
        self.graph = self.graph._replace(
            edge_active=jnp.asarray(active),
            node_active=self.graph.node_active.at[nid].set(False),
        )
        self.store = self.store.clear_features(nid)
        self.n_nodes -= 1
        self.timestamps.pop()
        if self.keyframes and self.keyframes[-1] == nid:
            self.keyframes.pop()

    def clear_feature_information(self, node_id: int):
        """clearFeatureInformation capability (node.cpp:1431): free the
        feature slots of non-keyframes (clear_non_keyframes param)."""
        self.store = self.store.clear_features(node_id)

    def _maybe_clear_non_keyframes(self, new_id: int):
        """clear_non_keyframes auto-free (graph_manager.cpp:788-802): once a
        node leaves the predecessor-candidate window without becoming a
        keyframe, its feature slots are released (loop-closure candidates are
        sampled from keyframes, so the features can no longer be used).
        Batched: one device dispatch per 16 cleared nodes."""
        if not self.params["clear_non_keyframes"]:
            return
        old = new_id - self.params["predecessor_candidates"] - 1
        if old > 0 and old not in self.keyframes:
            self._clear_queue.append(old)
        if len(self._clear_queue) >= 16:
            self.store = self.store.clear_features(
                np.asarray(self._clear_queue, np.int32)
            )
            self._clear_queue = []

    def _icp_rescue(self, depth_small, cand_id: int, seed_T: np.ndarray):
        """use_icp fallback: returns (T, info6x6, n_pairs, rmse) or None."""
        p = self.params
        out = _icp_rescue_kernel(
            jnp.asarray(seed_T, jnp.float32),
            depth_small,
            self.store.depth[cand_id].reshape(
                self.cam_small.height, self.cam_small.width
            ),
            self.cam_small,
            int(p["icp_max_iterations"]),
            p["emm_skip_step"],
            p["sigma_depth"],
            str(p["icp_variant"]),
        )
        T, rmse, n_pairs, conv, q, frac = [np.asarray(x) for x in jax.device_get(out)]
        if not bool(conv):
            return None
        emm_thresh = p["observability_threshold"]
        if emm_thresh > 0 and not (float(q) > emm_thresh and float(frac) > 0.25):
            return None
        # information from the point-to-plane fit quality, capped: dense ICP
        # constrains translation well but is weaker than a feature edge
        info_scale = min(float(n_pairs) / (float(rmse) ** 2 + 4e-4), 1e6)
        return (
            np.asarray(T, np.float32),
            np.eye(6, dtype=np.float32) * info_scale,
            int(n_pairs),
            float(rmse),
        )

    def _icp_rescue_batch(
        self, depth_small, failed_ids: List[int], padded, T_all, ok
    ) -> Dict[int, tuple]:
        """Batched use_icp rescue over the visually-failed candidates
        (node.cpp:1381-1413 runs per matchNodePair). Returns
        {cid: (T, info6, n_pairs, rmse)} for converged + EMM-gated results;
        seeds are the failed RANSAC transforms where available."""
        p = self.params
        B = self.cand_batch
        ids = list(dict.fromkeys(failed_ids))[:B]
        if not ids:
            return {}
        pad_ids = (ids + [ids[0]] * B)[:B]
        seeds = []
        for cid in pad_ids:
            b = padded.index(cid) if cid in padded else 0
            seeds.append(
                np.asarray(T_all[b], np.float32)
                if bool(ok[b])
                else np.eye(4, dtype=np.float32)
            )
        h, w = self.cam_small.height, self.cam_small.width
        cand_depths = self.store.depth[jnp.asarray(pad_ids, jnp.int32)].reshape(
            B, h, w
        )
        out = _icp_rescue_batch_kernel(
            jnp.asarray(np.stack(seeds)),
            depth_small,
            cand_depths,
            self.cam_small,
            int(p["icp_max_iterations"]),
            p["emm_skip_step"],
            p["sigma_depth"],
            str(p["icp_variant"]),
        )
        T, rmse, n_pairs, conv, q, frac = [
            np.asarray(x) for x in jax.device_get(out)
        ]
        emm_thresh = p["observability_threshold"]
        res: Dict[int, tuple] = {}
        for k, cid in enumerate(ids):
            if not bool(conv[k]):
                continue
            if emm_thresh > 0 and not (
                float(q[k]) > emm_thresh and float(frac[k]) > 0.25
            ):
                continue
            info_scale = min(
                float(n_pairs[k]) / (float(rmse[k]) ** 2 + 4e-4), 1e6
            )
            res[cid] = (
                np.asarray(T[k], np.float32),
                np.eye(6, dtype=np.float32) * info_scale,
                int(n_pairs[k]),
                float(rmse[k]),
            )
        return res

    def sanity_check(self) -> List[str]:
        """sanityCheck capability (graph_manager.cpp:1347)."""
        self._drain_pending()
        problems = []
        poses = self.poses()
        if not np.isfinite(poses).all():
            problems.append("non-finite pose entries")
        R = poses[:, :3, :3]
        orth = np.abs(R @ R.transpose(0, 2, 1) - np.eye(3)).max()
        if orth > 1e-2:
            problems.append(f"non-orthonormal rotations (max dev {orth:.2e})")
        active = np.asarray(self.graph.edge_active)
        for e in range(self.n_edges):
            if active[e]:
                i, j = self.edge_pairs[e]
                if i >= self.n_nodes or j >= self.n_nodes:
                    problems.append(f"edge {e} references inactive node")
        return problems

    def optimize_landmarks(
        self,
        iterations: int = 8,
        min_obs: int = 2,
        max_landmarks: int = 8192,
        max_obs: int = 32768,
        merge_dist: float = 0.10,
    ) -> dict:
        """Landmark bundle adjustment (the reference's DO_FEATURE_OPTIMIZATION
        mode: features as g2o VertexPointXYZ with EdgeSE3PointXYZDepth
        observations; src/landmark.cpp, graph_manager.cpp:137-143,188-200).

        Feature tracks are built by re-matching descriptors along the active
        visual edges (one batched MXU dispatch over all edge pairs), merged
        into landmarks by union-find over (node, keypoint) observations with
        a world-distance consistency gate, then poses+landmarks are refined
        by alternating batched GN (optim/landmark_ba.py). Updated poses are
        written back to the pose graph.
        """
        self._drain_pending()
        from ..optim.landmark_ba import (
            LandmarkGraph,
            chi2 as lm_chi2,
            optimize_landmarks as _opt_lm,
        )
        from ..ops.matching import match_descriptors

        pairs = [
            self.edge_pairs[e]
            for e in range(self.n_edges)
            if self.edge_active_host[e]
            and self.edge_types[e] in (EDGE_SEQUENTIAL, EDGE_LOOP)
        ]
        if not pairs:
            return {"landmarks": 0, "observations": 0}
        ii = jnp.asarray([i for i, _ in pairs], jnp.int32)
        jj = jnp.asarray([j for _, j in pairs], jnp.int32)
        m_cap = 128  # observations per edge pair fed to track building

        @jax.jit
        def rematch(store, ii, jj):
            return jax.vmap(
                lambda di, vi, dj, vj: match_descriptors(
                    di, vi, dj, vj, m_cap, self.params["nn_distance_ratio"]
                )
            )(
                store.desc[ii],
                store.kp_valid[ii],
                store.desc[jj],
                store.kp_valid[jj],
            )

        m = jax.device_get(rematch(self.store, ii, jj))
        n = self.n_nodes
        uv = np.asarray(self.store.uv[:n])
        xyz = np.asarray(self.store.xyz[:n])
        poses = self.poses()

        # union-find over (node, kp) observation keys
        parent: Dict[tuple, tuple] = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra

        for p_idx, (i, j) in enumerate(pairs):
            si = m.src_idx[p_idx]
            dj = m.dst_idx[p_idx]
            ok = m.valid[p_idx]
            # world-consistency gate under the current pose estimates
            wi = (poses[i, :3, :3] @ xyz[i, si].T).T + poses[i, :3, 3]
            wj = (poses[j, :3, :3] @ xyz[j, dj].T).T + poses[j, :3, 3]
            good = ok & (np.linalg.norm(wi - wj, axis=-1) < merge_dist)
            for a, b in zip(si[good], dj[good]):
                union((i, int(a)), (j, int(b)))

        tracks: Dict[tuple, list] = {}
        for key in list(parent.keys()) + [k for k in parent.values()]:
            tracks.setdefault(find(key), []).append(key)
        tracks = {
            r: sorted(set(obs))
            for r, obs in tracks.items()
            if len({nid for nid, _ in obs}) >= min_obs
        }
        track_list = sorted(tracks.values(), key=len, reverse=True)[:max_landmarks]
        if not track_list:
            return {"landmarks": 0, "observations": 0}

        obs_lm, obs_pose, obs_uvz, lm_init = [], [], [], []
        for obs in track_list:
            per_node = {}
            for nid, k in obs:
                per_node.setdefault(nid, k)  # one observation per node
            if len(obs_lm) + len(per_node) > max_obs:
                break
            lid = len(lm_init)
            pts = []
            for nid, k in per_node.items():
                obs_lm.append(lid)
                obs_pose.append(nid)
                obs_uvz.append([uv[nid, k, 0], uv[nid, k, 1], xyz[nid, k, 2]])
                pts.append(poses[nid, :3, :3] @ xyz[nid, k] + poses[nid, :3, 3])
            lm_init.append(np.mean(pts, axis=0))
        if not lm_init:
            return {"landmarks": 0, "observations": 0}
        L = len(lm_init)
        O = len(obs_lm)
        ncap = max(32, 1 << (n - 1).bit_length())
        lcap = max(64, 1 << (L - 1).bit_length())
        ocap = max(128, 1 << (O - 1).bit_length())
        g = LandmarkGraph(
            poses=jnp.asarray(
                np.concatenate(
                    [poses, np.broadcast_to(np.eye(4, dtype=np.float32), (ncap - n, 4, 4))]
                )
            ),
            pose_fixed=jnp.asarray([True] + [False] * (n - 1) + [True] * (ncap - n)),
            landmarks=jnp.asarray(
                np.concatenate([np.asarray(lm_init, np.float32), np.zeros((lcap - L, 3), np.float32)])
            ),
            lm_active=jnp.asarray([True] * L + [False] * (lcap - L)),
            obs_lm=jnp.asarray(obs_lm + [0] * (ocap - O), jnp.int32),
            obs_pose=jnp.asarray(obs_pose + [0] * (ocap - O), jnp.int32),
            obs_uvz=jnp.asarray(
                np.concatenate([np.asarray(obs_uvz, np.float32), np.zeros((ocap - O, 3), np.float32)])
            ),
            obs_active=jnp.asarray([True] * O + [False] * (ocap - O)),
        )
        before = float(lm_chi2(g, self.cam, self.params["sigma_depth"]))
        g = _opt_lm(g, self.cam, iterations=iterations,
                    sigma_depth=self.params["sigma_depth"])
        after = float(lm_chi2(g, self.cam, self.params["sigma_depth"]))
        self.graph = self.graph._replace(
            poses=self.graph.poses.at[:n].set(g.poses[:n])
        )
        return {
            "landmarks": L,
            "observations": O,
            "chi2_before": before,
            "chi2_after": after,
        }

    def set_empirical_covariances(self, bandwidth: float = 0.1):
        """setEmpiricalCovariances capability (graph_manager2.cpp:111-144):
        re-derive edge information matrices from residual statistics."""
        self._drain_pending()
        from ..optim.covariance import empirical_information

        new_info = empirical_information(self.graph, bandwidth=bandwidth)
        self.graph = self.graph._replace(edge_info=new_info)

    def memory_footprint(self) -> dict:
        """getMemoryFootprint capability (node.cpp:1461): bytes per store."""
        self._drain_pending()
        def nbytes(tree):
            import jax

            return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))

        return {
            "node_store_bytes": nbytes(self.store),
            "graph_bytes": nbytes(self.graph),
            "nodes": self.n_nodes,
        }

    # ------------------------------------------------------------------
    def save_state(self, path):
        """Checkpoint the full SLAM state (capability beyond the reference,
        which has no mid-run checkpointing — SURVEY.md §5)."""
        self._drain_pending()
        import jax

        arrays = {
            f"store_{i}": np.asarray(x) for i, x in enumerate(jax.tree.leaves(self.store))
        }
        arrays.update(
            {f"graph_{i}": np.asarray(x) for i, x in enumerate(jax.tree.leaves(self.graph))}
        )
        meta = dict(
            n_nodes=self.n_nodes,
            n_edges=self.n_edges,
            n_loop_edges=self.n_loop_edges,
            n_seq_edges=self.n_seq_edges,
            timestamps=list(self.timestamps),
            keyframes=list(self.keyframes),
            edge_types=list(self.edge_types),
            edge_pairs=[list(p) for p in self.edge_pairs],
            adjacency={str(k): sorted(v) for k, v in self.adjacency.items()},
            edge_active_host=[int(x) for x in self.edge_active_host[: self.n_edges]],
            nodes_opt_watermark=self._nodes_opt_watermark,
            kp_count0=self._kp_count0,
        )
        import json

        np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)

    def load_state(self, path):
        self._drain_pending()
        self._pending = []
        self._staged_drains = []
        import jax
        import json

        data = np.load(path, allow_pickle=False)
        meta = json.loads(str(data["__meta__"]))
        store_leaves = [jnp.asarray(data[f"store_{i}"]) for i in range(len(jax.tree.leaves(self.store)))]
        graph_leaves = [jnp.asarray(data[f"graph_{i}"]) for i in range(len(jax.tree.leaves(self.graph)))]
        self.store = jax.tree.unflatten(jax.tree.structure(self.store), store_leaves)
        self.graph = jax.tree.unflatten(jax.tree.structure(self.graph), graph_leaves)
        self.n_nodes = meta["n_nodes"]
        self.n_edges = meta["n_edges"]
        self.n_loop_edges = meta["n_loop_edges"]
        self.n_seq_edges = meta["n_seq_edges"]
        self.timestamps = list(meta["timestamps"])
        self.keyframes = list(meta["keyframes"])
        self.edge_types = list(meta["edge_types"])
        self.edge_pairs = [tuple(p) for p in meta["edge_pairs"]]
        self.adjacency = {int(k): set(v) for k, v in meta["adjacency"].items()}
        self.edge_active_host = np.zeros(self.e_cap, bool)
        if "edge_active_host" in meta:
            self.edge_active_host[: self.n_edges] = np.asarray(
                meta["edge_active_host"], bool
            )
        else:  # legacy checkpoint: recover from the device array
            self.edge_active_host[:] = np.asarray(self.graph.edge_active)
        self.edge_i_host = np.full(self.e_cap, -1, np.int32)
        self.edge_j_host = np.full(self.e_cap, -1, np.int32)
        for e, pair in enumerate(self.edge_pairs):
            if pair is not None:
                self.edge_i_host[e], self.edge_j_host[e] = pair
        self._nodes_opt_watermark = meta.get("nodes_opt_watermark", self.n_nodes)
        self._kp_count0 = meta.get("kp_count0", -1)
        # a resumed run continues from an arbitrary stream position: the
        # delta-wire reconstruction no longer matches the next frame's
        # predecessor, so the first post-load frame ships absolute
        self._wire_synced = False
