"""ctypes bridge to the native C++ dataset loader (native/rgbd_loader.cpp).

Capability parity: the reference's input stack is native (roscpp +
cv_bridge decoding on the callback threads, openni_listener.cpp). This
loader decodes TUM PNGs on C++ worker threads with a bounded prefetch ring
so the Python host thread stays free to dispatch TPU work.

Builds the shared library on first use (g++, libpng); falls back cleanly if
the toolchain or libpng is unavailable (use_native=False paths use cv2).
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SRC = _NATIVE_DIR / "rgbd_loader.cpp"
_SRC_COMPACT = _NATIVE_DIR / "compact_ingest.cpp"
_LIB = _NATIVE_DIR / "librgbd_loader.so"

_lib = None
_build_error: Optional[str] = None


def _ensure_built():
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return _lib
    try:
        src_mtime = max(_SRC.stat().st_mtime, _SRC_COMPACT.stat().st_mtime)
        if not _LIB.exists() or _LIB.stat().st_mtime < src_mtime:
            subprocess.run(
                [
                    # -ffp-contract=off: the compact encoder's chroma floats
                    # must round exactly like numpy (no FMA re-rounding)
                    "g++", "-O3", "-ffp-contract=off", "-shared", "-fPIC",
                    str(_SRC), str(_SRC_COMPACT),
                    "-o", str(_LIB), "-lpng", "-lpthread",
                ],
                check=True,
                capture_output=True,
                text=True,
            )
        lib = ctypes.CDLL(str(_LIB))
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.loader_next.restype = ctypes.c_int
        lib.loader_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        lib.decode_rgb_png.restype = ctypes.c_int
        lib.decode_rgb_png.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int
        ]
        lib.decode_depth_png.restype = ctypes.c_int
        lib.decode_depth_png.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int
        ]
        lib.compact_yc12.restype = ctypes.c_int
        lib.compact_yc12.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ]
        lib.compact_delta.restype = ctypes.c_int
        lib.compact_delta.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p,
        ]
        lib.compact_ydct.restype = ctypes.c_int
        lib.compact_ydct.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_void_p,
        ]
        _lib = lib
    except Exception as e:  # toolchain/libpng missing — callers fall back
        _build_error = str(e)
        _lib = None
    return _lib


def native_available() -> bool:
    return _ensure_built() is not None


class NativeTumLoader:
    """Iterate a TumDataset with C++ threaded decode + prefetch.

    Yields (timestamp, rgb uint8 (H, W, 3), depth float32 meters).
    """

    def __init__(self, dataset, width: int = 640, height: int = 480,
                 threads: int = 2, queue_depth: int = 8):
        lib = _ensure_built()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_build_error}")
        self._lib = lib
        self.dataset = dataset
        self.width = width
        self.height = height
        n = len(dataset)
        rgb_paths = (ctypes.c_char_p * n)(
            *[str(dataset.root / p[1]).encode() for p in dataset.pairs]
        )
        depth_paths = (ctypes.c_char_p * n)(
            *[str(dataset.root / p[3]).encode() for p in dataset.pairs]
        )
        self._n = n
        self._handle = lib.loader_create(
            rgb_paths, depth_paths, n, width, height, threads, queue_depth
        )
        self._rgb_buf = np.empty((height, width, 3), np.uint8)
        self._depth_buf = np.empty((height, width), np.uint16)
        self._pos = 0

    def __iter__(self):
        return self

    def __next__(self):
        if self._pos >= self._n:
            raise StopIteration
        idx = self._lib.loader_next(
            self._handle,
            self._rgb_buf.ctypes.data_as(ctypes.c_void_p),
            self._depth_buf.ctypes.data_as(ctypes.c_void_p),
        )
        if idx < 0:
            raise StopIteration if idx == -1 else RuntimeError(
                f"native decode failed at frame {self._pos} (code {idx})"
            )
        self._pos += 1
        ts = self.dataset.pairs[idx][0]
        return ts, self._rgb_buf.copy(), self._depth_buf.astype(np.float32) / 5000.0

    def close(self):
        if self._handle:
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def decode_rgb(path, width=640, height=480) -> np.ndarray:
    lib = _ensure_built()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    out = np.empty((height, width, 3), np.uint8)
    if lib.decode_rgb_png(str(path).encode(), out.ctypes.data_as(ctypes.c_void_p), width, height):
        raise RuntimeError(f"decode failed: {path}")
    return out


def decode_depth(path, width=640, height=480) -> np.ndarray:
    lib = _ensure_built()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    out = np.empty((height, width), np.uint16)
    if lib.decode_depth_png(str(path).encode(), out.ctypes.data_as(ctypes.c_void_p), width, height):
        raise RuntimeError(f"decode failed: {path}")
    return out.astype(np.float32) / 5000.0


def delta_encode_native(rgb, depth, prev_qg, prev_qd, stride: int,
                        max_clamp: float):
    """Single-pass C temporal-delta (P) wire encoder.

    Bit-exact twin of the numpy path in graph.manager.delta_encode; advances
    the prev_qg/prev_qd mirrors IN PLACE on success. Returns
    (packed, prev_qg, prev_qd) on success, the string "clamped" when the
    clamp budget is exceeded (caller ships an I-frame; the mirrors were
    still advanced but the caller overwrites them from the I-frame codes),
    or None when the native library or input layout is unsupported (caller
    falls back to numpy)."""
    lib = _ensure_built()
    if lib is None or not hasattr(lib, "compact_delta"):
        return None
    rgb = np.asarray(rgb)
    depth = np.asarray(depth)
    if depth.ndim != 2:
        return None
    H, W = depth.shape
    rgb_p = gray_p = None
    if rgb.ndim == 3 and rgb.dtype == np.uint8 and rgb.shape == (H, W, 3):
        rgb_c = np.ascontiguousarray(rgb)
        rgb_p = rgb_c.ctypes.data_as(ctypes.c_void_p)
    elif rgb.ndim == 2 and rgb.dtype == np.uint8 and rgb.shape == (H, W):
        gray_c = np.ascontiguousarray(rgb)
        gray_p = gray_c.ctypes.data_as(ctypes.c_void_p)
    else:
        return None
    d16_p = df_p = None
    if depth.dtype == np.uint16:
        d16_c = np.ascontiguousarray(depth)
        d16_p = d16_c.ctypes.data_as(ctypes.c_void_p)
    elif depth.dtype == np.float32:
        df_c = np.ascontiguousarray(depth)
        df_p = df_c.ctypes.data_as(ctypes.c_void_p)
    else:
        return None
    if not (prev_qg.flags.c_contiguous and prev_qd.flags.c_contiguous):
        return None
    h, w = H // stride, W // stride
    cm = 4 if (H % (4 * stride) == 0 and W % (4 * stride) == 0) else 2
    cs = cm * stride
    n_out = H * W // 2 + (h * w // 8) * 5 + 2 * (H // cs) * (W // cs)
    out = np.empty(n_out, np.uint8)
    budget = int(max_clamp * (H * W + h * w))
    n = lib.compact_delta(
        rgb_p, gray_p, d16_p, df_p,
        prev_qg.ctypes.data_as(ctypes.c_void_p),
        prev_qd.ctypes.data_as(ctypes.c_void_p),
        H, W, int(stride), int(cm), budget,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if n == -2:
        return "clamped"
    if n <= 0:
        return None
    return out[:n], prev_qg, prev_qd


def compact_ydct(rgb, depth, stride: int, depth_bits: int = 12,
                 chroma_mult: int = 4):
    """Single-pass C block-DCT wire encoder (native/compact_ingest.cpp
    compact_ydct): the fast twin of ops/dct_wire.encode_luma_dct + the
    yc12 depth/chroma tails (~0.6 ms/frame at VGA vs ~4-6 ms numpy on the
    one host core that also feeds the wire). The coded spec is read from
    ops/dct_wire at call time so the format is defined in one place.
    Returns the packed uint8 buffer, or None when the native library or
    input layout is unsupported (caller falls back to numpy)."""
    lib = _ensure_built()
    if lib is None:
        return None
    from ..ops import dct_wire as dw

    rgb = np.asarray(rgb)
    depth = np.asarray(depth)
    if depth.ndim != 2:
        return None
    H, W = depth.shape
    if H % 8 or W % 8:
        return None
    rgb_p = gray_p = None
    if rgb.ndim == 3 and rgb.dtype == np.uint8 and rgb.shape == (H, W, 3):
        rgb_c = np.ascontiguousarray(rgb)
        rgb_p = rgb_c.ctypes.data_as(ctypes.c_void_p)
    elif rgb.ndim == 2 and rgb.dtype == np.uint8 and rgb.shape == (H, W):
        gray_c = np.ascontiguousarray(rgb)
        gray_p = gray_c.ctypes.data_as(ctypes.c_void_p)
    else:
        return None
    d16_p = df_p = None
    if depth.dtype == np.uint16:
        d16_c = np.ascontiguousarray(depth)
        d16_p = d16_c.ctypes.data_as(ctypes.c_void_p)
    elif depth.dtype == np.float32:
        df_c = np.ascontiguousarray(depth)
        df_p = df_c.ctypes.data_as(ctypes.c_void_p)
    else:
        return None
    bit_alloc = np.ascontiguousarray(dw.BIT_ALLOC, np.int32)
    qstep = np.ascontiguousarray(dw.QSTEP, np.float32)
    zigzag = np.ascontiguousarray(dw.ZIGZAG[: dw.K_CODED], np.int32)
    out = np.empty(H * W * 4, np.uint8)
    n = lib.compact_ydct(
        rgb_p, gray_p, d16_p, df_p, H, W, int(stride), int(depth_bits),
        int(chroma_mult),
        bit_alloc.ctypes.data_as(ctypes.c_void_p),
        qstep.ctypes.data_as(ctypes.c_void_p),
        zigzag.ctypes.data_as(ctypes.c_void_p), int(dw.K_CODED),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if n <= 0:
        return None
    return out[:n]


def compact_yc12(rgb, depth, stride: int, gray_bits: int,
                 depth_bits: int = 10, chroma_mult: int = 4):
    """Single-pass C yc12 wire encoder (native/compact_ingest.cpp).

    Bit-exact twin of the numpy yc12 path in graph.manager.compact_frame
    (same dither/quantization/packing; gray uses the numpy-fallback BT.601
    fixed-point formula). ~0.3 ms/frame at VGA vs ~3 ms for the numpy
    multi-pass — on the fully serial host->wire->device pipeline that is
    direct frame-time. Returns the packed uint8 buffer, or None when the
    native library or the input layout is unsupported (caller falls back
    to numpy).
    """
    lib = _ensure_built()
    if lib is None:
        return None
    rgb = np.asarray(rgb)
    depth = np.asarray(depth)
    if depth.ndim != 2:
        return None
    H, W = depth.shape
    rgb_p = gray_p = None
    if rgb.ndim == 3 and rgb.dtype == np.uint8 and rgb.shape == (H, W, 3):
        rgb_c = np.ascontiguousarray(rgb)
        rgb_p = rgb_c.ctypes.data_as(ctypes.c_void_p)
    elif rgb.ndim == 2 and rgb.dtype == np.uint8 and rgb.shape == (H, W):
        gray_c = np.ascontiguousarray(rgb)
        gray_p = gray_c.ctypes.data_as(ctypes.c_void_p)
    else:
        return None
    d16_p = df_p = None
    if depth.dtype == np.uint16:
        d16_c = np.ascontiguousarray(depth)
        d16_p = d16_c.ctypes.data_as(ctypes.c_void_p)
    elif depth.dtype == np.float32:
        df_c = np.ascontiguousarray(depth)
        df_p = df_c.ctypes.data_as(ctypes.c_void_p)
    else:
        return None
    out = np.empty(H * W * 4, np.uint8)
    n = lib.compact_yc12(
        rgb_p, gray_p, d16_p, df_p, H, W, int(stride), int(gray_bits),
        int(depth_bits), int(chroma_mult),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if n <= 0:
        return None
    return out[:n]
