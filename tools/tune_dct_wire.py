#!/usr/bin/env python
"""Tune/validate the fixed-rate DCT luma wire (ops/dct_wire.py) offline.

Measures, on real bench-cache frames (numpy only — safe to run beside
nothing; do NOT run beside a chip job):
  - bytes/frame vs the raw 8-bit plane, encode/decode wall time
  - PSNR of the decoded luma
  - per-position clamp rates (the spec aims for ~0)
  - FAST-corner stability: corners detected on original vs decoded plane
    (score-ranked top-600), fraction matched within 1 px and mean shift
Usage: python tools/tune_dct_wire.py [n_frames]
"""
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np

from rgbdslam_v2_tpu.ops.dct_wire import (  # noqa: E402
    encode_luma_dct, decode_luma_dct_np, dct_luma_len, BIT_ALLOC, QSTEP,
    ZIGZAG, K_CODED, DCT8, _blockify,
)


def fast_corners(gray, thresh=20, top=600):
    """Minimal numpy FAST-9 (circle of 16, contiguous arc >= 9) + score."""
    offs = [(0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2),
            (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0),
            (-3, 1), (-2, 2), (-1, 3)]
    g = gray.astype(np.int16)
    H, W = g.shape
    c = g[3 : H - 3, 3 : W - 3]
    ring = np.stack(
        [g[3 + dy : H - 3 + dy, 3 + dx : W - 3 + dx] for dy, dx in offs]
    )
    bright = ring > (c + thresh)
    dark = ring < (c - thresh)

    def arc9(m):
        m2 = np.concatenate([m, m[:8]], axis=0)
        run = np.zeros_like(m2[0], np.int8)
        best = np.zeros_like(m2[0], np.int8)
        for k in range(24):
            run = np.where(m2[k], run + 1, 0)
            best = np.maximum(best, run)
        return best >= 9

    is_c = arc9(bright) | arc9(dark)
    score = np.abs(ring - c).sum(0) * is_c
    ys, xs = np.nonzero(is_c)
    sc = score[ys, xs]
    k = np.argsort(-sc)[:top]
    return np.stack([ys[k] + 3, xs[k] + 3], 1), sc[k]


def corner_stability(a, b):
    """fraction of a-corners with a b-corner within 1px; mean shift (px)."""
    if len(a) == 0:
        return 0.0, 0.0
    d = np.abs(a[:, None, :] - b[None, :, :]).max(-1).min(1)
    return float((d <= 1).mean()), float(d[d <= 3].mean() if (d <= 3).any() else 9)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    z = np.load(pathlib.Path(__file__).parent.parent
                / ".bench_cache/frames_520_s2_n01.npz")
    rgbs = z["rgbs"][:: max(1, len(z["rgbs"]) // n)][:n]
    H, W = rgbs.shape[1:3]
    print(f"[dct] {n} frames {W}x{H}, coded positions {K_CODED}, "
          f"{int(BIT_ALLOC.sum())} bits/block "
          f"({BIT_ALLOC.sum()/64:.2f} bpp), "
          f"{dct_luma_len(H, W)/1e3:.1f} KB vs {H*W/1e3:.1f} KB raw")
    psnrs, stabs, shifts, clamps = [], [], [], np.zeros(K_CODED)
    t_enc = t_dec = 0.0
    for rgb in rgbs:
        r16 = rgb.astype(np.uint16)
        gray = ((r16[..., 0] * 77 + r16[..., 1] * 150 + r16[..., 2] * 29)
                >> 8).astype(np.uint8)
        t0 = time.perf_counter()
        wire = encode_luma_dct(gray)
        t_enc += time.perf_counter() - t0
        t0 = time.perf_counter()
        dec = decode_luma_dct_np(wire, H, W)
        t_dec += time.perf_counter() - t0
        mse = np.mean((dec.astype(np.float32) - gray) ** 2)
        psnrs.append(10 * np.log10(255.0**2 / max(mse, 1e-9)))
        # clamp rate per position
        x = gray.astype(np.float32)
        y = (x.reshape(-1, 8) @ DCT8.T).reshape(H, W)
        y = (np.ascontiguousarray(y.T).reshape(-1, 8) @ DCT8.T).reshape(W, H).T
        coef = _blockify(np.ascontiguousarray(y)).reshape(-1, 64)[
            :, ZIGZAG[:K_CODED]]
        for p in range(1, K_CODED):
            half = 1 << (int(BIT_ALLOC[p]) - 1)
            q = np.rint(coef[:, p] / QSTEP[p])
            clamps[p] += np.mean((q < -half) | (q > half - 1))
        ca, _ = fast_corners(gray)
        cb, _ = fast_corners(dec)
        st, sh = corner_stability(ca, cb)
        stabs.append(st)
        shifts.append(sh)
    print(f"[dct] PSNR {np.mean(psnrs):.2f} dB | encode "
          f"{t_enc/n*1e3:.2f} ms | decode(np) {t_dec/n*1e3:.2f} ms")
    print(f"[dct] FAST-600 corner stability: {np.mean(stabs)*100:.1f}% "
          f"within 1px, mean shift {np.mean(shifts):.3f} px")
    worst = np.argsort(-clamps)[:5]
    print("[dct] worst clamp rates:",
          ", ".join(f"zz{p}={clamps[p]/n*100:.3f}%" for p in worst))


if __name__ == "__main__":
    main()
