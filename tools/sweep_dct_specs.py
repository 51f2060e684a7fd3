#!/usr/bin/env python
"""Sweep candidate DCT-wire rate/quality specs offline (numpy only).

The round-5 on-chip A/B showed the shipped 2.27 bpp spec buys 78 fps
(vs ~58-65 at yc12-8) but costs protocol ATE (L1 0.0291 vs the 0.022-0.024
yc12 band). This sweeps denser specs on real bench-cache frames and scores
the two mechanisms that plausibly carry the ATE cost:
  - FAST corner stability/shift (keypoint localization -> 3D point error)
  - smoothed-BRIEF pair bit-flip rate (descriptor corruption -> match loss)
Safe to run beside nothing (one host core); does NOT touch the chip.

Usage: python tools/sweep_dct_specs.py [n_frames]
"""
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np

from rgbdslam_v2_tpu.ops import dct_wire as dw
from tune_dct_wire import fast_corners, corner_stability  # noqa: E402


def brief_flip_rate(a, b, corners, rng):
    """Fraction of BRIEF-style comparisons that flip between planes a, b.

    256 fixed random pairs in a 31x31 patch around each corner, on a
    5x5-box-smoothed plane (ops/orb.py smooths with a small kernel before
    sampling pairs; box vs Gaussian is immaterial for a flip-rate proxy)."""
    def smooth(x):
        k = np.ones(5, np.float32) / 5.0
        y = x.astype(np.float32)
        y = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, y)
        y = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, y)
        return y

    sa, sb = smooth(a), smooth(b)
    H, W = a.shape
    pairs = rng.integers(-13, 14, size=(256, 4))
    ys, xs = corners[:, 0], corners[:, 1]
    ok = (ys > 16) & (ys < H - 16) & (xs > 16) & (xs < W - 16)
    ys, xs = ys[ok], xs[ok]
    if len(ys) == 0:
        return 0.0
    flips = 0
    total = 0
    p1y = ys[:, None] + pairs[None, :, 0]
    p1x = xs[:, None] + pairs[None, :, 1]
    p2y = ys[:, None] + pairs[None, :, 2]
    p2x = xs[:, None] + pairs[None, :, 3]
    ba = sa[p1y, p1x] < sa[p2y, p2x]
    bb = sb[p1y, p1x] < sb[p2y, p2x]
    flips = np.sum(ba != bb)
    total = ba.size
    return float(flips) / float(total)


SPECS = {
    # shipped round-5 spec: 145 bits/block = 2.27 bpp
    "base-2.27": dw._SPEC,
    # same ranges, ~half the steps on low/mid AC: 172 bits = 2.69 bpp
    "hq-2.69": [
        (11, 1.0),
        (9, 3.0), (9, 3.0),
        (8, 4.0), (8, 4.0), (8, 4.0),
        (7, 5.0), (7, 5.0), (7, 5.0), (7, 5.0),
        (6, 7.0), (6, 7.0), (6, 7.0), (6, 7.0), (6, 7.0),
        (5, 10.0), (5, 10.0), (5, 10.0), (5, 10.0),
        (5, 12.0), (5, 12.0), (5, 12.0), (5, 12.0), (5, 12.0),
        (4, 16.0), (4, 16.0), (4, 16.0), (4, 16.0),
    ],
    # hq + 8 more coded positions zz28-35: 196 bits = 3.06 bpp
    "hq+-3.06": [
        (11, 1.0),
        (9, 3.0), (9, 3.0),
        (8, 4.0), (8, 4.0), (8, 4.0),
        (7, 5.0), (7, 5.0), (7, 5.0), (7, 5.0),
        (6, 7.0), (6, 7.0), (6, 7.0), (6, 7.0), (6, 7.0),
        (5, 10.0), (5, 10.0), (5, 10.0), (5, 10.0),
        (5, 12.0), (5, 12.0), (5, 12.0), (5, 12.0), (5, 12.0),
        (4, 16.0), (4, 16.0), (4, 16.0), (4, 16.0),
    ] + [(3, 24.0)] * 8,
    # all 64 positions coded, finer yet: 262 bits = 4.09 bpp
    "full-4.09": [
        (11, 1.0),
        (10, 1.5), (10, 1.5),
        (9, 2.0), (9, 2.0), (9, 2.0),
        (8, 2.5), (8, 2.5), (8, 2.5), (8, 2.5),
        (7, 3.5), (7, 3.5), (7, 3.5), (7, 3.5), (7, 3.5),
        (6, 5.0), (6, 5.0), (6, 5.0), (6, 5.0),
        (6, 6.0), (6, 6.0), (6, 6.0), (6, 6.0), (6, 6.0),
        (5, 8.0), (5, 8.0), (5, 8.0), (5, 8.0),
    ] + [(4, 12.0)] * 14 + [(3, 20.0)] * 22,
}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    z = np.load(pathlib.Path(__file__).parent.parent
                / ".bench_cache/frames_520_s2_n01.npz")
    rgbs = z["rgbs"][:: max(1, len(z["rgbs"]) // n)][:n]
    H, W = rgbs.shape[1:3]
    rng = np.random.default_rng(7)
    grays = []
    for rgb in rgbs:
        r16 = rgb.astype(np.uint16)
        grays.append(((r16[..., 0] * 77 + r16[..., 1] * 150
                       + r16[..., 2] * 29) >> 8).astype(np.uint8))

    print(f"{'spec':>10} {'bpp':>5} {'KB':>6} {'PSNR':>6} {'stab%':>6} "
          f"{'shift':>6} {'flip%':>6} {'enc ms':>6}")
    for name, spec in SPECS.items():
        dw._set_spec(spec)
        kb = dw.dct_luma_len(H, W) / 1e3
        bpp = dw.BITS_PER_BLOCK / 64.0
        psnrs, stabs, shifts, flips = [], [], [], []
        t_enc = 0.0
        for gray in grays:
            t0 = time.perf_counter()
            wire = dw.encode_luma_dct(gray)
            t_enc += time.perf_counter() - t0
            dec = dw.decode_luma_dct_np(wire, H, W)
            mse = np.mean((dec.astype(np.float32) - gray) ** 2)
            psnrs.append(10 * np.log10(255.0 ** 2 / max(mse, 1e-9)))
            ca, _ = fast_corners(gray)
            cb, _ = fast_corners(dec)
            st, sh = corner_stability(ca, cb)
            stabs.append(st)
            shifts.append(sh)
            flips.append(brief_flip_rate(gray, dec, ca, rng))
        print(f"{name:>10} {bpp:5.2f} {kb:6.1f} {np.mean(psnrs):6.2f} "
              f"{np.mean(stabs) * 100:6.1f} {np.mean(shifts):6.3f} "
              f"{np.mean(flips) * 100:6.2f} {t_enc / len(grays) * 1e3:6.2f}")
    dw._set_spec(dw._SPEC)


if __name__ == "__main__":
    main()
