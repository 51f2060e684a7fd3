#!/usr/bin/env python
"""Statistically honest on-chip perf A/B: interleaved windows + Wilcoxon.

VERDICT r4 weak #4: every prior fps A/B compared one median window against
another under ~1.5x tunnel variance — 58.6 vs 61.5 is noise at that spread.
This tool interleaves the two configurations WITHIN one session
(A B A B ... round-robin, so tunnel mood drifts hit both arms equally),
times per-chunk throughput inside each window, and runs the paired Wilcoxon
signed-rank test from eval/stats.py (the reference's own methodology:
test/figures.py:17-25) over chunk pairs matched by (round, chunk) — same
frames, same position in the window, different config.

Usage: python tools/ab_perf.py A B [rounds] [chunk]
  A, B    variant names from tools/ab_ate.py VARIANTS
  rounds  interleaved rounds (default 4 -> 4 windows per arm)
  chunk   frames per timing chunk (default 100)

Run ALONE on the chip. Prints per-arm median fps, the paired Wilcoxon
p-value, and a PARITY-ready verdict line ("A faster", "B faster", or
"indistinguishable (p>0.05)").
"""
import sys
import time

import pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
import rgbdslam_v2_tpu

rgbdslam_v2_tpu.enable_compilation_cache()
import numpy as np

from ab_ate import BASE_PARAMS, FRAMES_NPZ, VARIANTS
from rgbdslam_v2_tpu.config import ParameterServer
from rgbdslam_v2_tpu.core.camera import TUM_DEFAULT
from rgbdslam_v2_tpu.eval.stats import wilcoxon_compare
from rgbdslam_v2_tpu.pipeline import SlamPipeline

WARMUP = 20


def run_window(name, rgbs, depths, stamps, poses, chunk):
    """One full window under `name`'s params; returns per-chunk fps.

    Each chunk boundary pays one scalar pull (~28 ms tunnel RTT) as a real
    fence — identical cost in both arms, so the comparison stays unbiased.
    """
    params = ParameterServer(dict(BASE_PARAMS, **VARIANTS[name]))
    pipe = SlamPipeline(TUM_DEFAULT, params)
    for i in range(WARMUP):
        pipe.process_frame(rgbs[i], depths[i], float(stamps[i]),
                           gt_pose=poses[0] if i == 0 else None)
    pipe.manager.optimize(blocking=True)
    float(np.asarray(pipe.manager.graph.poses[0, 0, 0]))
    n = len(rgbs)
    fps_chunks = []
    for lo in range(WARMUP, n, chunk):
        hi = min(lo + chunk, n)
        if hi - lo < chunk:
            break  # only full chunks: keep pairs comparable
        t0 = time.perf_counter()
        pipe.run_arrays(rgbs[lo:hi], depths[lo:hi], stamps[lo:hi])
        float(np.asarray(pipe.manager.graph.poses[0, 0, 0]))
        fps_chunks.append((hi - lo) / (time.perf_counter() - t0))
    return fps_chunks


def main(argv):
    a, b = argv[0], argv[1]
    rounds = int(argv[2]) if len(argv) > 2 else 4
    chunk = int(argv[3]) if len(argv) > 3 else 100
    z = np.load(FRAMES_NPZ)
    poses, rgbs, depths = z["poses"], z["rgbs"], z["depths_u16"]
    stamps = np.arange(len(rgbs)) / 30.0

    chunks = {a: [], b: []}
    for r in range(rounds):
        # alternate which arm goes first so slow drifts cancel
        order = (a, b) if r % 2 == 0 else (b, a)
        for name in order:
            fps = run_window(name, rgbs, depths, stamps, poses, chunk)
            chunks[name].extend(fps)
            print(f"[ab_perf] round {r} {name}: "
                  + " ".join(f"{f:.1f}" for f in fps), flush=True)

    fa, fb = np.asarray(chunks[a]), np.asarray(chunks[b])
    n_pairs = min(len(fa), len(fb))
    # paired by (round, chunk index): same frames, same window position
    cmp = wilcoxon_compare(fa[:n_pairs], fb[:n_pairs])
    med_a, med_b = float(np.median(fa)), float(np.median(fb))
    if not cmp.significant:
        verdict = "indistinguishable (p>0.05)"
    elif med_a > med_b:
        verdict = f"{a} faster"
    else:
        verdict = f"{b} faster"
    print(f"[ab_perf] {a}: median {med_a:.2f} fps over {len(fa)} chunks "
          f"({rounds} interleaved windows)", flush=True)
    print(f"[ab_perf] {b}: median {med_b:.2f} fps over {len(fb)} chunks",
          flush=True)
    print(f"[ab_perf] Wilcoxon paired n={cmp.n}: median diff "
          f"{cmp.median_diff:+.2f} fps, W={cmp.statistic:.0f}, "
          f"p={cmp.p_value:.4g} -> {verdict}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
