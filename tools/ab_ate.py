#!/usr/bin/env python
"""ATE bisect across ingest variants on the real chip. Run ALONE.

Round-2 (raw u16 ingest, gray8) measured protocol ATE L1/L4
0.0195/0.0172 m; the round-3 yc12 wire + compute changes moved that to
0.0283/0.0218 at gray6. This isolates which approximation owns the
regression: variants are (ingest_format, gray_bits) pairs run through
the IDENTICAL bench phase-1 config + 5-level protocol.

Usage: python tools/ab_ate.py [variant ...]
  variants: yc12-6 yc12-8 raw-8 (default: all three)
"""
import sys
import tempfile
import time

import pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import rgbdslam_v2_tpu

rgbdslam_v2_tpu.enable_compilation_cache()
import numpy as np

from rgbdslam_v2_tpu.config import ParameterServer
from rgbdslam_v2_tpu.core.camera import TUM_DEFAULT
from rgbdslam_v2_tpu.pipeline import SlamPipeline

FRAMES_NPZ = "/root/repo/.bench_cache/frames_520_s2_n01.npz"

BASE_PARAMS = dict(
    max_keypoints=600, tpu_max_nodes=1024, tpu_max_edges=8192,
    tpu_candidate_batch=8, ransac_iterations=200, optimizer_skip_step=10,
    keep_all_nodes=True, observability_threshold=0.5,
    pose_relative_to="inaffected", emm_skip_step=4,
)

VARIANTS = {
    "yc12-6": dict(tpu_ingest_format="yc12", tpu_gray_bits=6),
    "yc12-8": dict(tpu_ingest_format="yc12", tpu_gray_bits=8),
    "raw-8": dict(tpu_ingest_format="raw", tpu_gray_bits=8),
    # ladder-off variants: isolate the adaptive-detection contribution
    "yc12-6-na": dict(tpu_ingest_format="yc12", tpu_gray_bits=6,
                      adjuster_max_iterations=0),
    "yc12-8-na": dict(tpu_ingest_format="yc12", tpu_gray_bits=8,
                      adjuster_max_iterations=0),
    "raw-8-na": dict(tpu_ingest_format="raw", tpu_gray_bits=8,
                     adjuster_max_iterations=0),
    # round-3 wire defaults (gray6 + depth10 + chroma 4s) and studies
    "default": dict(),
    "d12": dict(tpu_depth_bits=12),
    "proj2": dict(g2o_transformation_refinement=2),
    "proj4": dict(g2o_transformation_refinement=4),
    "hess": dict(tpu_edge_info="hessian"),
    "proj2-hess": dict(g2o_transformation_refinement=2,
                       tpu_edge_info="hessian"),
    # approx_max_k per-cell keypoint selection (fps + ATE vs exact top_k)
    "approx": dict(tpu_approx_select=True),
    "gray5": dict(tpu_gray_bits=5),
    "gray5-approx": dict(tpu_gray_bits=5, tpu_approx_select=True),
    # fused two-frame step (halves dispatches; bit-identical per unit test)
    "fps2": dict(tpu_frames_per_step=2),
    "fps2-gray5": dict(tpu_frames_per_step=2, tpu_gray_bits=5),
    # temporal-delta wire (round-4 lever: 336 -> 211 KB/frame P-frames;
    # I-frames auto-fire on clamp-budget overflow, so ATE floor = absolute)
    "delta": dict(tpu_wire_delta=True),
    "delta-fps2": dict(tpu_wire_delta=True, tpu_frames_per_step=2),
    # round-4 L1 bisect: 12-bit depth + full luma (is the residual 0.03 vs
    # 0.0195 gap wire precision at all?); raw-8 is the round-2 lossless
    # ingest — if raw-8 reads ~0.025+ on the re-rendered cache, the "L1
    # regression" is the data/run-variance, not the wire
    "d12-gray8": dict(tpu_depth_bits=12, tpu_gray_bits=8),
    # round-5 wire levers (WIRE.md: ~27-38 MB/s eager tunnel -> bytes/frame
    # bound fps): block-DCT luma (0.43 -> 0.21 MB/frame) and the pipelined
    # drain (one staged stacked summary pull instead of N per-drain gets)
    "ydct": dict(tpu_ingest_format="ydct"),
    # higher-rate DCT quality points (round-5: ydct@2.3 read L1 0.0291 vs
    # the yc12-8 0.022-0.024 band at 78 vs ~58-65 fps — these probe the
    # rate/accuracy frontier; offline scores in ops/dct_wire.SPECS)
    "ydct27": dict(tpu_ingest_format="ydct", tpu_dct_quality="2.7"),
    "ydct31": dict(tpu_ingest_format="ydct", tpu_dct_quality="3.1"),
    "ydct-d10": dict(tpu_ingest_format="ydct", tpu_depth_bits=10),
    # depth-rate sensitivity at the accuracy-restoring luma point (r5:
    # ydct27 L1 0.0222 = yc12-8 band; ydct31 0.0294 shows more luma rate
    # does NOT help past 2.7; ydct-d10@2.3 read 0.0301 vs 0.0291 — depth
    # 10-bit looked neutral but was confounded by the 2.3 luma error)
    "ydct27-d10": dict(tpu_ingest_format="ydct", tpu_dct_quality="2.7",
                       tpu_depth_bits=10),
    # dispatch/device levers at the winning wire point (ATE gate here;
    # fps verdicts via tools/ab_perf.py Wilcoxon)
    "ydct27-fps2": dict(tpu_ingest_format="ydct", tpu_dct_quality="2.7",
                        tpu_frames_per_step=2),
    "ydct27-approx": dict(tpu_ingest_format="ydct", tpu_dct_quality="2.7",
                          tpu_approx_select=True),
    "ydct27-encahead": dict(tpu_ingest_format="ydct", tpu_dct_quality="2.7",
                            tpu_encode_ahead=True),
    # the round-5 candidate default (ydct 2.7 luma + 10-bit sqrt depth,
    # ~210 KB/frame: first draw 80.5 fps, L1 0.0261, L4 0.0199) and its
    # dispatch levers
    "r5def": dict(tpu_ingest_format="ydct", tpu_dct_quality="2.7",
                  tpu_depth_bits=10),
    "r5def-fps2": dict(tpu_ingest_format="ydct", tpu_dct_quality="2.7",
                       tpu_depth_bits=10, tpu_frames_per_step=2),
    "r5def-fps4": dict(tpu_ingest_format="ydct", tpu_dct_quality="2.7",
                       tpu_depth_bits=10, tpu_frames_per_step=4),
    "r5def-fps8": dict(tpu_ingest_format="ydct", tpu_dct_quality="2.7",
                       tpu_depth_bits=10, tpu_frames_per_step=8),
    # the round-5 bench configuration (everything that won its Wilcoxon)
    "r5best": dict(tpu_ingest_format="ydct", tpu_dct_quality="2.7",
                   tpu_depth_bits=10, tpu_frames_per_step=4,
                   tpu_encode_ahead=True),
    "r5def-encahead": dict(tpu_ingest_format="ydct", tpu_dct_quality="2.7",
                           tpu_depth_bits=10, tpu_encode_ahead=True),
    "r5def-approx": dict(tpu_ingest_format="ydct", tpu_dct_quality="2.7",
                         tpu_depth_bits=10, tpu_approx_select=True),
    "nodrainpipe": dict(tpu_drain_pipelined=False),
    "ydct-nodrainpipe": dict(tpu_ingest_format="ydct",
                             tpu_drain_pipelined=False),
}

def main(names):
    z = np.load(FRAMES_NPZ)
    poses, rgbs, depths = z["poses"], z["rgbs"], z["depths_u16"]
    n = len(rgbs)
    stamps = np.arange(n) / 30.0
    warmup = 20
    for name in names:
        over = VARIANTS[name]
        params = ParameterServer(dict(BASE_PARAMS, **over))
        pipe = SlamPipeline(TUM_DEFAULT, params)
        for i in range(warmup):
            pipe.process_frame(rgbs[i], depths[i], float(stamps[i]),
                               gt_pose=poses[0] if i == 0 else None)
        pipe.manager.optimize(blocking=True)
        float(np.asarray(pipe.manager.graph.poses[0, 0, 0]))
        t0 = time.perf_counter()
        pipe.params.set("skip_first_n_frames", warmup)
        pipe.run_arrays(rgbs, depths, stamps)
        float(np.asarray(pipe.manager.graph.poses[0, 0, 0]))
        fps = (n - warmup) / (time.perf_counter() - t0)
        st = pipe.manager.statistics()
        with tempfile.TemporaryDirectory() as td:
            rep = pipe.evaluation_protocol(
                td, gt_stamps=list(stamps), gt_xyz=poses[:, :3, 3]
            )
        ate = "/".join(f"{rep.ate_rmse.get(l, float('nan')):.4f}"
                       for l in range(5))
        print(f"[A/B] {name}: {fps:.2f} fps, ATE L0..L4 {ate} m, "
              f"{st['active_edges']} edges ({st['loop_edges']} loop)",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or list(VARIANTS))
