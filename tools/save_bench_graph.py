#!/usr/bin/env python
"""Run the bench-config pipeline once per ingest variant and checkpoint the
post-run SLAM state (pre-protocol), for offline optimizer studies on CPU
(tools/opt_study.py). Run ALONE."""
import sys
import time

import pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import rgbdslam_v2_tpu

rgbdslam_v2_tpu.enable_compilation_cache()
import numpy as np

from rgbdslam_v2_tpu.config import ParameterServer
from rgbdslam_v2_tpu.core.camera import TUM_DEFAULT
from rgbdslam_v2_tpu.pipeline import SlamPipeline

z = np.load("/root/repo/.bench_cache/frames_520_s2_n01.npz")
poses, rgbs, depths = z["poses"], z["rgbs"], z["depths_u16"]
n = len(rgbs)
stamps = np.arange(n) / 30.0
warmup = 20

for name, over in [
    ("yc126", dict(tpu_ingest_format="yc12", tpu_gray_bits=6)),
    ("raw8", dict(tpu_ingest_format="raw", tpu_gray_bits=8)),
]:
    params = ParameterServer(dict(
        max_keypoints=600, tpu_max_nodes=1024, tpu_max_edges=8192,
        tpu_candidate_batch=8, ransac_iterations=200, optimizer_skip_step=10,
        keep_all_nodes=True, observability_threshold=0.5,
        pose_relative_to="inaffected", emm_skip_step=4, **over,
    ))
    pipe = SlamPipeline(TUM_DEFAULT, params)
    t0 = time.perf_counter()
    pipe.run_arrays(rgbs, depths, stamps, gt_poses=poses)
    float(np.asarray(pipe.manager.graph.poses[0, 0, 0]))
    out = f"/root/repo/.bench_cache/graph_state_{name}.npz"
    pipe.manager.save_state(out)
    print(f"[save] {name}: {pipe.manager.n_nodes} nodes "
          f"{pipe.manager.n_edges} edges in {time.perf_counter()-t0:.0f}s "
          f"-> {out}", flush=True)
