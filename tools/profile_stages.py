#!/usr/bin/env python
"""Per-stage timing budget for the per-frame SLAM step on the real chip.

Prints a ms-per-stage table (h2d / extract / compare / full step /
drain / optimize) by timing each jitted piece with block_until_ready in
isolation, then the steady-state pipelined loop for comparison.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t_ms(fn, n=20, warmup=3):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import rgbdslam_v2_tpu

    rgbdslam_v2_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from rgbdslam_v2_tpu.config import ParameterServer
    from rgbdslam_v2_tpu.core.camera import TUM_DEFAULT
    from rgbdslam_v2_tpu.io import SyntheticWorld, render_sequence
    from rgbdslam_v2_tpu.pipeline import SlamPipeline
    from rgbdslam_v2_tpu.graph.manager import _prepare_and_extract
    from rgbdslam_v2_tpu.graph.compare import compare_to_candidates

    n_frames = 40
    world = SyntheticWorld.create(seed=0, cam=TUM_DEFAULT)
    poses, rgbs, depths = render_sequence(world, n_frames, seed=2)
    stamps = np.arange(n_frames) / 30.0

    params = ParameterServer(
        dict(
            max_keypoints=600,
            tpu_max_nodes=256,
            tpu_max_edges=4096,
            tpu_candidate_batch=8,
            ransac_iterations=200,
            optimizer_skip_step=10,
            keep_all_nodes=True,
            observability_threshold=0.5,
        )
    )
    pipe = SlamPipeline(TUM_DEFAULT, params)
    m = pipe.manager
    p = m.params

    # warm the pipeline (compiles everything)
    for i in range(12):
        pipe.process_frame(rgbs[i], depths[i], float(stamps[i]),
                           gt_pose=poses[0] if i == 0 else None)
    m.optimize(iterations=p["online_optimizer_iterations"], blocking=True,
               pcg_iters=24)
    jax.block_until_ready(m.graph.poses)

    from rgbdslam_v2_tpu.graph.manager import compact_frame

    cpt_h = compact_frame(rgbs[20], depths[20], m.emm_stride)

    # ---- h2d (compact ingest) ----
    ms_h2d = t_ms(lambda: jax.device_put(cpt_h))

    cpt_d = jax.device_put(cpt_h)

    # ---- extract ----
    extract = jax.jit(
        lambda c: _prepare_and_extract(
            m.extractor, m.cam, m.emm_stride, p["minimum_depth"],
            p["maximum_depth"], p["use_feature_min_depth"], c
        ),
        static_argnums=(),
    )
    ms_extract = t_ms(lambda: extract(cpt_d))

    kp, depth_small, color_small = extract(cpt_d)
    cand_idx = jnp.asarray([m.n_nodes - 1] * m.cand_batch, jnp.int32)

    # ---- compare (B candidates) ----
    cmp_fn = jax.jit(
        lambda kp, ds, store, ci, key: compare_to_candidates(
            kp, ds, store, ci, key, m.cam_small,
            cam_fx=m.cam.fx, cam_fy=m.cam.fy,
            max_matches=p["max_matches"], ratio=p["nn_distance_ratio"],
            n_hypotheses=p["ransac_iterations"],
            max_mahal_sq=p["max_dist_for_inliers"] ** 2,
            min_inliers=p["min_matches"], emm_skip=p["emm_skip_step"],
            sigma_depth=p["sigma_depth"], sample_size=p["sample_candidates"],
            refine_iterations=p["refine_iterations"],
        )
    )
    key = jax.random.PRNGKey(0)
    ms_compare = t_ms(lambda: cmp_fn(kp, depth_small, m.store, cand_idx, key))

    # ---- full slam_step (dispatch-only vs completed) ----
    # measure via the pipeline: process_frame wall time without sync
    times_disp = []
    times_wall = []
    i0 = 12
    for i in range(i0, n_frames):
        rgb_dd = jax.device_put(rgbs[i])
        depth_dd = jax.device_put(depths[i])
        t0 = time.perf_counter()
        pipe.process_frame(rgb_dd, depth_dd, float(stamps[i]))
        times_disp.append(time.perf_counter() - t0)
        jax.block_until_ready(m.graph.poses)
        times_wall.append(time.perf_counter() - t0)
    ms_step_disp = float(np.median(times_disp)) * 1e3
    ms_step_wall = float(np.median(times_wall)) * 1e3

    # ---- drain ----
    t0 = time.perf_counter()
    m._drain_pending()
    ms_drain = (time.perf_counter() - t0) * 1e3

    # ---- optimize (online, non-blocking dispatch + completion) ----
    t0 = time.perf_counter()
    m.optimize(iterations=p["online_optimizer_iterations"], blocking=False,
               pcg_iters=24)
    ms_opt_disp = (time.perf_counter() - t0) * 1e3
    jax.block_until_ready(m.graph.poses)
    ms_opt_wall = (time.perf_counter() - t0) * 1e3

    # ---- select_candidates host ----
    t0 = time.perf_counter()
    for _ in range(50):
        m.select_candidates(m.n_nodes)
    ms_cand = (time.perf_counter() - t0) / 50 * 1e3

    print(f"{'stage':<28}{'ms':>10}")
    for name, v in [
        ("h2d (rgb+depth)", ms_h2d),
        ("extract (jit alone)", ms_extract),
        ("compare B=8 (jit alone)", ms_compare),
        ("select_candidates (host)", ms_cand),
        ("process_frame dispatch", ms_step_disp),
        ("process_frame completed", ms_step_wall),
        ("drain (batch)", ms_drain),
        ("optimize dispatch", ms_opt_disp),
        ("optimize completed", ms_opt_wall),
    ]:
        print(f"{name:<28}{v:>10.2f}")


if __name__ == "__main__":
    main()
