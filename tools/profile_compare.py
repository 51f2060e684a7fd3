"""Sub-stage timing of the candidate-comparison kernel (B=8, real chip):
matching / RANSAC / EMM measured as separately-jitted pieces, plus the fused
compare_to_candidates for reference. Identifies the next device-time lever.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import rgbdslam_v2_tpu

rgbdslam_v2_tpu.enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np

from rgbdslam_v2_tpu.config import ParameterServer
from rgbdslam_v2_tpu.core import se3
from rgbdslam_v2_tpu.core.camera import TUM_DEFAULT, backproject_grid
from rgbdslam_v2_tpu.graph.compare import compare_to_candidates
from rgbdslam_v2_tpu.graph.manager import compact_frame
from rgbdslam_v2_tpu.ops.emm import emm_pool_maps, observation_likelihood
from rgbdslam_v2_tpu.ops.matching import match_descriptors
from rgbdslam_v2_tpu.ops.registration import ransac_register
from rgbdslam_v2_tpu.pipeline import SlamPipeline


def t_ms(fn, n=30, warm=3):
    for _ in range(warm):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache", "frames_520_s2_n01.npz")
    z = np.load(cache)
    rgbs, d16 = z["rgbs"], z["depths_u16"]
    params = ParameterServer(
        dict(max_keypoints=600, tpu_max_nodes=256, tpu_max_edges=4096,
             tpu_candidate_batch=8, ransac_iterations=200,
             optimizer_skip_step=1000, keep_all_nodes=True, emm_skip_step=4,
             observability_threshold=0.5)
    )
    pipe = SlamPipeline(TUM_DEFAULT, params)
    m = pipe.manager
    p = m.params
    stamps = np.arange(12) / 30.0
    for i in range(12):
        pipe.process_frame(rgbs[i], d16[i], float(stamps[i]))
    m._drain_pending()

    from rgbdslam_v2_tpu.graph.manager import _prepare_and_extract

    cpt = jax.device_put(compact_frame(rgbs[12], d16[12], m.emm_stride))
    kp, depth_small, _ = _prepare_and_extract(
        m.extractor, m.cam, m.emm_stride, p["minimum_depth"],
        p["maximum_depth"], p["use_feature_min_depth"], cpt)
    jax.block_until_ready(kp.desc)
    B = m.cand_batch
    cand_idx = jnp.arange(B, dtype=jnp.int32) % jnp.int32(m.n_nodes)
    key = jax.random.PRNGKey(0)
    store = m.store

    # fused
    cmp_args = dict(
        cam_fx=m.cam.fx, cam_fy=m.cam.fy, max_matches=p["max_matches"],
        ratio=p["nn_distance_ratio"], n_hypotheses=p["ransac_iterations"],
        max_mahal_sq=p["max_dist_for_inliers"] ** 2,
        min_inliers=p["min_matches"], emm_skip=p["emm_skip_step"],
        sigma_depth=p["sigma_depth"], sample_size=p["sample_candidates"],
        refine_iterations=p["refine_iterations"],
    )
    fused = t_ms(lambda: compare_to_candidates(
        kp, depth_small, store, cand_idx, key, m.cam_small, **cmp_args))

    # matching only
    @jax.jit
    def match_only(kp, store, ci):
        c_desc = store.desc[ci]
        c_val = store.kp_valid[ci]
        nd = kp.desc.astype(store.desc.dtype)
        return jax.vmap(lambda d, v: match_descriptors(
            nd, kp.valid, d, v, p["max_matches"], p["nn_distance_ratio"])
        )(c_desc, c_val)
    t_match = t_ms(lambda: match_only(kp, store, cand_idx))
    mm = match_only(kp, store, cand_idx)

    # ransac only
    @jax.jit
    def ransac_only(kp, store, ci, mm, key):
        c_xyz = store.xyz[ci]
        src = kp.xyz[mm.src_idx]
        dst = jnp.take_along_axis(c_xyz, mm.dst_idx[..., None], axis=1)
        keys = jax.random.split(key, B)
        return jax.vmap(lambda k, s, d, md, mv: ransac_register(
            k, s, d, md, mv, cam_fx=m.cam.fx, cam_fy=m.cam.fy,
            n_hypotheses=p["ransac_iterations"],
            sample_size=p["sample_candidates"],
            max_mahal_sq=p["max_dist_for_inliers"] ** 2,
            refine_iterations=p["refine_iterations"],
            min_inliers=p["min_matches"], sigma_depth=p["sigma_depth"])
        )(keys, src, dst, mm.dist, mm.valid)
    t_ransac = t_ms(lambda: ransac_only(kp, store, cand_idx, mm, key))
    reg = ransac_only(kp, store, cand_idx, mm, key)

    # EMM only
    @jax.jit
    def emm_only(T_all, depth_small, store, ci):
        new_points = backproject_grid(depth_small, m.cam_small)
        new_valid = depth_small > 0
        new_lohi = emm_pool_maps(depth_small)
        hh, ww = m.cam_small.height, m.cam_small.width
        c_depth = store.depth[ci].reshape(-1, hh, ww)  # rows stored flat
        c_lohi = store.emm_lohi[ci].reshape(-1, hh, ww)

        def one(T, cdepth, clohi):
            a = observation_likelihood(
                T, new_points, new_valid, cdepth, m.cam_small,
                p["emm_skip_step"], p["sigma_depth"], old_lohi=clohi)
            cpoints = backproject_grid(cdepth, m.cam_small)
            b = observation_likelihood(
                se3.inv(T), cpoints, cdepth > 0, depth_small, m.cam_small,
                p["emm_skip_step"], p["sigma_depth"], old_lohi=new_lohi)
            return a.inliers + b.inliers
        return jax.vmap(one)(T_all, c_depth, c_lohi)
    t_emm = t_ms(lambda: emm_only(reg.transform, depth_small, store, cand_idx))

    print(f"fused compare B={B}:  {fused:7.2f} ms")
    print(f"  matching:          {t_match:7.2f} ms")
    print(f"  ransac:            {t_ransac:7.2f} ms")
    print(f"  emm:               {t_emm:7.2f} ms")
    print(f"  sum of parts:      {t_match + t_ransac + t_emm:7.2f} ms")


if __name__ == "__main__":
    main()
