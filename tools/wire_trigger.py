#!/usr/bin/env python
"""Which operation class flips the tunnel into ~26 ms/op mode?

Conditions (argv[1]):
  extract20     run the fused prepare+extract program 20x (no donation)
  donate-big    20x donated .at[i].set row-scatter on a 900 MB f32 buffer
  donate-small  same but 16 MB buffer
  nondonate-big 20x NON-donated row-scatter on 900 MB (copies each time)
  getsmall20    20x d2h pulls of a small array
  asynccopy20   20x copy_to_host_async + later reads
  mgr-small     GraphManager n_cap=64, 20 frames
Then: 10 timed 432 KB puts (median) + a tiny-dispatch timing.
"""
import sys
import time

import pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import rgbdslam_v2_tpu

rgbdslam_v2_tpu.enable_compilation_cache()
import functools

import jax
import jax.numpy as jnp
import numpy as np

cond = sys.argv[1]
buf = np.random.randint(0, 255, (432_000,), np.uint8)
keep = []

if cond == "extract20":
    from rgbdslam_v2_tpu.config import ParameterServer
    from rgbdslam_v2_tpu.core.camera import TUM_DEFAULT
    from rgbdslam_v2_tpu.graph.manager import (GraphManager, compact_frame,
                                               _prepare_and_extract)

    z = np.load("/root/repo/.bench_cache/frames_520_s2_n01.npz")
    rgbs, depths = z["rgbs"][:20], z["depths_u16"][:20]
    del z
    m = GraphManager(TUM_DEFAULT, ParameterServer(dict(
        max_keypoints=600, tpu_max_nodes=1024, tpu_max_edges=8192)))
    keep.append(m)
    outs = []
    for i in range(20):
        cpt = compact_frame(rgbs[i], depths[i], m.emm_stride,
                            fmt=m.ingest_fmt, gray_bits=m.gray_bits,
                            depth_bits=m.depth_bits)
        outs.append(_prepare_and_extract(
            m.extractor, m.cam, m.emm_stride, 0.1, 10.0, False,
            jnp.asarray(cpt), fmt=m.ingest_fmt, gray_bits=m.gray_bits,
            depth_bits=m.depth_bits))
    jax.block_until_ready(outs[-1])
elif cond in ("donate-big", "donate-small", "nondonate-big"):
    n = 1024 if cond != "donate-small" else 16
    state = jnp.zeros((n, 230_400), jnp.float32)  # 1024 -> ~944 MB
    row = jnp.ones((230_400,), jnp.float32)

    if cond.startswith("donate"):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def upd(s, r, i):
            return s.at[i].set(r)
    else:
        @jax.jit
        def upd(s, r, i):
            return s.at[i].set(r)

    for i in range(20):
        state = upd(state, row, jnp.int32(i % n))
    jax.block_until_ready(state)
    keep.append(state)
elif cond == "getsmall20":
    x = jax.device_put(np.zeros((64,), np.float32))
    for _ in range(20):
        np.asarray(x)
    keep.append(x)
elif cond == "asynccopy20":
    x = jax.device_put(np.zeros((4096,), np.float32))
    ys = []
    for _ in range(20):
        y = x + 1
        y.copy_to_host_async()
        ys.append(y)
    for y in ys:
        np.asarray(y)
elif cond == "mgr-small":
    from rgbdslam_v2_tpu.config import ParameterServer
    from rgbdslam_v2_tpu.core.camera import TUM_DEFAULT
    from rgbdslam_v2_tpu.graph.manager import GraphManager, compact_frame

    z = np.load("/root/repo/.bench_cache/frames_520_s2_n01.npz")
    rgbs, depths = z["rgbs"][:20], z["depths_u16"][:20]
    del z
    m = GraphManager(TUM_DEFAULT, ParameterServer(dict(
        max_keypoints=600, tpu_max_nodes=64, tpu_max_edges=1024,
        tpu_candidate_batch=8, ransac_iterations=200,
        optimizer_skip_step=10_000, keep_all_nodes=True,
        observability_threshold=0.5, emm_skip_step=4,
        tpu_gray_bits=8, tpu_depth_bits=12,
    )))
    keep.append(m)
    for i in range(20):
        cpt = compact_frame(rgbs[i], depths[i], m.emm_stride,
                            fmt=m.ingest_fmt, gray_bits=m.gray_bits,
                            depth_bits=m.depth_bits)
        m.add_frame(None, None, i / 30.0, compact=cpt)
    float(np.asarray(m.graph.poses[0, 0, 0]))
else:
    raise SystemExit(f"unknown condition {cond}")


def one_put():
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(buf))
    return (time.perf_counter() - t0) * 1e3


one_put()
ts = sorted(one_put() for _ in range(10))
f = jax.jit(lambda x: x + 1)
xd = jax.device_put(np.zeros(8, np.float32))
jax.block_until_ready(f(xd))
ds = []
for _ in range(10):
    t0 = time.perf_counter()
    jax.block_until_ready(f(xd))
    ds.append((time.perf_counter() - t0) * 1e3)
ds.sort()
print(f"[trigger] {cond}: put med {ts[5]:.2f} ms (min {ts[0]:.2f} "
      f"max {ts[-1]:.2f}); tiny dispatch med {ds[5]:.2f} ms", flush=True)
