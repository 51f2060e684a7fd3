#!/usr/bin/env python
"""How should an 8-row gather from a (1024, 76800) u32 store lower on TPU?

bench r3's trace shows the fancy-index row gather in compare
(store.emm_lohi[cand_idx]) lowers to a kLoop fusion that TOUCHES THE FULL
BUFFER (three u32[1024,25600] outputs = ~315 MB of HBM traffic, 0.77
ms/frame). Compare formulations, fenced, on the real chip:

  A fancy     x[idx]                      (the current compare.py)
  B take      jnp.take(x, idx, 0)
  C dslice    vmap(dynamic_slice_in_dim)  (8 explicit row DMAs)
  D onehot    coarse-only sanity: fancy on a 4x smaller (1024, 19200) plane

Run ALONE (single-jax-process rule).
"""
import sys
import time

import pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import rgbdslam_v2_tpu

rgbdslam_v2_tpu.enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np

N, L = 1024, 76800
B = 8
x = jnp.asarray(np.random.default_rng(0).integers(0, 2**32, (N, L), np.uint32))
xs = jnp.asarray(
    np.random.default_rng(1).integers(0, 2**32, (N, L // 4), np.uint32))
idx = jnp.asarray(np.array([3, 99, 500, 1000, 7, 42, 800, 257], np.int32))


def timeit(name, fn, *args):
    r = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(50):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 50 * 1e3
    print(f"[gather] {name:<28} {dt:7.3f} ms", flush=True)
    return dt


# consumer mirrors compare.py: reshape + unpack + reduce so the gather
# can't be optimized away and fusion context matches
def consume(rows):
    lo = jax.lax.bitcast_convert_type(
        (rows & 0xFFFF).astype(jnp.uint16), jnp.float16).astype(jnp.float32)
    return jnp.sum(lo, axis=-1)


fancy = jax.jit(lambda x_, i_: consume(x_[i_]))
take = jax.jit(lambda x_, i_: consume(jnp.take(x_, i_, axis=0)))
dslice = jax.jit(lambda x_, i_: consume(
    jax.vmap(lambda k: jax.lax.dynamic_slice_in_dim(x_, k, 1, 0)[0])(i_)))

timeit("A fancy x[idx]", fancy, x, idx)
timeit("B take", take, x, idx)
timeit("C vmap dynamic_slice", dslice, x, idx)
timeit("D fancy on L/4 plane", fancy, xs, idx)
timeit("E dslice on L/4 plane", dslice, xs, idx)

# ---- two-level gather: the REAL compare structure ---------------------------
# compare.py row-gathers candidate lohi planes, then observation_likelihood
# point-gathers old_lohi[vi, ui] per projected point. XLA fuses the row
# gather into the point gather — fusion.833's full-buffer kLoop (0.77
# ms/frame). Measure the fused two-level form vs an optimization_barrier
# that forces the 8-row gather to materialize first.
P = 4800  # strided EMM points per candidate
vi = jnp.asarray(np.random.default_rng(2).integers(0, 240, (B, P), np.int32))
ui = jnp.asarray(np.random.default_rng(3).integers(0, 320, (B, P), np.int32))


def point_consume(planes):  # planes (B, 240, 320) u32
    g = jax.vmap(lambda pl, v, u: pl[v, u])(planes, vi, ui)
    lo = jax.lax.bitcast_convert_type(
        (g & 0xFFFF).astype(jnp.uint16), jnp.float16).astype(jnp.float32)
    return jnp.sum(lo, axis=-1)


two_fused = jax.jit(
    lambda x_, i_: point_consume(x_[i_].reshape(B, 240, 320)))
two_barrier = jax.jit(lambda x_, i_: point_consume(
    jax.lax.optimization_barrier(x_[i_]).reshape(B, 240, 320)))
flat_direct = jax.jit(lambda x_, i_: (
    # ONE combined gather straight from the (N, L) store: flat pixel index
    lambda g: jnp.sum(jax.lax.bitcast_convert_type(
        (g & 0xFFFF).astype(jnp.uint16), jnp.float16).astype(jnp.float32),
        axis=-1))(x_[i_[:, None], vi * 320 + ui]))

timeit("F two-level fused", two_fused, x, idx)
timeit("G two-level + barrier", two_barrier, x, idx)
timeit("H combined flat gather", flat_direct, x, idx)
