import rgbdslam_v2_tpu; rgbdslam_v2_tpu.enable_compilation_cache()
import time, numpy as np, jax, jax.numpy as jnp
rgb = np.random.default_rng(0).integers(0,255,(480,640,3),np.uint8)
depth = np.random.default_rng(1).uniform(0.5,5,(480,640)).astype(np.float32)
# pure h2d rate
x = jax.device_put(rgb); y = jax.device_put(depth); jax.block_until_ready((x,y))
t0=time.perf_counter()
for _ in range(10):
    x = jax.device_put(rgb); y = jax.device_put(depth)
jax.block_until_ready((x,y))
print("h2d rgb+depth: %.1f ms" % ((time.perf_counter()-t0)/10*1000))
# compute kernel ~40ms
a = jax.device_put(np.random.default_rng(2).normal(size=(2048,2048)).astype(np.float32))
f = jax.jit(lambda a: jnp.tanh(a @ a) @ a @ a @ a @ a @ a)
r = f(a); jax.block_until_ready(r)
t0=time.perf_counter()
for _ in range(10): r = f(a)
jax.block_until_ready(r); tc=(time.perf_counter()-t0)/10
print("compute kernel: %.1f ms" % (tc*1000))
# overlapped: dispatch compute, then h2d while compute busy
t0=time.perf_counter()
for _ in range(10):
    r = f(a)
    x = jax.device_put(rgb); y = jax.device_put(depth)
jax.block_until_ready((r,x,y))
print("overlapped per iter: %.1f ms" % ((time.perf_counter()-t0)/10*1000))
