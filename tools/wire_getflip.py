#!/usr/bin/env python
"""How many d2h gets flip the tunnel into slow mode, and does it recover?

wire_trigger.py: 20 tiny gets -> every subsequent op costs ~28 ms (the
WAN RTT behind the loopback relay?) and pipelined put throughput drops to
~27 MB/s, persistently. This measures put cost after 0/1/2/5/10/20 gets,
checks recovery with put volume, and dumps `ss -ti` socket state before
and after the flip (cwnd/rtt tell whether it's TCP-level).
"""
import subprocess
import sys
import time

import pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import rgbdslam_v2_tpu

rgbdslam_v2_tpu.enable_compilation_cache()
import jax
import numpy as np

buf = np.random.randint(0, 255, (432_000,), np.uint8)
x = jax.device_put(np.zeros((64,), np.float32))
jax.block_until_ready(x)


def put_block_ms(k=5):
    ts = []
    for _ in range(k):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(buf))
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    return ts[k // 2]


def put_pipelined_ms(n=10):
    t0 = time.perf_counter()
    rs = [jax.device_put(buf) for _ in range(n)]
    jax.block_until_ready(rs)
    return (time.perf_counter() - t0) / n * 1e3


def sockets(tag):
    try:
        out = subprocess.run(["ss", "-tin"], capture_output=True, text=True,
                             timeout=10).stdout
        lines = [l for l in out.splitlines() if l.strip()]
        print(f"[ss:{tag}]")
        for i, l in enumerate(lines):
            if "ESTAB" in l and i + 1 < len(lines):
                info = lines[i + 1]
                if "rtt:" in info:
                    # keep the juicy fields only
                    fields = [f for f in info.split() if any(
                        f.startswith(p) for p in
                        ("rtt:", "cwnd:", "ssthresh:", "retrans:",
                         "unacked:", "notsent:", "delivery_rate",
                         "busy:", "rwnd_limited:", "sndbuf_limited:"))]
                    print(f"  {l.split()[3:5]} {' '.join(fields)}")
    except Exception as e:
        print(f"[ss:{tag}] unavailable: {e}")
    sys.stdout.flush()


print(f"[getflip] fresh: put block {put_block_ms():.2f} ms, "
      f"pipelined {put_pipelined_ms():.2f} ms/put", flush=True)
sockets("fresh")

total_gets = 0
for n_gets in (1, 1, 3, 5, 10):
    for _ in range(n_gets):
        np.asarray(x)
    total_gets += n_gets
    print(f"[getflip] after {total_gets} gets: put block {put_block_ms():.2f} ms, "
          f"pipelined {put_pipelined_ms():.2f} ms/put", flush=True)

sockets("flipped")

# recovery with volume: 100 pipelined puts
for r in range(3):
    ms = put_pipelined_ms(100)
    print(f"[getflip] 100-put volume round {r}: {ms:.2f} ms/put "
          f"({0.432/ms*1e3:.0f} MB/s)", flush=True)
sockets("after-volume")

time.sleep(10)
print(f"[getflip] +10s idle: put block {put_block_ms():.2f} ms, "
      f"pipelined {put_pipelined_ms():.2f} ms/put", flush=True)
