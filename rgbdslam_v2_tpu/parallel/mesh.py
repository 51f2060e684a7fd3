"""Device mesh construction for SLAM workload sharding.

The reference's concurrency (QtConcurrent thread pools over edge candidates,
background optimization; reference: src/graph_manager.cpp:531-583, :900-909)
maps to TPU as data parallelism over a 1-D ICI mesh:
  axis "c": loop-closure candidates (frontend fan-out) and graph edges
            (backend normal-equation assembly) — both embarrassingly
            shardable with one psum per reduction.
Multi-sequence evaluation can reuse the same axis (one sequence per device).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def candidate_mesh(n_devices: int | None = None, platform: str | None = None) -> Mesh:
    """1-D mesh over the first n devices (optionally of a specific platform,
    e.g. 'cpu' for the virtual 8-device test mesh)."""
    devs = jax.devices(platform) if platform else jax.devices()
    n = n_devices or len(devs)
    if n > len(devs) and platform is None:
        # This environment's TPU plugin stays default even under
        # JAX_PLATFORMS=cpu; fall back to the virtual host devices
        # (xla_force_host_platform_device_count) for multi-device runs.
        try:
            cpu = jax.devices("cpu")
            if len(cpu) >= n:
                devs = cpu
        except RuntimeError:
            pass
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]), axis_names=("c",))
