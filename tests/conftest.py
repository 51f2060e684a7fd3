"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable; sharding tests use
xla_force_host_platform_device_count (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env presets the TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is NOT enough here: the container's sitecustomize
# imports jax and pins the axon (TPU-tunnel) platform before conftest runs,
# so the config must be forced explicitly or the whole "CPU" suite silently
# executes through the TPU tunnel (slow, and serialized across processes).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import rgbdslam_v2_tpu  # noqa: E402

rgbdslam_v2_tpu.enable_compilation_cache()
