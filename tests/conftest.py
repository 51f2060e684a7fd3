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


def pytest_addoption(parser):
    parser.addoption(
        "--shard", default=None,
        help="K/N: run only the K-th (1-based) of N stable hash-based test "
        "shards. The heavy tier compiles several multi-GB XLA programs; one "
        "process accumulating all of them has segfaulted under memory "
        "pressure (round-4 driver run), so tools/run_heavy.sh runs the tier "
        "as sequential sharded processes.",
    )


def pytest_collection_modifyitems(config, items):
    shard = config.getoption("--shard")
    if not shard:
        return
    import hashlib
    import pytest

    k, n = (int(x) for x in shard.split("/"))
    skip = pytest.mark.skip(reason=f"not in shard {k}/{n}")
    for item in items:
        # hash the FILE, not the test id: keeps a module's compile cache
        # (shared fixtures, same jit programs) within one process
        h = int(hashlib.sha1(item.fspath.basename.encode()).hexdigest(), 16)
        if h % n != k - 1:
            item.add_marker(skip)
