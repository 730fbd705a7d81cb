"""Test configuration: force JAX onto CPU with 8 virtual devices so
multi-chip sharding (shard_map over a Mesh) is exercised without TPU
hardware.

The container's sitecustomize registers the axon TPU backend at interpreter
startup (before this file runs), so forcing the platform via JAX_PLATFORMS
env alone is not enough — the jax config must be updated post-import. The
XLA_FLAGS write still works here because the CPU PJRT client is created
lazily, at the first computation."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: trainer tests compile several large fused
# programs; cache them across test runs.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
