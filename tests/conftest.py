"""Test config: force CPU with 8 virtual devices so sharding tests run
anywhere (the driver validates the real multi-chip path separately via
__graft_entry__.dryrun_multichip)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Force CPU: this image's sitecustomize registers the axon remote-TPU PJRT
# plugin and *overwrites* jax_platforms to "axon,cpu" at import time, which
# would route every tiny test compile through the remote tunnel.  The env
# var is ignored, so override the config after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# this box has very few cores: persist compiled executables across runs
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
