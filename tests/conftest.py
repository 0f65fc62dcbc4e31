"""Test harness: 8 fake CPU devices so pjit/shard_map/collectives run
without TPU hardware (SURVEY §4 test strategy)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # the harness presets axon (TPU)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin ignores the env var; force via the config API too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
