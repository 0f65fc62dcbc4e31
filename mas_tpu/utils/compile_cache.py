"""Persistent XLA compilation cache.

The reference pays no compile cost (PyTorch eager); under jit every
geometry change recompiles — measured up to 408 s for the batch-48
256^2 serving graph (BENCH_r02).  JAX's persistent compilation cache
writes compiled executables to disk keyed by (HLO, compile options,
hardware), so re-runs of the same geometry skip XLA entirely.

Enabled by every entry point (cli, bench, __graft_entry__); opt out or
relocate via the MAS_COMPILATION_CACHE env var ("" / "off" disables).
"""

from __future__ import annotations

import os
from typing import Optional


def enable_compilation_cache(path: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``path`` (default
    ``~/.cache/mas_tpu_xla`` or $MAS_COMPILATION_CACHE).  Returns the
    directory, or None when disabled."""
    import jax

    env = os.environ.get("MAS_COMPILATION_CACHE")
    if env is not None and env.strip().lower() in ("", "off", "0", "none"):
        return None
    path = path or env or os.path.join(
        os.path.expanduser("~"), ".cache", "mas_tpu_xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache only compiles that actually hurt (the big serving/train graphs);
    # tiny test jits would just churn inodes
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return path
