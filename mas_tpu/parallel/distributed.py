"""Multi-host runtime bootstrap.

Replaces the reference's NCCL rendezvous (``/root/reference/train.py:20-34``:
``dist.init_process_group('nccl')`` against a hardcoded
``MASTER_ADDR=localhost:33751`` — single-node only) with JAX's multi-host
initialization.  On TPU pods the coordinator/process ids come from the
environment automatically; explicit args cover GPU/CPU clusters and tests.

After ``initialize()``, every host runs the SAME global-view program: the
``Mesh`` spans all devices (``jax.devices()``), per-host input pipelines
shard by ``jax.process_index()`` (``data.tario.shard_split``), and
collectives ride ICI/DCN via XLA — no NCCL analog to manage (SURVEY §2.5).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> dict:
    """Idempotent ``jax.distributed.initialize`` + topology report.

    No-ops on single-process runs (the common local/dev case) so entry
    points can call it unconditionally.
    """
    # Decide from the ENVIRONMENT before touching any jax API that would
    # initialize the local backend (jax.process_count() does!) — once the
    # backend exists, jax.distributed.initialize is a stale
    # single-process view.  Idempotence is exception-based: a repeat call
    # raises 'already initialized', which we treat as success.
    want = coordinator_address is not None or _looks_like_multiprocess()
    if want:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id)
        except RuntimeError as exn:
            if "already" not in str(exn).lower():
                raise
    return dict(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_devices=len(jax.local_devices()),
        global_devices=len(jax.devices()),
        backend=jax.default_backend(),
    )


def _looks_like_multiprocess() -> bool:
    import os

    return any(v in os.environ for v in (
        "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS"))


def is_primary() -> bool:
    """rank-0 check for logging/checkpoint writes (the reference's
    ``proc_id == 0`` pattern, ``log_utils.py:11-13``)."""
    return jax.process_index() == 0
