"""Device mesh + sharding helpers.

Replaces the reference's NCCL DDP world (``/root/reference/train.py:20-34``,
one process per GPU, allreduce hooks) with SPMD over a
``jax.sharding.Mesh``:

  * axis ``data``  — batch sharding; gradient mean happens inside jit as an
    XLA all-reduce over ICI (the DDP equivalent, no hooks needed),
  * axis ``model`` — tensor parallelism for the transformer (reserved; the
    reference has no TP, SURVEY §2.5).

All train steps are written in global view: ``jit`` + sharded inputs; XLA
inserts the collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.config import MeshConfig

AXIS_DATA = "data"
AXIS_MODEL = "model"


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    cfg = cfg or MeshConfig()
    data, model = cfg.shape(len(devices))
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, (AXIS_DATA, AXIS_MODEL))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(AXIS_DATA))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree of arrays with batch-sharded leading axes.

    Multi-host: each process passes only its LOCAL rows (its share of the
    global batch) and the global array is assembled via
    ``make_array_from_process_local_data`` — hosts never materialize or
    decode other hosts' samples (each host's input pipeline produces
    global_batch / process_count rows; see ``data.tario.shard_split``)."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
