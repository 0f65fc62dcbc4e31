"""Orbax checkpointing for train states.

The reference checkpoints ``{model, discriminator, optim, disc_optim, step}``
plus the codebook phase counter ``quantize.q_counter``
(``/root/reference/train.py:69-76,108-127``) — the k-means schedule is
checkpoint state.  Our ``VQTrainState`` / ``TransformerTrainState`` carry
all of that (params, batch_stats, codebook counter+reservoir, both optimizer
states, step), so one orbax snapshot of the state pytree is lossless.

Layout: ``{dir}/step_{N}/`` orbax PyTree checkpoints + a ``latest`` file,
mirroring the reference's ``checkpoint_{step//save_period}.pt`` + ``final.pt``
naming scheme in spirit.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(directory: str, state: Any, step: int) -> str:
    """Snapshot ``state`` (any pytree) at ``{directory}/step_{step}``."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"step_{step}")
    _checkpointer().save(path, jax.device_get(state), force=True)
    with open(os.path.join(directory, "latest"), "w") as f:
        f.write(str(step))
    return path


def latest_step(directory: str) -> Optional[int]:
    marker = os.path.join(directory, "latest")
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        return int(f.read().strip())


def restore_variables(directory: str, step: Optional[int] = None) -> Any:
    """Restore ONLY the model variables (``{'params': ...}`` plus
    ``'batch_stats'`` when the state carries one) from a train-state
    checkpoint, without a state template.

    Inference/eval/export paths don't know the run's optimizer config,
    and the optimizer tree's *structure* depends on it
    (``accumulate_grad > 1`` wraps Adam in ``optax.MultiSteps``), so a
    template-based restore there breaks on any checkpoint whose training
    optimizer differs from the template's.  A params-only restore is
    immune; resume paths keep using :func:`restore_checkpoint` (they own
    the real optimizer and restore its state too)."""
    directory = os.path.abspath(directory)
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {directory}")
    raw = _checkpointer().restore(os.path.join(directory, f"step_{step}"))
    out = {"params": raw["params"]}
    if raw.get("batch_stats") is not None:
        out["batch_stats"] = raw["batch_stats"]
    return out


def restore_checkpoint(directory: str, target: Any,
                       step: Optional[int] = None) -> Any:
    """Restore into the structure of ``target`` (a state template — e.g. a
    freshly created train state; restores codebook counter/reservoir and
    both optimizer states, the reference resume semantics)."""
    directory = os.path.abspath(directory)
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {directory}")
    path = os.path.join(directory, f"step_{step}")
    import orbax.checkpoint as ocp

    restored = _checkpointer().restore(
        path, restore_args=jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(), jax.device_get(target)),
        item=jax.device_get(target))
    return jax.tree_util.tree_map(lambda t, r: r, target, restored)
