"""Parameter sharding rules (tensor parallelism for the transformer).

The reference is data-parallel only (SURVEY §2.5); the TPU rebuild reserves
a ``model`` mesh axis and shards the transformer's matmul-heavy params over
it in the Megatron pattern:

  * qkv / mlp-in kernels: column-parallel  -> P(None, 'model')
  * out_proj / mlp-out kernels: row-parallel -> P('model', None)
  * logits head: column-parallel over the vocab
  * everything else (LayerNorms, embeddings, conv stacks): replicated

Under jit global-view, annotating the params is all that's needed — XLA
inserts the all-reduces after row-parallel matmuls.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import AXIS_MODEL


_COL_PARALLEL = ("qkv", "lin1", "logits_dense")
_ROW_PARALLEL = ("out_proj", "lin2")


def _spec_for_path(path, leaf) -> P:
    # cfg.scan_layers stacks every layer param with a leading [L] axis
    # ({'layers': {'layer': ...}}); the stack axis is never sharded — the
    # scan sweeps it — so the unrolled spec shifts right by one.
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    stacked = len(names) >= 2 and names[0] == "layers" and names[1] == "layer"
    for i, name in enumerate(names):
        if name in _COL_PARALLEL:
            leaf_name = names[-1]
            if leaf_name == "kernel" and leaf.ndim == 2 + stacked:
                return P(None, None, AXIS_MODEL) if stacked \
                    else P(None, AXIS_MODEL)
            if leaf_name == "bias" and leaf.ndim == 1 + stacked:
                return P(None, AXIS_MODEL) if stacked else P(AXIS_MODEL)
        if name in _ROW_PARALLEL:
            if names[-1] == "kernel" and leaf.ndim == 2 + stacked:
                return P(None, AXIS_MODEL, None) if stacked \
                    else P(AXIS_MODEL, None)
            return P()  # row-parallel bias stays replicated (added post-psum)
    return P()


def transformer_param_shardings(mesh: Mesh, params: Any):
    """pytree of NamedShardings matching ``params``'s structure."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for_path(path, leaf)),
        params)


def replicated_shardings(mesh: Mesh, tree: Any):
    return jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), tree)
