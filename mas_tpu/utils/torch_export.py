"""PyTorch-reference checkpoint exporter (inverse of torch_import).

Converts this framework's flax param trees back into reference-layout
state_dicts so weights trained on TPU can be handed to the reference's
torch ecosystem (``/root/reference/models/vqvae.py:8-39``,
``models/transformer.py:275-378``) — the return leg of the migration
story (MIGRATION.md).  Exact inverse of
:mod:`mas_tpu.utils.torch_import`: ``convert_*_state(export_*_state(v))``
is a bitwise round-trip (tested in ``tests/test_torch_export.py``).

Key mechanics (each the inverse of the importer's):
  * Sequential indices are re-derived from the config with the SAME
    layout replay (:func:`torch_import._encoder_layout` /
    ``_decoder_layout``), so both directions stay in lockstep,
  * conv kernels transpose HWIO -> OIHW; flax ``scale`` -> torch
    ``weight``,
  * Sync-BN running stats come from the ``batch_stats`` collection;
    ``num_batches_tracked`` (required by a strict torch load) is
    emitted as int64 zero — torch only consults it when
    ``momentum=None``, which the reference never uses,
  * torch ``nn.Linear`` weights transpose [in, out] -> [out, in];
    the fused qkv stays fused.

Buffers that are derived state rather than weights (the reference
transformer's registered ``transformer.mask``) are NOT emitted: load
with ``strict=False`` or let the reference module keep its own buffer
(``load_state_dict(..., strict=False)`` reports it as the only missing
key).  Values are numpy arrays; :func:`save_torch_checkpoint` converts
to CPU torch tensors on write.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .config import TransformerConfig, VQModelConfig
from .torch_import import _decoder_layout, _encoder_layout


def _np(v) -> np.ndarray:
    return np.asarray(v)


def _conv(out: Dict[str, Any], prefix: str, p: Dict[str, Any]) -> None:
    out[f"{prefix}.weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in p:
        out[f"{prefix}.bias"] = _np(p["bias"])


def _norm(out: Dict[str, Any], prefix: str, p: Dict[str, Any]) -> None:
    out[f"{prefix}.weight"] = _np(p["scale"])
    out[f"{prefix}.bias"] = _np(p["bias"])


def _resnet(out: Dict[str, Any], prefix: str, p: Dict[str, Any]) -> None:
    _norm(out, f"{prefix}.norm1", p["norm1"])
    _conv(out, f"{prefix}.conv1", p["conv1"])
    _norm(out, f"{prefix}.norm2", p["norm2"])
    _conv(out, f"{prefix}.conv2", p["conv2"])
    if "nin_shortcut" in p:
        _conv(out, f"{prefix}.nin_shortcut", p["nin_shortcut"])


def _attn(out: Dict[str, Any], prefix: str, p: Dict[str, Any]) -> None:
    _norm(out, f"{prefix}.norm", p["norm"])
    for name in ("q", "k", "v", "proj_out"):
        _conv(out, f"{prefix}.{name}", p[name])


def _export_sequential(out: Dict[str, Any], torch_prefix: str,
                       plan, params: Dict[str, Any]) -> None:
    for idx, (kind, name) in enumerate(plan):
        p = f"{torch_prefix}.{idx}"
        if kind == "skip":
            continue
        if kind == "conv":
            _conv(out, p, params[name])
        elif kind == "resnet":
            _resnet(out, p, params[name])
        elif kind == "attn":
            _attn(out, p, params[name])
        elif kind in ("down", "up"):
            _conv(out, f"{p}.conv", params[name]["conv"])
        elif kind == "norm":
            _norm(out, p, params[name])


def export_vqbase_state(variables: Dict[str, Any],
                        cfg: VQModelConfig) -> Dict[str, np.ndarray]:
    """``{"params": ..., "batch_stats": ...}`` -> reference VQBASE
    state_dict (flat str -> np.ndarray)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    out: Dict[str, np.ndarray] = {}
    _export_sequential(out, "encoder.model", _encoder_layout(cfg),
                       params["encoder"])
    _export_sequential(out, "decoder.model", _decoder_layout(cfg),
                       params["decoder"])
    # quant_conv = Sequential(Conv2d 1x1, SyncBatchNorm)  (vqvae.py:14-17)
    _conv(out, "quant_conv.0", params["quant_conv"])
    _norm(out, "quant_conv.1", params["quant_bn"])
    out["quant_conv.1.running_mean"] = _np(stats["quant_bn"]["mean"])
    out["quant_conv.1.running_var"] = _np(stats["quant_bn"]["var"])
    out["quant_conv.1.num_batches_tracked"] = np.zeros((), dtype=np.int64)
    _conv(out, "post_quant_conv", params["post_quant_conv"])
    out["quantize.embedding.weight"] = _np(params["codebook_embedding"])
    return out


# ---------------------------------------------------------------------------
# transformer
# ---------------------------------------------------------------------------

def _linear(out: Dict[str, Any], prefix: str, p: Dict[str, Any]) -> None:
    out[f"{prefix}.weight"] = _np(p["kernel"]).transpose(1, 0)
    if "bias" in p:
        out[f"{prefix}.bias"] = _np(p["bias"])


def _ln(out: Dict[str, Any], prefix: str, p: Dict[str, Any]) -> None:
    out[f"{prefix}.weight"] = _np(p["scale"])
    out[f"{prefix}.bias"] = _np(p["bias"])


def export_transformer_state(variables: Dict[str, Any],
                             cfg: TransformerConfig) -> Dict[str, np.ndarray]:
    """Flax MakeAScene params -> reference state_dict.

    Requires the unrolled checkpoint form (``layer_{i}`` subtrees) — a
    ``cfg.scan_layers`` stacked tree must go through
    :func:`mas_tpu.models.transformer.unstack_layer_params` first.
    GQA trees (``cfg.kv_heads < cfg.num_heads``) have no reference
    counterpart (the reference qkv is square, ``transformer.py:296-318``)
    and are rejected.
    """
    if cfg.kv_heads != cfg.num_attn_heads:
        raise ValueError(
            f"GQA (kv_heads={cfg.kv_heads} < heads={cfg.num_attn_heads}) "
            "has no reference-layout equivalent (the reference qkv is "
            "square); export requires an MHA config")
    params = variables["params"] if "params" in variables else variables
    if "layer_0" not in params:
        raise ValueError(
            "expected the unrolled checkpoint form with 'layer_0'.. keys; "
            "for a scan_layers tree apply "
            "mas_tpu.models.transformer.unstack_layer_params first")
    out: Dict[str, np.ndarray] = {}
    for name in ("image_token_embedding", "seg_token_embedding",
                 "text_token_embedding", "text_pos_embeddings",
                 "seg_row_embeddings", "seg_col_embeddings",
                 "image_row_embeddings", "image_col_embeddings"):
        out[f"{name}.weight"] = _np(params[name]["embedding"])
    for i in range(cfg.num_layers):
        layer = params[f"layer_{i}"]
        t = f"transformer.layers.{i}"
        _ln(out, f"{t}.ln_in", layer["ln_in"])
        _ln(out, f"{t}.ln_out", layer["ln_out"])
        _linear(out, f"{t}.attn.qkv", layer["attn"]["qkv"])
        _linear(out, f"{t}.attn.out_proj", layer["attn"]["out_proj"])
        _linear(out, f"{t}.mlp.lin1", layer["mlp"]["lin1"])
        _linear(out, f"{t}.mlp.lin2", layer["mlp"]["lin2"])
        if "first_ln_sandwich" in layer:
            _ln(out, f"{t}.first_ln_sandwich", layer["first_ln_sandwich"])
            _ln(out, f"{t}.second_ln_sandwich", layer["second_ln_sandwich"])
    _ln(out, "transformer.final_ln", params["final_ln"])
    _ln(out, "to_logits.0", params["logits_ln"])
    _linear(out, "to_logits.1", params["logits_dense"])
    return out


def save_torch_checkpoint(path: str, state: Dict[str, np.ndarray]) -> None:
    """torch.save a flat numpy state_dict as CPU torch tensors (the form
    the reference's ``torch.load`` + ``load_state_dict`` consume)."""
    import torch

    # np.array(copy=True): jax buffers are non-writable views, and torch
    # warns on (and forbids writes through) from_numpy of those
    torch.save({k: torch.from_numpy(np.array(v)) for k, v in state.items()},
               path)
