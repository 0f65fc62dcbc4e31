"""PyTorch-reference checkpoint importer.

Converts a reference ``VQBASE`` state_dict (``/root/reference/models/
vqvae.py:8-39`` with the flat ``nn.Sequential`` encoder/decoder,
``models/modules.py:199-240,337-369``) into this framework's flax param
tree, enabling token-index / reconstruction parity checks against reference
checkpoints (BASELINE.md) and warm-starting TPU training from GPU runs.

Key mechanics:
  * the reference's ``encoder.model.{i}.*`` / ``decoder.model.{i}.*``
    Sequential indices are re-derived from the config by replaying the
    construction loop (same channel plan / attn placement), then mapped to
    our stable module names (``down_{i}_block_{j}``, ``mid_attn``, ...),
  * conv kernels transpose OIHW -> HWIO (NCHW -> NHWC build),
  * GroupNorm/BatchNorm ``weight``/``bias`` -> ``scale``/``bias``;
    Sync-BN running stats land in the ``batch_stats`` collection,
  * ``quantize.embedding.weight`` -> the ``codebook_embedding`` param.

Also converts the reference ``MakeAScene`` transformer state_dict
(``models/transformer.py:275-378``): torch ``nn.Linear`` weights transpose
[out, in] -> [in, out]; fused qkv stays fused (both use one qkv matmul).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

from .config import TransformerConfig, VQModelConfig


def _np(v):
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)


def _conv(flat, prefix):
    out = {"kernel": _np(flat[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in flat:
        out["bias"] = _np(flat[f"{prefix}.bias"])
    return out


def _norm(flat, prefix):
    return {"scale": _np(flat[f"{prefix}.weight"]),
            "bias": _np(flat[f"{prefix}.bias"])}


def _resnet(flat, prefix):
    out = {"norm1": _norm(flat, f"{prefix}.norm1"),
           "conv1": _conv(flat, f"{prefix}.conv1"),
           "norm2": _norm(flat, f"{prefix}.norm2"),
           "conv2": _conv(flat, f"{prefix}.conv2")}
    if f"{prefix}.nin_shortcut.weight" in flat:
        out["nin_shortcut"] = _conv(flat, f"{prefix}.nin_shortcut")
    return out


def _attn(flat, prefix):
    return {"norm": _norm(flat, f"{prefix}.norm"),
            "q": _conv(flat, f"{prefix}.q"),
            "k": _conv(flat, f"{prefix}.k"),
            "v": _conv(flat, f"{prefix}.v"),
            "proj_out": _conv(flat, f"{prefix}.proj_out")}


def _encoder_layout(cfg: VQModelConfig) -> List[Tuple[str, str]]:
    """Replay the reference Encoder Sequential construction
    (``modules.py:219-237``) -> [(kind, our_name)] per Sequential index."""
    plan: List[Tuple[str, str]] = [("conv", "conv_in")]
    res = cfg.resolution
    chans = cfg.channels
    for i in range(len(chans) - 1):
        for j in range(cfg.num_res_blocks):
            plan.append(("resnet", f"down_{i}_block_{j}"))
            if res in cfg.attn_resolutions:
                plan.append(("attn", f"down_{i}_attn_{j}"))
        if i < len(chans) - 2:
            plan.append(("down", f"down_{i}_downsample"))
            res //= 2
    plan += [("resnet", "mid_block_1"), ("attn", "mid_attn"),
             ("resnet", "mid_block_2"), ("norm", "norm_out"),
             ("skip", ""), ("conv", "conv_out")]
    return plan


def _decoder_layout(cfg: VQModelConfig) -> List[Tuple[str, str]]:
    """Replay the reference Decoder Sequential (``modules.py:345-365``)."""
    ch_mult = cfg.channels[1:]
    n = len(ch_mult)
    res = cfg.resolution // 2 ** (n - 1)
    plan: List[Tuple[str, str]] = [
        ("conv", "conv_in"), ("resnet", "mid_block_1"),
        ("attn", "mid_attn"), ("resnet", "mid_block_2")]
    for i in reversed(range(n)):
        for j in range(cfg.num_res_blocks + 1):
            plan.append(("resnet", f"up_{i}_block_{j}"))
            if res in cfg.attn_resolutions:
                plan.append(("attn", f"up_{i}_attn_{j}"))
        if i > 0:
            plan.append(("up", f"up_{i}_upsample"))
        res *= 2
    plan += [("norm", "norm_out"), ("skip", ""), ("conv", "conv_out")]
    return plan


def _convert_sequential(flat: Dict[str, Any], torch_prefix: str,
                        plan: List[Tuple[str, str]]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for idx, (kind, name) in enumerate(plan):
        p = f"{torch_prefix}.{idx}"
        if kind == "skip":
            continue
        if kind == "conv":
            out[name] = _conv(flat, p)
        elif kind == "resnet":
            out[name] = _resnet(flat, p)
        elif kind == "attn":
            out[name] = _attn(flat, p)
        elif kind == "down" or kind == "up":
            out[name] = {"conv": _conv(flat, f"{p}.conv")}
        elif kind == "norm":
            out[name] = _norm(flat, p)
    return out


def convert_vqbase_state(state: Dict[str, Any],
                         cfg: VQModelConfig) -> Dict[str, Any]:
    """Reference VQBASE state_dict -> {"params": ..., "batch_stats": ...}."""
    flat = {k: v for k, v in state.items()}
    params: Dict[str, Any] = {}
    params["encoder"] = _convert_sequential(flat, "encoder.model",
                                            _encoder_layout(cfg))
    params["decoder"] = _convert_sequential(flat, "decoder.model",
                                            _decoder_layout(cfg))
    # quant_conv = Sequential(Conv2d 1x1, SyncBatchNorm)  (vqvae.py:14-17)
    params["quant_conv"] = _conv(flat, "quant_conv.0")
    params["quant_bn"] = _norm(flat, "quant_conv.1")
    params["post_quant_conv"] = _conv(flat, "post_quant_conv")
    params["codebook_embedding"] = _np(flat["quantize.embedding.weight"])
    batch_stats = {"quant_bn": {
        "mean": _np(flat["quant_conv.1.running_mean"]),
        "var": _np(flat["quant_conv.1.running_var"])}}
    return {"params": params, "batch_stats": batch_stats}


# ---------------------------------------------------------------------------
# transformer
# ---------------------------------------------------------------------------

def _linear(flat, prefix):
    out = {"kernel": _np(flat[f"{prefix}.weight"]).transpose(1, 0)}
    if f"{prefix}.bias" in flat:
        out["bias"] = _np(flat[f"{prefix}.bias"])
    return out


def _embed(flat, prefix):
    return {"embedding": _np(flat[f"{prefix}.weight"])}


def _ln(flat, prefix):
    return {"scale": _np(flat[f"{prefix}.weight"]),
            "bias": _np(flat[f"{prefix}.bias"])}


def convert_transformer_state(state: Dict[str, Any],
                              cfg: TransformerConfig) -> Dict[str, Any]:
    """Reference MakeAScene state_dict -> flax params.

    Reference names (actual module attributes, ``transformer.py:159-174,
    233-247,296-318``): ``*_token_embedding``, ``text_pos_embeddings``,
    ``{seg,image}_{row,col}_embeddings``,
    ``transformer.layers.{i}.{ln_in, ln_out, first_ln_sandwich,
    second_ln_sandwich, attn.qkv/out_proj, mlp.lin1/lin2}``,
    ``transformer.final_ln``, ``to_logits.{0,1}`` (LN + Linear).
    (``transformer.mask`` is a registered buffer — ignored; this build
    derives the mask in closed form.)
    """
    flat = {k: v for k, v in state.items()}
    p: Dict[str, Any] = {}
    for ours, theirs in [
            ("image_token_embedding", "image_token_embedding"),
            ("seg_token_embedding", "seg_token_embedding"),
            ("text_token_embedding", "text_token_embedding"),
            ("text_pos_embeddings", "text_pos_embeddings"),
            ("seg_row_embeddings", "seg_row_embeddings"),
            ("seg_col_embeddings", "seg_col_embeddings"),
            ("image_row_embeddings", "image_row_embeddings"),
            ("image_col_embeddings", "image_col_embeddings")]:
        p[ours] = _embed(flat, theirs)
    for i in range(cfg.num_layers):
        t = f"transformer.layers.{i}"
        layer = {
            "ln_in": _ln(flat, f"{t}.ln_in"),
            "ln_out": _ln(flat, f"{t}.ln_out"),
            "attn": {"qkv": _linear(flat, f"{t}.attn.qkv"),
                     "out_proj": _linear(flat, f"{t}.attn.out_proj")},
            "mlp": {"lin1": _linear(flat, f"{t}.mlp.lin1"),
                    "lin2": _linear(flat, f"{t}.mlp.lin2")},
        }
        if f"{t}.first_ln_sandwich.weight" in flat:
            layer["first_ln_sandwich"] = _ln(flat, f"{t}.first_ln_sandwich")
            layer["second_ln_sandwich"] = _ln(flat,
                                              f"{t}.second_ln_sandwich")
        p[f"layer_{i}"] = layer
    p["final_ln"] = _ln(flat, "transformer.final_ln")
    p["logits_ln"] = _ln(flat, "to_logits.0")
    p["logits_dense"] = _linear(flat, "to_logits.1")
    return {"params": p}


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Deserialize a torch ``.pt`` file (CPU torch, baked in)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model", "state_dict"):
        if isinstance(state, dict) and key in state and isinstance(
                state[key], dict):
            state = state[key]
            break
    return state
