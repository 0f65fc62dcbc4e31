"""Autoregressive sampling with KV cache + classifier-free guidance.

The reference has *no* sampling script (its KV-cache inference path,
``/root/reference/models/transformer.py:73-115``, is never driven).  This
module supplies it, TPU-style:

  * one jitted ``lax.scan`` over the 1024 image positions,
  * a preallocated [L, 2B, H, total, hd] KV cache updated in place via
    ``dynamic_update_slice`` (no concat => no recompilation, static shapes),
  * classifier-free guidance by batch-doubling: the conditional half keeps
    the real text, the unconditional half gets zeroed text tokens (which the
    embedding layer remaps to the per-position pad vocabulary, exactly the
    distribution trained by the CFG dropout in ``train.py:147-148``);
    ``logits = uncond + scale * (cond - uncond)`` (paper §3.7),
  * temperature + top-k sampling.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..utils.config import TransformerConfig
from .transformer import MakeAScene


def _sample_logits(logits, rng, temperature: float, top_k: int):
    """logits [B, V] -> token ids [B]."""
    logits = logits.astype(jnp.float32)
    if temperature != 1.0:
        logits = logits / max(temperature, 1e-6)
    if top_k > 0 and top_k < logits.shape[-1]:
        kth = jax.lax.top_k(logits, top_k)[0][:, -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1)


def _guided(logits_2b, batch: int, scale: float):
    if scale == 1.0:
        return logits_2b[:batch]
    cond, uncond = logits_2b[:batch], logits_2b[batch:]
    return uncond + scale * (cond - uncond)


@functools.partial(
    jax.jit,
    static_argnames=("model", "guidance_scale", "temperature", "top_k"))
def sample_tokens(model: MakeAScene, variables, text_tokens, seg_tokens,
                  rng, guidance_scale: float = 3.0, temperature: float = 1.0,
                  top_k: int = 0) -> jax.Array:
    """Generate image tokens [B, image_length] given text + seg tokens."""
    cfg = model.cfg
    b = text_tokens.shape[0]
    use_cfg = guidance_scale != 1.0
    if use_cfg:
        text_all = jnp.concatenate(
            [text_tokens, jnp.zeros_like(text_tokens)], axis=0)
        seg_all = jnp.concatenate([seg_tokens, seg_tokens], axis=0)
    else:
        text_all, seg_all = text_tokens, seg_tokens
    bb = text_all.shape[0]

    logits0, caches = model.apply(
        variables, text_all, seg_all, method=MakeAScene.prefill)

    # preallocate full-length per-layer caches in the TRANSPOSED decode
    # layout [B, H, hd, total] (sequence in lanes — see
    # mas_tpu.ops.decode_attention); prefix occupies [0, prefix_length)
    from ..ops.decode_attention import transpose_cache
    from ..ops.quant import QuantCache, quantize_kv

    total = cfg.total_length
    if cfg.kv_cache_dtype == "int8":
        q_full = jnp.zeros((bb, cfg.num_attn_heads, cfg.head_dim, total),
                           jnp.int8)
        s_full = jnp.ones((bb, cfg.num_attn_heads, 1, total), jnp.float32)

        def seed(kv):
            qc = quantize_kv(transpose_cache(kv))
            return QuantCache(
                jax.lax.dynamic_update_slice(q_full, qc.q, (0, 0, 0, 0)),
                jax.lax.dynamic_update_slice(s_full, qc.scale,
                                             (0, 0, 0, 0)))

        caches = tuple((seed(k), seed(v)) for k, v in caches)
    else:
        full = jnp.zeros((bb, cfg.num_attn_heads, cfg.head_dim, total),
                         caches[0][0].dtype)
        caches = tuple(
            (jax.lax.dynamic_update_slice(full, transpose_cache(k),
                                          (0, 0, 0, 0)),
             jax.lax.dynamic_update_slice(full, transpose_cache(v),
                                          (0, 0, 0, 0)))
            for k, v in caches)

    rng, r0 = jax.random.split(rng)
    tok0 = _sample_logits(_guided(logits0, b, guidance_scale), r0,
                          temperature, top_k)

    def body(carry, step):
        caches, tok, rng = carry
        tok_in = jnp.tile(tok, (bb // b,))[:, None]          # feed both halves
        logits, caches = model.apply(
            variables, tok_in, step, caches,
            method=MakeAScene.decode_step)
        rng, r = jax.random.split(rng)
        nxt = _sample_logits(_guided(logits, b, guidance_scale), r,
                             temperature, top_k)
        return (caches, nxt, rng), nxt

    (_, _, _), rest = jax.lax.scan(
        body, (caches, tok0, rng),
        jnp.arange(cfg.image_length - 1))
    tokens = jnp.concatenate([tok0[None], rest], axis=0)     # [T_img, B]
    return tokens.T.astype(jnp.int32)


def sample_images(transformer: MakeAScene, transformer_vars,
                  vq_img, vq_img_vars, text_tokens, seg_tokens, rng,
                  guidance_scale: float = 3.0, temperature: float = 1.0,
                  top_k: int = 0, decode_chunk: int = 32):
    """Full text+seg -> RGB pipeline: AR sample then VQ-IMG decode_code.

    ``decode_chunk``: the conv decoder's activations OOM past ~64 images at
    256^2 while the token sampler keeps scaling with batch, so pixels are
    decoded in fixed chunks via ``lax.map`` when the batch divides."""
    tokens = sample_tokens(transformer, transformer_vars, text_tokens,
                           seg_tokens, rng, guidance_scale=guidance_scale,
                           temperature=temperature, top_k=top_k)
    d = transformer.cfg.image_tokens_per_dim
    grid = tokens.reshape(-1, d, d)
    n = grid.shape[0]
    decode = lambda t: vq_img.apply(vq_img_vars, t,
                                    method=type(vq_img).decode_code)
    if decode_chunk and n > decode_chunk and n % decode_chunk == 0:
        chunks = grid.reshape(n // decode_chunk, decode_chunk, d, d)
        out = jax.lax.map(decode, chunks)
        return out.reshape(n, *out.shape[2:])
    return decode(grid)
