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


def _sample_logits(logits, rng, temperature: float, top_k: int,
                   approx: bool = True):
    """logits [B, V] -> token ids [B].

    Top-k sampling runs as select-k-then-categorical-over-k — the same
    distribution as masking the full vocab to the k-th value, but the
    gumbel draw shrinks from [B, V] to [B, k] and the O(V log V)-ish sort
    becomes ``approx_max_k`` (TPU-native PartialReduce, recall 0.95 over
    scattered near-ties; CPU falls back to exact).  Round-2 ablation
    priced the old full-vocab head at 0.55 ms/token (BASELINE.md).
    ``approx=False`` keeps the exact ``lax.top_k`` for parity checks.
    """
    logits = logits.astype(jnp.float32)
    if temperature != 1.0:
        logits = logits / max(temperature, 1e-6)
    if top_k > 0 and top_k < logits.shape[-1]:
        select = jax.lax.approx_max_k if approx else jax.lax.top_k
        vals, idx = select(logits, top_k)
        j = jax.random.categorical(rng, vals, axis=-1)
        return jnp.take_along_axis(idx, j[:, None], axis=-1)[:, 0]
    return jax.random.categorical(rng, logits, axis=-1)


def _guided(logits_2b, batch: int, scale: float):
    if scale == 1.0:
        return logits_2b[:batch]
    cond, uncond = logits_2b[:batch], logits_2b[batch:]
    return uncond + scale * (cond - uncond)


def _segment_plan(prefix: int, image_length: int, total: int,
                  segment: int):
    """Static decode segments [(start_step, end_step, cache_size), ...].

    The attention read cost is proportional to the (static) cache length
    in isolation (measured: T=512 runs 13% faster than T=640,
    benchmarks/decode_ablation.py), so the scan can be split into segments
    whose cache is the smallest ``segment``-multiple holding the positions
    that segment touches — early tokens never read the padded tail.

    MEASURED END-TO-END (v5e, 256² pipeline, batch 64+CFG, int8): the
    segmented scan LOSES — 23.0 img/s (segment=128) vs 24.6 (single
    full-size cache): the ~10% traffic saving is outweighed by the split
    scan's scheduling overhead (XLA overlaps the full-cache reads across
    layers so well that shrinking them buys little).  Default is therefore
    0 (off); the knob remains for long-sequence geometries where the
    skipped fraction is larger (512²: 32%).
    """
    if not segment:
        return [(0, image_length - 1, total)]
    plan = []
    s = 0
    while s < image_length - 1:
        size = min(-(-(prefix + s + 1) // segment) * segment, total)
        end = min(size - prefix, image_length - 1)
        plan.append((s, end, size))
        s = end
    return plan


@functools.partial(
    jax.jit,
    static_argnames=("model", "guidance_scale", "temperature", "top_k",
                     "cache_segment"))
def sample_tokens(model: MakeAScene, variables, text_tokens, seg_tokens,
                  rng, guidance_scale: float = 3.0, temperature: float = 1.0,
                  top_k: int = 0, cache_segment: int = 0) -> jax.Array:
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

    if (cfg.decode_ring_tail and cfg.kv_cache_dtype == "int8"
            and cfg.total_length % RING == 0):
        return _sample_tokens_ring(model, variables, caches, logits0, b,
                                   bb, rng, guidance_scale, temperature,
                                   top_k)

    from ..ops.decode_attention import transpose_cache
    from ..ops.quant import QuantCache, quantize_kv

    if (cfg.kv_cache_layout == "packed"
            and cfg.kv_cache_dtype in ("int8", "int4")):
        # packed k‖v cache, updated in place by the aliased Pallas RMW
        # kernel (ops/decode_cache.py) — full-size from the start (growing
        # would copy; the aliased write never does), no segmenting
        from ..ops.decode_cache import seed_packed_cache

        qdt = jnp.int4 if cfg.kv_cache_dtype == "int4" else jnp.int8
        caches = tuple(
            (seed_packed_cache(k, v, cfg.total_length, dtype=qdt), None)
            for k, v in caches)
        return _decode_loop(model, variables, caches, logits0, b, bb, rng,
                            guidance_scale, temperature, top_k)

    # preallocate per-layer caches in the TRANSPOSED decode layout
    # [B, H, hd, size] (sequence in lanes — see mas_tpu.ops.
    # decode_attention); prefix occupies [0, prefix_length).  Caches start
    # at the first segment's size and grow between segments (zero-pad +
    # one full copy per boundary, amortized over the segment's tokens).
    plan = _segment_plan(cfg.prefix_length, cfg.image_length,
                         cfg.total_length, cache_segment)
    size0 = plan[0][2]
    if cfg.kv_cache_dtype in ("int8", "int4"):
        qdt = jnp.int4 if cfg.kv_cache_dtype == "int4" else jnp.int8
        sdt = (jnp.bfloat16 if cfg.kv_scale_dtype == "bfloat16"
               else jnp.float32)
        q_full = jnp.zeros((bb, cfg.kv_heads, cfg.head_dim, size0), qdt)
        s_full = jnp.ones((bb, cfg.kv_heads, 1, size0), sdt)

        def seed(kv):
            qc = quantize_kv(transpose_cache(kv), dtype=qdt,
                             scale_dtype=sdt)
            return QuantCache(
                jax.lax.dynamic_update_slice(q_full, qc.q, (0, 0, 0, 0)),
                jax.lax.dynamic_update_slice(s_full, qc.scale,
                                             (0, 0, 0, 0)))

        caches = tuple((seed(k), seed(v)) for k, v in caches)
    else:
        full = jnp.zeros((bb, cfg.kv_heads, cfg.head_dim, size0),
                         caches[0][0].dtype)
        caches = tuple(
            (jax.lax.dynamic_update_slice(full, transpose_cache(k),
                                          (0, 0, 0, 0)),
             jax.lax.dynamic_update_slice(full, transpose_cache(v),
                                          (0, 0, 0, 0)))
            for k, v in caches)

    def grow(c, size):
        extra = size - (c.q.shape[-1] if isinstance(c, QuantCache)
                        else c.shape[-1])
        if extra == 0:
            return c
        pad = ((0, 0), (0, 0), (0, 0), (0, extra))
        if isinstance(c, QuantCache):
            return QuantCache(jnp.pad(c.q, pad),
                              jnp.pad(c.scale, pad, constant_values=1.0))
        return jnp.pad(c, pad)

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

    tok, parts = tok0, []
    for start, end, size in plan:
        caches = tuple((grow(k, size), grow(v, size)) for k, v in caches)
        (caches, tok, rng), seg_toks = jax.lax.scan(
            body, (caches, tok, rng), jnp.arange(start, end))
        parts.append(seg_toks)
    tokens = jnp.concatenate([tok0[None]] + parts, axis=0)   # [T_img, B]
    return tokens.T.astype(jnp.int32)


def _decode_loop(model, variables, caches, logits0, b, bb, rng,
                 guidance_scale, temperature, top_k):
    """Single full-size-cache decode scan (the packed-cache path: the
    aliased in-place write makes cache growth/segmenting pointless)."""
    cfg = model.cfg
    rng, r0 = jax.random.split(rng)
    tok0 = _sample_logits(_guided(logits0, b, guidance_scale), r0,
                          temperature, top_k)

    def body(carry, step):
        caches, tok, rng = carry
        tok_in = jnp.tile(tok, (bb // b,))[:, None]
        logits, caches = model.apply(
            variables, tok_in, step, caches,
            method=MakeAScene.decode_step)
        rng, r = jax.random.split(rng)
        nxt = _sample_logits(_guided(logits, b, guidance_scale), r,
                             temperature, top_k)
        return (caches, nxt, rng), nxt

    (_, _, _), toks = jax.lax.scan(
        body, (caches, tok0, rng), jnp.arange(0, cfg.image_length - 1))
    tokens = jnp.concatenate([tok0[None], toks], axis=0)     # [T_img, B]
    return tokens.T.astype(jnp.int32)


RING = 128


def _sample_tokens_ring(model: MakeAScene, variables, prefill_caches,
                        logits0, b, bb, rng, guidance_scale, temperature,
                        top_k):
    """Ring-tail decode (TransformerConfig.decode_ring_tail).

    The bulk of each layer's cache lives in an int8 "frozen" pair that is
    a closure constant of each segment's scan — XLA never copies it as a
    carry.  Only the [B, H, hd, RING] compute-dtype tails are carried and
    written per token.  Between segments the filled tail is quantized and
    flushed into the frozen region at a static offset.
    """
    from ..ops.decode_attention import transpose_cache
    from ..ops.quant import QuantCache, quantize_kv

    cfg = model.cfg
    prefix, total = cfg.prefix_length, cfg.total_length
    tf = total - RING
    tail_base0 = (prefix // RING) * RING
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    frozen, tails = [], []
    for k, v in prefill_caches:
        kt, vt = transpose_cache(k), transpose_cache(v)    # [B,H,hd,prefix]
        fq = jnp.zeros((bb, cfg.num_attn_heads, cfg.head_dim, tf), jnp.int8)
        fs = jnp.ones((bb, cfg.num_attn_heads, 1, tf), jnp.float32)

        def seed_frozen(kv_t, fq=fq, fs=fs):
            qc = quantize_kv(kv_t[..., :tail_base0])
            return QuantCache(
                jax.lax.dynamic_update_slice(fq, qc.q, (0, 0, 0, 0)),
                jax.lax.dynamic_update_slice(fs, qc.scale, (0, 0, 0, 0)))

        def seed_tail(kv_t):
            t = jnp.zeros((bb, cfg.num_attn_heads, cfg.head_dim, RING), dt)
            if prefix > tail_base0:
                t = jax.lax.dynamic_update_slice(
                    t, kv_t[..., tail_base0:prefix].astype(dt),
                    (0, 0, 0, 0))
            return t

        frozen.append((seed_frozen(kt), seed_frozen(vt)))
        tails.append((seed_tail(kt), seed_tail(vt)))
    frozen, tails = tuple(frozen), tuple(tails)

    rng, r0 = jax.random.split(rng)
    tok0 = _sample_logits(_guided(logits0, b, guidance_scale), r0,
                          temperature, top_k)

    def flush(frozen, tails, base):
        """Quantize the filled tails into the frozen region at ``base``."""
        out = []
        for (fk, fv), (tk, tv) in zip(frozen, tails):
            def put(f, t):
                qc = quantize_kv(t)
                return QuantCache(
                    jax.lax.dynamic_update_slice(f.q, qc.q, (0, 0, 0, base)),
                    jax.lax.dynamic_update_slice(f.scale, qc.scale,
                                                 (0, 0, 0, base)))
            out.append((put(fk, tk), put(fv, tv)))
        return tuple(out)

    plan = _segment_plan(prefix, cfg.image_length, total, RING)
    tok, parts, prev_base = tok0, [], None
    for start, end, size in plan:
        tail_base = size - RING
        if prev_base is not None:
            frozen = flush(frozen, tails, prev_base)
            zero = jnp.zeros((bb, cfg.num_attn_heads, cfg.head_dim, RING),
                             dt)
            tails = tuple((zero, zero) for _ in tails)
        prev_base = tail_base

        def body(carry, step, frozen=frozen, tail_base=tail_base):
            tails, tok, rng = carry
            tok_in = jnp.tile(tok, (bb // b,))[:, None]
            logits, tails = model.apply(
                variables, tok_in, step, frozen, tails, tail_base,
                method=MakeAScene.ring_decode_step)
            rng, r = jax.random.split(rng)
            nxt = _sample_logits(_guided(logits, b, guidance_scale), r,
                                 temperature, top_k)
            return (tails, nxt, rng), nxt

        (tails, tok, rng), seg_toks = jax.lax.scan(
            body, (tails, tok, rng), jnp.arange(start, end))
        parts.append(seg_toks)
    tokens = jnp.concatenate([tok0[None]] + parts, axis=0)
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
