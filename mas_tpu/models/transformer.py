"""MakeAScene autoregressive transformer, TPU-native.

Rebuilds the reference ruDALL-E-derived stack
(``/root/reference/models/transformer.py``):

  * token sequence [text | seg | image], lengths 128 + 16^2 + 32^2 = 1408,
  * three token embeddings + text positional + factorized row/col positional
    embeddings for seg and image grids (``transformer.py:300-313,329-347``),
  * text pad-token remap ``0 -> text_vocab_size - text_length + pos``
    (``transformer.py:350-353``),
  * causal mask that is fully bidirectional over the text+seg prefix
    (``transformer.py:366-370``),
  * CogView PB-relax attention (q pre-scaled by 1/sqrt(d); alpha-scaled
    max subtraction, ``transformer.py:44-71``) and sandwich LayerNorms
    (``transformer.py:161-163,183-187,205-206``),
  * ``to_logits`` = LayerNorm + Linear; training forward returns logits for
    image positions only (``transformer.py:378``).

TPU-first notes: attention runs in fp32 scores with a closed-form index mask
(no [T, T] buffer materialized per layer); the PB-relax max-subtraction is
algebraically a softmax shift, so the Pallas flash-attention path
(``mas_tpu.ops.attention``) realizes it as the standard running row-max.
Decode uses a preallocated KV cache updated via ``dynamic_update_slice``
(see ``mas_tpu.models.sampler``), not concatenation.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import (DEFAULT_BLOCK_K, DEFAULT_BLOCK_Q,
                             prefix_causal_attention)
from ..ops.norms import folded_ln_dense, layer_norm
from ..utils.config import TransformerConfig

Cache = Dict[str, jax.Array]

_INIT = nn.initializers.normal(stddev=0.02)


def _dt(cfg: TransformerConfig):
    """Compute dtype: params stay fp32; activations/matmuls may be bf16."""
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def resolve_attention_impl(cfg: TransformerConfig, seq_len: int) -> str:
    """'auto' attention dispatch, measured on v5e (bf16, 1024-hidden).

    Round 1 (blk 128x128 flash) had jnp winning short sequences; with the
    single-pass blocks (``ops.attention.auto_blocks``) the flash kernel
    wins every measured geometry and jnp stops compiling at scale:

      * seq 640, 24 layers, batch 16: jnp FAILS TO COMPILE (fp32 score
        transients); pallas runs 262.6 ms/step (36.3% MFU).
      * seq 1408, 24 layers: pallas 853 ms/step vs round-1 1240; jnp
        fails to compile at batch 32.

    Hence: pallas on TPU whenever the sequence tiles the blocks, jnp as
    the CPU/odd-length fallback.  Explicit cfg.attention_impl overrides.
    """
    impl = cfg.attention_impl
    if impl != "auto":
        return impl
    divisible = (seq_len % DEFAULT_BLOCK_Q == 0
                 and seq_len % DEFAULT_BLOCK_K == 0)
    return "pallas" if (jax.default_backend() == "tpu" and divisible
                        ) else "jnp"


def _gelu(x):
    # OpenAI tanh-approx gelu (reference transformer.py:11-14)
    return jax.nn.gelu(x, approximate=True)


def _length_buckets(t: int, n: int, prefix: int = 0) -> tuple:
    """<= n ascending 128-multiple slice lengths ending at t (see
    TransformerConfig.decode_length_buckets).  The decode valid length is
    always > prefix, so only bounds beyond the prefix partition anything —
    candidates below it are dropped.  Degenerates to () when fewer than
    two useful bounds exist."""
    if n <= 1:
        return ()
    cands = [b for b in range(128, t, 128) if b > prefix] + [t]
    if len(cands) > n:
        # thin to n evenly spaced candidates, always keeping t
        keep = sorted({round((i + 1) * len(cands) / n) - 1
                       for i in range(n)})
        cands = [cands[j] for j in keep]
    return tuple(cands) if len(cands) > 1 else ()


def prefix_causal_mask(q_pos: jax.Array, k_pos: jax.Array,
                       prefix_length: int) -> jax.Array:
    """mask[i, j] = (k_pos[j] <= q_pos[i]) or both in the text+seg prefix."""
    causal = k_pos[None, :] <= q_pos[:, None]
    bidir = jnp.logical_and(q_pos[:, None] < prefix_length,
                            k_pos[None, :] < prefix_length)
    return jnp.logical_or(causal, bidir)


class LayerNorm(nn.Module):
    eps: float = 1e-5
    impl: str = "jnp"  # 'jnp' | 'pallas' (cfg.layernorm_impl)
    # features set => params are declared eagerly in setup so
    # ``fold_params()`` can hand them to a folded LNDense matmul without
    # calling the LN itself (cfg.ln_matmul_fold). Same param tree either
    # way ('scale'/'bias'), so checkpoints are interchangeable.
    features: Optional[int] = None

    def setup(self):
        if self.features is not None:
            self.scale = self.param("scale", nn.initializers.ones,
                                    (self.features,))
            self.bias = self.param("bias", nn.initializers.zeros,
                                   (self.features,))

    @nn.compact
    def __call__(self, x):
        if self.features is not None:
            scale, bias = self.scale, self.bias
        else:
            d = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (d,))
            bias = self.param("bias", nn.initializers.zeros, (d,))
        return layer_norm(x, scale, bias, self.eps, impl=self.impl)

    def fold_params(self):
        """(scale, bias, eps) for a folded LN->matmul (requires
        ``features``).  eps rides along so the folded path normalizes with
        THIS module's eps, not a downstream default (ADVICE r4)."""
        return self.scale, self.bias, self.eps


class LNDense(nn.Module):
    """``nn.Dense`` twin (identical param tree, init and dtype semantics)
    whose call can fuse a preceding LayerNorm algebraically
    (``ops.norms.folded_ln_dense``) instead of consuming a materialized
    normalized tensor — the LN write+read is the measured 10.6% all-LN
    bandwidth bound of the flagship train step (results/train_levers.txt).

    ``dtype=None`` mirrors ``nn.Dense``'s promote-to-widest semantics
    (bf16 input x fp32 params -> fp32 compute); every production call
    site passes the config compute dtype explicitly.
    """

    features: int
    dtype: Any = None
    kernel_init: Any = _INIT

    @nn.compact
    def __call__(self, x, ln_fold=None):
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = (self.dtype if self.dtype is not None
              else jnp.result_type(x.dtype, kernel.dtype, bias.dtype))
        if ln_fold is None:
            return (x.astype(dt) @ kernel.astype(dt) + bias.astype(dt))
        ln_scale, ln_bias, eps = ln_fold
        return folded_ln_dense(x, ln_scale, ln_bias, kernel, bias,
                               eps=eps, dtype=dt)


class SelfAttention(nn.Module):
    """Multi-head attention with PB-relax numerical stabilization.

    ``__call__``: full-sequence training/prefill attention.
    ``decode``: single-token cached step — writes the new k/v into the
    preallocated cache (functional ``dynamic_update_slice``, no concat,
    unlike the reference's ``torch.cat`` cache, ``transformer.py:82-85``).
    """

    cfg: TransformerConfig

    def setup(self):
        dt = _dt(self.cfg)
        # GQA: k/v projections emit kv_heads*head_dim features; with the
        # default (kv_heads == num_attn_heads) this is exactly the
        # reference's fused 3*hidden projection, same parameter layout
        self.qkv = LNDense(
            self.cfg.hidden_dim + 2 * self.cfg.kv_heads * self.cfg.head_dim,
            kernel_init=_INIT, dtype=dt, name="qkv")
        self.out_proj = nn.Dense(self.cfg.hidden_dim, kernel_init=_INIT,
                                 dtype=dt, name="out_proj")

    def _heads(self, t, n_heads: Optional[int] = None):
        b = t.shape[0]
        return t.reshape(b, -1, n_heads or self.cfg.num_attn_heads,
                         self.cfg.head_dim).transpose(0, 2, 1, 3)

    def _qkv(self, x, ln_fold=None):
        """q [B, T, H, hd]->[B, H, T, hd]; k/v with cfg.kv_heads heads.
        ``ln_fold``: (scale, bias) of the block's ln_in, folded into the
        qkv matmul (cfg.ln_matmul_fold) — x is then the UN-normalized
        (prescaled) residual stream."""
        cfg = self.cfg
        kv_dim = cfg.kv_heads * cfg.head_dim
        qkv = self.qkv(x, ln_fold)
        q = qkv[..., :cfg.hidden_dim]
        k = qkv[..., cfg.hidden_dim:cfg.hidden_dim + kv_dim]
        v = qkv[..., cfg.hidden_dim + kv_dim:]
        return (self._heads(q), self._heads(k, cfg.kv_heads),
                self._heads(v, cfg.kv_heads))

    def _expand_kv(self, t):
        """[B, kv_heads, T, hd] -> [B, H, T, hd]: each K/V head serves its
        group of consecutive query heads (no-op for standard MHA)."""
        g = self.cfg.num_attn_heads // self.cfg.kv_heads
        return t if g == 1 else jnp.repeat(t, g, axis=1)

    def __call__(self, x, mask, return_kv: bool = False,
                 prefix_length: Optional[int] = None, ln_fold=None):
        """``prefix_length`` set => the mask is the canonical
        prefix-bidirectional-causal one and the fused flash kernel may be
        used; ``mask`` is then only consulted by the jnp fallback."""
        cfg = self.cfg
        b, tq, _ = x.shape
        q, k, v = self._qkv(x, ln_fold)
        # attention math runs full-head (repeat is free vs the matmuls and
        # its gradient segment-sums back to the kv heads); the CACHE keeps
        # the compact kv-head tensors (return_kv below)
        ke, ve = self._expand_kv(k), self._expand_kv(v)
        impl = (resolve_attention_impl(cfg, tq)
                if prefix_length is not None else "jnp")
        if cfg.rudalle_relax:
            if impl != "jnp" and prefix_length is not None:
                ctx = rudalle_relax_attention_fused(q, ke, ve, prefix_length,
                                                    impl)
            else:
                ctx = rudalle_relax_attention(q, ke, ve, mask)
        elif impl != "jnp" and prefix_length is not None:
            ctx = prefix_causal_attention(q, ke, ve, prefix_length, impl=impl)
        else:
            ctx = pb_relax_attention(q, ke, ve, mask,
                                     alpha=cfg.pb_relax_alpha,
                                     pb_relax=cfg.cogview_pb_relax)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, tq, cfg.hidden_dim)
        if cfg.rudalle_relax:
            # context /= detached max (reference transformer.py:103-105)
            ctx = (ctx / _detached_max(ctx)).astype(_dt(cfg))
        out = self.out_proj(ctx)
        if return_kv:
            return out, (k, v)
        return out

    def decode(self, x, k_cache, v_cache, index):
        """x [B, 1, D]; caches in the TRANSPOSED decode layout
        [B, kv_heads, hd, total] (kv_heads == num_attn_heads unless GQA);
        index = write position.

        Attention over the cache is masked to positions <= index (the
        PB-relax max-shift cancels in softmax, so this IS the reference
        semantics).  Caches may be int8 ``QuantCache``s (per-position
        symmetric quantization, ``ops/quant.py``) — halves the cache HBM
        traffic that dominates large-batch decode — or a single
        ``PackedQuantCache`` (as ``k_cache``, with ``v_cache=None``):
        k‖v packed along lanes and written IN PLACE by the aliased Pallas
        RMW kernel (``ops/decode_cache.py``), which removes the
        whole-cache carry copy XLA makes for ``dynamic_update_slice``
        inside the sampler's scan."""
        from ..ops.decode_attention import decode_attention
        from ..ops.decode_cache import (PackedQuantCache,
                                        decode_attention_packed,
                                        update_packed_cache)
        from ..ops.quant import (QuantCache, decode_attention_int8,
                                 update_quant_cache)

        cfg = self.cfg
        b = x.shape[0]
        q, k_new, v_new = self._qkv(x)
        if cfg.rudalle_relax and isinstance(k_cache,
                                            (QuantCache, PackedQuantCache)):
            raise TypeError("rudalle_relax decode needs a float KV cache")
        # Grouped-query view: [B, H, 1, hd] -> [B, kv_heads, group, hd].
        # The cached attention einsums are generic over the q axis, so each
        # K/V head serves its `group` query rows in ONE pass over the cache
        # — this is where GQA's bandwidth saving lands (the cache, and the
        # read stream, shrink by the group factor).  group == 1 reproduces
        # the exact MHA shapes/layouts.
        group = cfg.num_attn_heads // cfg.kv_heads
        q = q.reshape(b, cfg.kv_heads, group, cfg.head_dim)
        gqa = group > 1
        # Query-row padding (read_floor finding, BASELINE round 4): the Q=1
        # batched matvec lowers to a pathological VPU kLoop fusion; padding
        # q with zero rows — same cache bytes, rows× the MACs — lets XLA
        # route the contraction onto the MXU (isolated: 471 → 258 µs/step
        # at serving geometry).  MEASURED END-TO-END LOSER: 7.36 img/s vs
        # 32.4 — the widened [B,H,rows,T] intermediates lose the scan's
        # read-fusion overlap (BASELINE round 4); kept as a tested
        # ablation.  Zero rows are numerically inert (softmax is per-row)
        # and sliced back off below.  Config validation restricts
        # decode_q_rows > 1 to the jnp 'lane' decode path.
        pad_rows = max(cfg.decode_q_rows, group) - group
        if pad_rows:
            q = jnp.concatenate(
                [q, jnp.zeros((b, cfg.kv_heads, pad_rows, cfg.head_dim),
                              q.dtype)], axis=2)
        # Write kernels (aliased RMW) follow the prefill attention impl
        # under 'auto'; the fused READ kernel never does — it is a measured
        # 6x end-to-end loser at serving geometry (batch-chunked DMA
        # variant: 4.99 img/s vs 32.3 on XLA's bf16 kLoop fusion, which
        # already runs at the VPU dequant+matvec floor).  Reads go pallas
        # only on explicit request (bench A/B, tests).
        read_impl = cfg.decode_attention_impl
        decode_impl = read_impl
        if decode_impl == "auto" and cfg.attention_impl in (
                "pallas", "pallas_interpret"):
            decode_impl = cfg.attention_impl

        def _write_impl() -> str:
            if decode_impl == "pallas_interpret":
                return "pallas_interpret"
            if decode_impl == "jnp" or jax.default_backend() != "tpu":
                return "jnp"
            return "pallas"

        if isinstance(k_cache, PackedQuantCache):
            cache = update_packed_cache(k_cache, k_new, v_new, index,
                                        impl=_write_impl())
            ctx = decode_attention_packed(q, cache, index)
            ctx = ctx.astype(q.dtype).transpose(0, 2, 1, 3).reshape(
                b, 1, cfg.hidden_dim)
            return self.out_proj(ctx), (cache, None)
        if isinstance(k_cache, QuantCache):
            if cfg.kv_cache_layout == "lane_aliased":
                from ..ops.decode_cache import update_quant_caches_aliased

                k_cache, v_cache = update_quant_caches_aliased(
                    k_cache, v_cache, k_new.transpose(0, 1, 3, 2),
                    v_new.transpose(0, 1, 3, 2), index, impl=_write_impl())
            else:
                k_cache = update_quant_cache(
                    k_cache, k_new.transpose(0, 1, 3, 2), index)
                v_cache = update_quant_cache(
                    v_cache, v_new.transpose(0, 1, 3, 2), index)
            impl = (read_impl if not gqa and not pad_rows and read_impl in
                    ("pallas", "pallas_interpret") else "jnp")
            ctx = decode_attention_int8(
                q, k_cache, v_cache, index, impl=impl,
                bucket_bounds=_length_buckets(
                    k_cache.q.shape[3], cfg.decode_length_buckets,
                    cfg.prefix_length))
            if pad_rows:
                ctx = ctx[:, :, :group]
            # [B, kv_heads, group, hd] flattens to head order h = kv*g + g'
            # — the same grouping the q reshape above used (identical to
            # the MHA transpose+reshape when group == 1)
            ctx = ctx.reshape(b, 1, cfg.hidden_dim)
            return self.out_proj(ctx), (k_cache, v_cache)
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k_new.transpose(0, 1, 3, 2).astype(k_cache.dtype),
            (0, 0, 0, index))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v_new.transpose(0, 1, 3, 2).astype(v_cache.dtype),
            (0, 0, 0, index))
        # MEASURED (v5e, T=640, B=16, H=16): the single-token Pallas kernel
        # loses to XLA's fused batched matmul here — its per-(b,h)
        # sequential grid of small DMAs can't beat one large read even
        # though it skips the invalid tail (1.8 vs 7.0 img/s end-to-end).
        # 'auto' therefore decodes via jnp; the kernel stays available as
        # an explicit impl for longer-cache regimes / future tuning.
        if cfg.rudalle_relax:
            ctx = _rudalle_decode_attention(q, k_cache, v_cache, index)
            ctx = ctx.reshape(b, 1, cfg.hidden_dim)
            ctx = (ctx / _detached_max(ctx)).astype(_dt(cfg))
            return self.out_proj(ctx), (k_cache, v_cache)
        impl = (decode_impl if not gqa and not pad_rows and decode_impl in
                ("pallas", "pallas_interpret") else "jnp")
        ctx = decode_attention(q, k_cache, v_cache, index, impl=impl)
        if pad_rows:
            ctx = ctx[:, :, :group]
        ctx = ctx.reshape(b, 1, cfg.hidden_dim)
        return self.out_proj(ctx), (k_cache, v_cache)

    def ring_decode(self, x, frozen_k, frozen_v, tail_k, tail_v, index,
                    tail_base: int):
        """Ring-tail decode step (see TransformerConfig.decode_ring_tail).

        ``frozen_*`` are int8 ``QuantCache``s [B, H, hd, Tf] holding
        positions [0, tail_base) — read-only here, so the sampler can keep
        them as scan invariants (no whole-cache carry copies).  ``tail_*``
        are compute-dtype [B, H, hd, ring] buffers for positions
        [tail_base, tail_base + ring); the new token's k/v lands there via
        a small-buffer DUS.  ``tail_base`` is static per scan segment.
        """
        import math as _math

        cfg = self.cfg
        b = x.shape[0]
        q, k_new, v_new = self._qkv(x)
        off = index - tail_base
        tail_k = jax.lax.dynamic_update_slice(
            tail_k, k_new.transpose(0, 1, 3, 2).astype(tail_k.dtype),
            (0, 0, 0, off))
        tail_v = jax.lax.dynamic_update_slice(
            tail_v, v_new.transpose(0, 1, 3, 2).astype(tail_v.dtype),
            (0, 0, 0, off))
        scale = 1.0 / _math.sqrt(cfg.head_dim)
        qf = (q * jnp.asarray(scale, q.dtype)).astype(jnp.float32)
        tf = frozen_k.q.shape[-1]
        s_f = jnp.einsum("bhqd,bhdk->bhqk", qf,
                         frozen_k.q.astype(jnp.float32),
                         preferred_element_type=jnp.float32) * frozen_k.scale
        kpos = jnp.arange(tf)
        s_f = jnp.where(kpos < tail_base, s_f, jnp.float32(-1e30))
        s_t = jnp.einsum("bhqd,bhdk->bhqk", qf,
                         tail_k.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        tpos = jnp.arange(tail_k.shape[-1])
        s_t = jnp.where(tpos <= off, s_t, jnp.float32(-1e30))
        p = jax.nn.softmax(jnp.concatenate([s_f, s_t], axis=-1), axis=-1)
        p_f = p[..., :tf] * frozen_v.scale
        p_t = p[..., tf:]
        ctx = (jnp.einsum("bhqk,bhdk->bhqd", p_f,
                          frozen_v.q.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
               + jnp.einsum("bhqk,bhdk->bhqd", p_t,
                            tail_v.astype(jnp.float32),
                            preferred_element_type=jnp.float32))
        ctx = ctx.astype(q.dtype).transpose(0, 2, 1, 3).reshape(
            b, 1, cfg.hidden_dim)
        return self.out_proj(ctx), (tail_k, tail_v)


def _detached_max(t, axis=None, keepdims=False):
    return jax.lax.stop_gradient(jnp.max(t, axis=axis, keepdims=keepdims))


def rudalle_relax_attention(q, k, v, mask):
    """ruDALL-E relaxed attention (reference transformer.py:48-55,93-97).

    scores = (q/sqrt(d)) @ (k^T/sigma) with sigma = std(k) (unbiased, whole
    tensor); shift each row by min(row_min + 65504, row_max)/2 (detached,
    computed BEFORE masking, reference order), divide by sigma again, mask
    to -65504, softmax; context = probs @ (v / max(v)).  The caller divides
    the merged context by its detached max (transformer.py:103-105).
    Returns ctx [B, H, T, hd] in fp32.
    """
    head_dim = q.shape[-1]
    d = jnp.sqrt(jnp.asarray(head_dim, jnp.float32))
    kf = k.astype(jnp.float32)
    sigma = jnp.std(kf, ddof=1)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32) / d,
                        kf / sigma, preferred_element_type=jnp.float32)
    smax = _detached_max(scores, axis=-1)
    smin = jax.lax.stop_gradient(jnp.min(scores, axis=-1)) + 65504.0
    shift = jnp.minimum(smin, smax)[..., None] / 2.0
    scores = (scores - shift) / sigma
    if mask.ndim == 2:
        mask = mask[None, None]
    scores = jnp.where(mask, scores, jnp.float32(-65504.0))
    probs = jax.nn.softmax(scores, axis=-1)
    vf = v.astype(jnp.float32)
    v_scale = _detached_max(vf)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, vf / v_scale,
                      preferred_element_type=jnp.float32)


def rudalle_relax_attention_fused(q, k, v, prefix_length: int,
                                  impl: str = "pallas"):
    """rudalle_relax through the fused flash kernel — exact distribution.

    The reference path (transformer.py:48-55,62): ``s = (q/sqrt(d)) @ (k/σ)ᵀ``,
    detached midpoint shift ``c`` per row, ``(s - c)/σ``, masked to -65504,
    softmax.  Since ``c`` is row-constant and ``σ`` a global positive scalar,
    ``softmax((s - c)/σ) = softmax(s/σ)`` over the valid positions, and
    ``exp(-65504 - rowmax)`` underflows to exactly 0 in fp32 — i.e. the
    distribution equals standard masked ``softmax(q·kᵀ/(sqrt(d)·σ²))``.
    Both σ factors therefore fold into the q operand and the v
    max-normalization into the v operand; the shift exists only to dodge
    torch fp16 overflow, which the kernel's fp32 running row-max replaces.
    Gradients: σ stays traced (the reference backprops through it); the
    v scale is detached (reference ``v.detach().max()``).
    Returns ctx [B, H, T, hd] fp32 = probs @ (v / max(v)).
    """
    kf = k.astype(jnp.float32)
    sigma = jnp.std(kf, ddof=1)
    v_scale = _detached_max(v.astype(jnp.float32))
    qs = (q.astype(jnp.float32) / (sigma * sigma)).astype(q.dtype)
    vs = (v.astype(jnp.float32) / v_scale).astype(v.dtype)
    return prefix_causal_attention(qs, k, vs, prefix_length,
                                   impl=impl).astype(jnp.float32)


def _rudalle_decode_attention(q, k_cache, v_cache, index):
    """Single-token rudalle-relaxed attention over a preallocated cache.

    Matches the reference *cached* semantics (transformer.py:82-97): the
    torch path concatenates only valid positions, so sigma/std, the row
    min/max shift and the v max are computed over positions <= ``index``
    — here realized as masked statistics over the padded [B, H, hd, total]
    cache.  q [B, H, 1, hd]; returns ctx [B, H, 1, hd] fp32.
    """
    b, h, hd, total = k_cache.shape
    head_dim = q.shape[-1]
    d = jnp.sqrt(jnp.asarray(head_dim, jnp.float32))
    valid = (jnp.arange(total) <= index)                      # [total]
    kf = k_cache.astype(jnp.float32)
    n = jnp.asarray(index + 1, jnp.float32) * (b * h * hd)
    mean = jnp.sum(jnp.where(valid, kf, 0.0)) / n
    var = jnp.sum(jnp.where(valid, (kf - mean) ** 2, 0.0)) / (n - 1.0)
    sigma = jnp.sqrt(var)
    scores = jnp.einsum("bhqd,bhdk->bhqk", q.astype(jnp.float32) / d,
                        kf / sigma, preferred_element_type=jnp.float32)
    big = jnp.float32(3.0e38)
    smax = jax.lax.stop_gradient(
        jnp.max(jnp.where(valid, scores, -big), axis=-1))
    smin = jax.lax.stop_gradient(
        jnp.min(jnp.where(valid, scores, big), axis=-1)) + 65504.0
    shift = jnp.minimum(smin, smax)[..., None] / 2.0
    scores = jnp.where(valid, (scores - shift) / sigma,
                       jnp.float32(-65504.0))
    probs = jax.nn.softmax(scores, axis=-1)
    vf = v_cache.astype(jnp.float32)
    v_scale = jax.lax.stop_gradient(jnp.max(jnp.where(valid, vf, -big)))
    return jnp.einsum("bhqk,bhdk->bhqd", probs, vf / v_scale,
                      preferred_element_type=jnp.float32)


def pb_relax_attention(q, k, v, mask, alpha: float = 32.0,
                       pb_relax: bool = True):
    """scores = (q/sqrt(d)) @ k^T, masked to -10000, PB-relax max-shift,
    softmax, @ v.  q,k,v: [B, H, T, hd]; fp32 score accumulation."""
    head_dim = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, jnp.float32))
    scores = jnp.einsum("bhqd,bhkd->bhqk", (q * scale.astype(q.dtype)), k,
                        preferred_element_type=jnp.float32)
    if mask.ndim == 2:
        mask = mask[None, None]
    scores = jnp.where(mask, scores, jnp.float32(-10000.0))
    if pb_relax:
        # (s/alpha - max(s/alpha)) * alpha; max over heads' full score block
        # (reference transformer.py:63-70). A per-(b,h) constant shift —
        # exactly cancelled by softmax, kept for bit-parity of the scores.
        s = scores / alpha
        m = jax.lax.stop_gradient(jnp.max(s, axis=(-2, -1), keepdims=True))
        scores = (s - m) * alpha
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


class MLP(nn.Module):
    """4x gelu MLP (reference transformer.py:118-139)."""

    cfg: TransformerConfig

    @nn.compact
    def __call__(self, x, ln_fold=None):
        dt = _dt(self.cfg)
        h = LNDense(4 * self.cfg.hidden_dim, kernel_init=_INIT, dtype=dt,
                    name="lin1")(x, ln_fold)
        h = _gelu(h)
        lin2 = nn.Dense(self.cfg.hidden_dim, kernel_init=_INIT, dtype=dt,
                        name="lin2")
        if self.cfg.rudalle_relax:
            # detached max-rescaling (reference transformer.py:133-136)
            scale = _detached_max(h) / 4.0
            y = lin2(h / scale)
            return (y / _detached_max(y, axis=-1, keepdims=True)) * scale
        return lin2(h)


class TransformerLayer(nn.Module):
    """Pre-LN block with CogView sandwich LayerNorm
    (reference transformer.py:142-210)."""

    cfg: TransformerConfig

    def setup(self):
        cfg = self.cfg
        ln = functools.partial(LayerNorm, impl=cfg.layernorm_impl)
        # ln_matmul_fold: ln_in / ln_out are folded into the qkv / mlp.lin1
        # matmuls (ops.norms.folded_ln_dense) — eager params so the fold
        # can read them without a call; identical param tree either way
        feats = cfg.hidden_dim if cfg.ln_matmul_fold else None
        self.ln_in = ln(name="ln_in", features=feats)
        self.ln_out = ln(name="ln_out", features=feats)
        if cfg.cogview_sandwich_layernorm:
            self.first_ln_sandwich = ln(name="first_ln_sandwich")
            self.second_ln_sandwich = ln(name="second_ln_sandwich")
        self.attn = SelfAttention(cfg, name="attn")
        mlp_cls = MLP
        if cfg.remat and cfg.remat_policy == "mlp":
            mlp_cls = nn.remat(MLP)
        self.mlp = mlp_cls(cfg, name="mlp")

    def _prescale(self, t):
        # CogView LayerNorm-prescale (reference transformer.py:177-178):
        # divide by the detached per-position max before ln_in, the first
        # sandwich LN and ln_out (NOT the second sandwich, :205-206)
        if self.cfg.cogview_layernorm_prescale:
            return t / _detached_max(t, axis=-1, keepdims=True)
        return t

    def _post_attn(self, x, a):
        if self.cfg.cogview_sandwich_layernorm:
            a = self.first_ln_sandwich(self._prescale(a))
        x = x + a
        t = self._prescale(x)
        if self.cfg.ln_matmul_fold:
            m = self.mlp(t, self.ln_out.fold_params())
        else:
            m = self.mlp(self.ln_out(t))
        if self.cfg.cogview_sandwich_layernorm:
            m = self.second_ln_sandwich(m)
        return x + m

    def __call__(self, x, mask, return_kv: bool = False,
                 prefix_length: Optional[int] = None):
        t = self._prescale(x)
        if self.cfg.ln_matmul_fold:
            h, fold = t, self.ln_in.fold_params()
        else:
            h, fold = self.ln_in(t), None
        if return_kv:
            a, kv = self.attn(h, mask, return_kv=True,
                              prefix_length=prefix_length, ln_fold=fold)
            return self._post_attn(x, a), kv
        return self._post_attn(
            x, self.attn(h, mask, prefix_length=prefix_length,
                         ln_fold=fold))

    def decode(self, x, k_cache, v_cache, index):
        a, (k_cache, v_cache) = self.attn.decode(
            self.ln_in(self._prescale(x)), k_cache, v_cache, index)
        return self._post_attn(x, a), (k_cache, v_cache)

    def ring_decode(self, x, frozen_k, frozen_v, tail_k, tail_v, index,
                    tail_base: int):
        a, tails = self.attn.ring_decode(
            self.ln_in(self._prescale(x)), frozen_k, frozen_v,
            tail_k, tail_v, index, tail_base)
        return self._post_attn(x, a), tails


class _ScanBlock(nn.Module):
    """One step of the stacked-layer sweep (``cfg.scan_layers``).

    Wraps ``TransformerLayer`` in the (carry, *broadcast) -> (carry, None)
    shape ``nn.scan`` requires.  ``prefix_length`` is baked as a module
    attribute (not a call argument) so it stays a Python static — it feeds
    the flash kernel's nondiff argnums and must never be traced through
    the scan.
    """

    cfg: TransformerConfig
    prefix_length: Optional[int] = None

    @nn.compact
    def __call__(self, x, mask):
        x = TransformerLayer(self.cfg, name="layer")(
            x, mask, False, self.prefix_length)
        return x, None


def stack_layer_params(params, num_layers: int):
    """Unrolled ``{'layer_0': .., 'layer_23': ..}`` param tree (the
    checkpoint/serving form) -> the ``cfg.scan_layers`` stacked form
    ``{'layers': {'layer': [L, ...] leaves}}``.  Lossless; inverse below.
    """
    p = dict(params)
    subs = [p.pop(f"layer_{i}") for i in range(num_layers)]
    p["layers"] = {"layer": jax.tree.map(
        lambda *xs: jnp.stack(xs, axis=0), *subs)}
    return p


def unstack_layer_params(params, num_layers: int):
    """Inverse of :func:`stack_layer_params` (stacked -> unrolled)."""
    p = dict(params)
    stacked = dict(p.pop("layers"))["layer"]
    for i in range(num_layers):
        p[f"layer_{i}"] = jax.tree.map(lambda x, i=i: x[i], stacked)
    return p


class MakeAScene(nn.Module):
    """Full model: embeddings + N layers + final LN + to_logits."""

    cfg: TransformerConfig

    def setup(self):
        cfg = self.cfg
        self.image_token_embedding = nn.Embed(
            cfg.image_vocab_size, cfg.hidden_dim, embedding_init=_INIT,
            dtype=_dt(cfg), name="image_token_embedding")
        self.seg_token_embedding = nn.Embed(
            cfg.seg_vocab_size, cfg.hidden_dim, embedding_init=_INIT,
            dtype=_dt(cfg), name="seg_token_embedding")
        self.text_token_embedding = nn.Embed(
            cfg.text_vocab_size, cfg.hidden_dim, embedding_init=_INIT,
            dtype=_dt(cfg), name="text_token_embedding")
        self.text_pos_embeddings = nn.Embed(
            cfg.text_length, cfg.hidden_dim, embedding_init=_INIT,
            dtype=_dt(cfg), name="text_pos_embeddings")
        self.seg_row_embeddings = nn.Embed(
            cfg.seg_tokens_per_dim, cfg.hidden_dim, embedding_init=_INIT,
            dtype=_dt(cfg), name="seg_row_embeddings")
        self.seg_col_embeddings = nn.Embed(
            cfg.seg_tokens_per_dim, cfg.hidden_dim, embedding_init=_INIT,
            dtype=_dt(cfg), name="seg_col_embeddings")
        self.image_row_embeddings = nn.Embed(
            cfg.image_tokens_per_dim, cfg.hidden_dim, embedding_init=_INIT,
            dtype=_dt(cfg), name="image_row_embeddings")
        self.image_col_embeddings = nn.Embed(
            cfg.image_tokens_per_dim, cfg.hidden_dim, embedding_init=_INIT,
            dtype=_dt(cfg), name="image_col_embeddings")
        if cfg.scan_layers:
            # one lax.scan over a stacked layer: the HLO carries ONE layer
            # body instead of num_layers clones (compile-time/-memory
            # lever — the param tree converts to/from the unrolled
            # checkpoint form via {stack,unstack}_layer_params)
            block = _ScanBlock
            if cfg.remat and cfg.remat_policy != "mlp":
                policy = (jax.checkpoint_policies.dots_saveable
                          if cfg.remat_policy == "dots" else None)
                # prevent_cse is safe (and faster) inside scan
                block = nn.remat(_ScanBlock, policy=policy,
                                 prevent_cse=False)
            self.layers = nn.scan(
                block,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast,),        # mask
                length=cfg.num_layers,
                metadata_params={nn.meta.PARTITION_NAME: "layers"},
            )(cfg, prefix_length=cfg.effective_prefix, name="layers")
        else:
            layer_cls = TransformerLayer
            if cfg.remat and cfg.remat_policy == "mlp":
                # selective remat: recompute only the MLP (its 4x-hidden
                # gelu activation is the single biggest saved tensor —
                # 184 MB/layer at the flagship 1408-token batch-16
                # geometry) and keep every attention residual
                # (benchmarks/train_profile.py measures the policies;
                # numbers in BASELINE.md)
                pass        # handled inside TransformerLayer.setup
            elif cfg.remat:
                # recompute each layer in the backward pass (reference has
                # no analog; TPU memory lever for the 1408-token geometry)
                # flax counts self as argnum 0: (3, 4) = return_kv,
                # prefix_length (both static; prefix_length feeds the
                # flash kernel's nondiff_argnums and must NOT be traced)
                policy = (jax.checkpoint_policies.dots_saveable
                          if cfg.remat_policy == "dots" else None)
                layer_cls = nn.remat(TransformerLayer,
                                     static_argnums=(3, 4),
                                     policy=policy)
            self.layers = [layer_cls(cfg, name=f"layer_{i}")
                           for i in range(cfg.num_layers)]
        self.final_ln = LayerNorm(name="final_ln", impl=cfg.layernorm_impl)
        self.logits_ln = LayerNorm(name="logits_ln", impl=cfg.layernorm_impl)
        self.logits_dense = nn.Dense(cfg.image_vocab_size, kernel_init=_INIT,
                                     dtype=_dt(cfg), name="logits_dense")

    # --- embedding assembly -------------------------------------------------

    def embed_text(self, text_tokens):
        cfg = self.cfg
        pos = jnp.arange(cfg.text_length)
        # pad-remap: token 0 at position p becomes vocab_size - text_len + p
        remap = pos + (cfg.text_vocab_size - cfg.text_length)
        toks = jnp.where(text_tokens == 0, remap[None, :], text_tokens)
        return self.text_token_embedding(toks) + self.text_pos_embeddings(pos)

    def embed_seg(self, seg_tokens):
        cfg = self.cfg
        pos = jnp.arange(seg_tokens.shape[-1])
        rows = pos // cfg.seg_tokens_per_dim
        cols = pos % cfg.seg_tokens_per_dim
        return (self.seg_token_embedding(seg_tokens)
                + self.seg_row_embeddings(rows)
                + self.seg_col_embeddings(cols))

    def embed_image(self, img_tokens, past_length: int | jax.Array = 0):
        cfg = self.cfg
        pos = jnp.arange(img_tokens.shape[-1]) + past_length
        rows = pos // cfg.image_tokens_per_dim
        cols = pos % cfg.image_tokens_per_dim
        return (self.image_token_embedding(img_tokens)
                + self.image_row_embeddings(rows)
                + self.image_col_embeddings(cols))

    def embed_prefix(self, text_tokens, seg_tokens):
        return jnp.concatenate(
            [self.embed_text(text_tokens), self.embed_seg(seg_tokens)], axis=1)

    # --- core stacks --------------------------------------------------------

    def _final_ln(self, x):
        if self.cfg.rudalle_relax:
            # reference Transformer.forward:267-268 prescales the final LN
            x = x / _detached_max(x, axis=-1, keepdims=True)
        return self.final_ln(x)

    def backbone(self, x, mask, prefix_length: Optional[int] = None):
        if self.cfg.scan_layers:
            if prefix_length != self.cfg.effective_prefix:
                raise ValueError(
                    "scan_layers bakes prefix_length=cfg.effective_prefix "
                    f"({self.cfg.effective_prefix}) into the scanned stack; "
                    f"got {prefix_length}")
            x, _ = self.layers(x, mask)
            return self._final_ln(x)
        for layer in self.layers:
            # positional args so nn.remat's static_argnums line up
            x = layer(x, mask, False, prefix_length)
        return self._final_ln(x)

    def to_logits(self, x):
        return self.logits_dense(self.logits_ln(x)).astype(jnp.float32)

    def __call__(self, text_tokens, seg_tokens, img_tokens):
        """Training forward -> logits [B, image_length, image_vocab_size]."""
        cfg = self.cfg
        emb = jnp.concatenate(
            [self.embed_prefix(text_tokens, seg_tokens),
             self.embed_image(img_tokens)], axis=1)
        t = emb.shape[1]
        if resolve_attention_impl(cfg, t) == "jnp":
            pos = jnp.arange(t)
            mask = prefix_causal_mask(pos, pos, cfg.effective_prefix)
        else:
            mask = None     # fused kernel derives the mask from indices
        h = self.backbone(emb, mask, prefix_length=cfg.effective_prefix)
        # predictions for image positions: shift by one (transformer.py:378).
        # Slice BEFORE the vocab projection: to_logits is position-wise, so
        # projecting the prefix positions just to discard them would waste
        # ~27% of the largest matmul (T x 1024 x 8192) fwd+bwd and ~200 MB
        # of fp32 logits at the flagship geometry.
        return self.to_logits(h[:, -cfg.image_length - 1:-1, :])

    # --- cached decode (used by sampler) ------------------------------------

    def prefill(self, text_tokens, seg_tokens):
        """Run the text+seg prefix, return (logits [B, vocab] for the first
        image token, caches) with caches a per-layer tuple of
        (k, v) [B, H, prefix, hd].

        Per-layer tuples (not one stacked [L, ...] array) let each decode
        step update only its layer's buffer via ``dynamic_update_slice`` —
        XLA keeps the updates in place inside the sampler's ``lax.scan``
        instead of recopying the whole cache every token.

        The prefix attends bidirectionally to itself (the prefix block of the
        mask is all-ones, reference transformer.py:369), so the prefill mask
        is trivially all-true.
        """
        cfg = self.cfg
        if cfg.scan_layers:
            # the decode path's in-place cache aliasing is per-layer-buffer
            # load-bearing (BASELINE round 3); serve with the unrolled
            # graph: unstack_layer_params + cfg.replace(scan_layers=False)
            raise ValueError(
                "prefill/decode use the unrolled layer graph; scan_layers "
                "is a training-path option (convert params with "
                "unstack_layer_params)")
        emb = self.embed_prefix(text_tokens, seg_tokens)
        eff = cfg.effective_prefix
        if resolve_attention_impl(cfg, cfg.prefix_length) == "jnp":
            pos = jnp.arange(cfg.prefix_length)
            # bidirectional default: all-visible; reference-faithful mode:
            # causal over the prefix too (the tril multiply reaches it)
            mask = prefix_causal_mask(pos, pos, eff)
        else:
            mask = None   # fused kernel derives the mask from indices
        caches = []
        x = emb
        for layer in self.layers:
            x, kv = layer(x, mask, True, eff)
            caches.append(kv)
        h = self._final_ln(x[:, -1:, :])
        logits = self.to_logits(h)[:, 0]
        return logits, tuple(caches)

    def decode_step(self, img_token, step, caches):
        """One cached decode step.

        img_token [B, 1] (the token generated at image position ``step``);
        ``caches`` is a per-layer tuple of (k, v) in the TRANSPOSED decode
        layout [B, H, hd, total] already holding prefix + ``step`` image
        tokens.  Writes this token's k/v at index prefix+step, attends
        (masked to <= index), and returns (logits [B, vocab] for position
        step+1, new caches).
        """
        cfg = self.cfg
        index = cfg.prefix_length + step
        x = self.embed_image(img_token, past_length=step)
        new_caches = []
        for layer, (k, v) in zip(self.layers, caches):
            x, kv = layer.decode(x, k, v, index)
            new_caches.append(kv)
        h = self._final_ln(x)
        logits = self.to_logits(h)[:, 0]
        return logits, tuple(new_caches)

    def ring_decode_step(self, img_token, step, frozen, tails,
                         tail_base: int):
        """Ring-tail cached decode step (decode_ring_tail serving mode).

        ``frozen``: per-layer ((k QuantCache, v QuantCache)) — read-only;
        ``tails``: per-layer (tail_k, tail_v) compute-dtype buffers;
        ``tail_base``: static base position of the tail window.
        Returns (logits [B, vocab], new tails).
        """
        cfg = self.cfg
        index = cfg.prefix_length + step
        x = self.embed_image(img_token, past_length=step)
        new_tails = []
        for layer, (fk, fv), (tk, tv) in zip(self.layers, frozen, tails):
            x, tkv = layer.ring_decode(x, fk, fv, tk, tv, index, tail_base)
            new_tails.append(tkv)
        h = self._final_ln(x)
        logits = self.to_logits(h)[:, 0]
        return logits, tuple(new_tails)
