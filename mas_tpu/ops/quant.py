"""int8 KV-cache quantization for AR decode.

At the throughput-optimal sampling batch (64 + CFG doubling) the decode
step's HBM traffic is dominated by the KV-cache reads (~8 GB/token-step at
the 256² geometry, vs ~0.7 GB of weights) — see BASELINE.md.  Storing the
caches as int8 with per-position scales halves that traffic.

Scheme: symmetric per-(batch, head, position) quantization over the d
feature dim — the finest granularity that keeps the scales out of the
matmuls:

  k_q[b,h,:,t] = round(k[b,h,:,t] / ks[b,h,t]),  ks = max|k| / 127
  s[q,t]   = (q · k_q[:,t]) * ks[t]          (scale folds in AFTER the dot)
  out      = Σ_t p[t] * v[t] = Σ_t (p[t] * vs[t]) * v_q[:,t]
                                              (scale folds into the probs)

so the matmuls consume int8 operands (cast in registers — XLA fuses the
convert into the operand load, HBM reads stay 1 byte/elem).

Caches use the TRANSPOSED decode layout [B, H, d, T] (see
``decode_attention``); scales are [B, H, 1, T] fp32 (lane-aligned with T).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


class QuantCache(NamedTuple):
    """One tensor's quantized decode cache."""

    q: jax.Array        # int8 [B, H, d, T]
    scale: jax.Array    # fp32 [B, H, 1, T]


def quantize_kv(kv_t: jax.Array, eps: float = 1e-8) -> QuantCache:
    """[B, H, d, T] float -> int8 cache + per-position scales."""
    f = kv_t.astype(jnp.float32)
    amax = jnp.max(jnp.abs(f), axis=2, keepdims=True)          # [B,H,1,T]
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(f / scale), -127, 127).astype(jnp.int8)
    return QuantCache(q=q, scale=scale)


def dequantize_kv(cache: QuantCache) -> jax.Array:
    return cache.q.astype(jnp.float32) * cache.scale


def update_quant_cache(cache: QuantCache, new_t: jax.Array,
                       index) -> QuantCache:
    """Write one new position (``new_t`` [B, H, d, 1]) at ``index``."""
    qc = quantize_kv(new_t)
    return QuantCache(
        q=jax.lax.dynamic_update_slice(cache.q, qc.q, (0, 0, 0, index)),
        scale=jax.lax.dynamic_update_slice(cache.scale, qc.scale,
                                           (0, 0, 0, index)))


def decode_attention_int8(q, k_cache: QuantCache, v_cache: QuantCache,
                          index):
    """Single-token attention over int8 caches, masked to <= index.

    q [B, H, 1, d] float; returns [B, H, 1, d] in q's dtype.  The int8
    operands enter the einsums directly (cast fused into the load); scales
    fold in outside the contractions.
    """
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    # s[b,h,1,t] = (q . k_q[:, t]) * ks[t]
    s = jnp.einsum("bhqd,bhdk->bhqk",
                   (q * jnp.asarray(scale, q.dtype)).astype(jnp.float32),
                   k_cache.q.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    # scales are [B, H, 1, T] — shape-aligned with s [B, H, 1(q), T]
    s = s * k_cache.scale
    kpos = jnp.arange(k_cache.q.shape[3])
    s = jnp.where((kpos <= index)[None, None, None, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    # fold the v scales into the probabilities, then int8 PV matmul
    pv = p * v_cache.scale
    out = jnp.einsum("bhqk,bhdk->bhqd", pv,
                     v_cache.q.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)
