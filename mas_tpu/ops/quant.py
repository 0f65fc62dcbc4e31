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

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


class QuantCache(NamedTuple):
    """One tensor's quantized decode cache."""

    q: jax.Array        # int8 [B, H, d, T]
    scale: jax.Array    # fp32 [B, H, 1, T]


def quantize_kv(kv_t: jax.Array, eps: float = 1e-8,
                dtype=jnp.int8, scale_dtype=jnp.float32) -> QuantCache:
    """[B, H, d, T] float -> int8/int4 cache + per-position scales.

    int4 (qmax 7) halves the cache read traffic again vs int8 — the decode
    step's dominant HBM stream — at ~2 bits less precision per value;
    offered as an opt-in serving mode (quality measured in BASELINE.md).
    NOTE: int4 arrays cannot cross a jit boundary on the axon backend
    (device_put recursion bug) — the sampler creates/consumes them inside
    one jit, which is fine.

    ``scale_dtype=bfloat16`` stores the per-position scales in 2 bytes
    instead of 4 — the scale stream is 12.5% of the int4 cache read at
    d=64, so this trims ~6% off decode's dominant HBM stream for ≤0.4%
    extra scale rounding error (values are quantized against the ROUNDED
    stored scale, so the int grid stays consistent).
    """
    qmax = 7.0 if dtype == jnp.int4 else 127.0
    f = kv_t.astype(jnp.float32)
    amax = jnp.max(jnp.abs(f), axis=2, keepdims=True)          # [B,H,1,T]
    scale = (jnp.maximum(amax, eps) / qmax).astype(scale_dtype)
    q = jnp.clip(jnp.round(f / scale.astype(jnp.float32)),
                 -qmax, qmax).astype(dtype)
    return QuantCache(q=q, scale=scale)


def dequantize_kv(cache: QuantCache) -> jax.Array:
    return cache.q.astype(jnp.float32) * cache.scale.astype(jnp.float32)


def update_quant_cache(cache: QuantCache, new_t: jax.Array,
                       index) -> QuantCache:
    """Write one new position (``new_t`` [B, H, d, 1]) at ``index``.

    Stays on ``dynamic_update_slice`` deliberately.  MEASURED (v5e, B=128,
    H=16, d=64, T=640): in an ISOLATED single-cache scan a lane-mask
    ``where`` select beats DUS 0.58 vs 0.94 ms/step/layer — but in the
    REAL 24-layer sampler (48 carried cache buffers) the select variant
    collapsed to 14.2 img/s vs 24.6 (and a 590 s compile): XLA loses
    in-place carry aliasing and copies caches wholesale.  Microbenchmarks
    do not transfer here; only end-to-end bench.py numbers decide.
    """
    qc = quantize_kv(new_t, dtype=cache.q.dtype,
                     scale_dtype=cache.scale.dtype)
    return QuantCache(
        q=jax.lax.dynamic_update_slice(cache.q, qc.q, (0, 0, 0, index)),
        scale=jax.lax.dynamic_update_slice(cache.scale, qc.scale,
                                           (0, 0, 0, index)))


def decode_attention_int8(q, k_cache: QuantCache, v_cache: QuantCache,
                          index, impl: str = "jnp",
                          bucket_bounds: tuple = ()):
    """Single-token attention over int8 caches, masked to <= index.

    q [B, H, Q, d] float; returns [B, H, Q, d] in q's dtype.  Q is 1 for
    standard MHA decode; grouped-query callers pass q reshaped to
    [B, kv_heads, group, d] against [B, kv_heads, d, T] caches — the
    einsums are generic over the Q axis (jnp path only; the Pallas kernel
    assumes Q == 1).

    impl='jnp' (default): XLA path — int8 operands enter the einsums
    directly (cast fused into the load), scales fold in outside the
    contractions; reads the ENTIRE padded cache.
    impl='pallas'/'pallas_interpret': fused HBM kernel that DMAs only
    ``ceil((index+1)/128)`` cache blocks (skipping the invalid tail),
    folds both scales and the softmax into one pass.

    ``bucket_bounds`` (static ascending lengths, last == T): wrap the jnp
    path in a ``lax.switch`` over cache PREFIX slices — branch i reads
    only ``[..., :bounds[i]]``, the smallest bucket covering ``index``.
    MEASURED LOSER end-to-end (BASELINE.md round 3: 6.96 vs 32.06 img/s,
    256²/batch 64/int4): the switch branches break the scan carry's
    in-place aliasing and the caches get copied per step — the ~10%
    dead-tail read saving never shows up.  Kept as a tested ablation;
    ``decode_length_buckets`` defaults to 1 (off).
    """
    if (impl in ("pallas", "pallas_interpret")
            and k_cache.q.dtype in (jnp.int8, jnp.int4)
            and k_cache.scale.dtype == jnp.float32
            and k_cache.q.shape[3] % _INT8_DECODE_BLOCK == 0):
        # jnp fallback only for cache lengths that don't tile the 128-lane
        # DMA block (tiny test geometries)
        return _decode_attention_int8_pallas(
            q, k_cache.q, k_cache.scale, v_cache.q, v_cache.scale, index,
            interpret=(impl == "pallas_interpret"))
    if len(bucket_bounds) > 1:
        t = k_cache.q.shape[3]
        assert bucket_bounds[-1] == t and tuple(
            sorted(set(bucket_bounds))) == tuple(bucket_bounds), bucket_bounds

        def make_branch(bound):
            def branch():
                return _decode_attention_int8_jnp(
                    q,
                    QuantCache(k_cache.q[..., :bound],
                               k_cache.scale[..., :bound]),
                    QuantCache(v_cache.q[..., :bound],
                               v_cache.scale[..., :bound]),
                    index)
            return branch

        valid = jnp.asarray(index, jnp.int32) + 1
        seg = sum((valid > b).astype(jnp.int32)
                  for b in bucket_bounds[:-1])
        return jax.lax.switch(seg, [make_branch(b) for b in bucket_bounds])
    return _decode_attention_int8_jnp(q, k_cache, v_cache, index)


def _decode_attention_int8_jnp(q, k_cache: QuantCache,
                               v_cache: QuantCache, index):
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    # XLA lowers these batched matvecs as VPU kLoop fusions (trace-verified,
    # benchmarks/decode_trace.py) — bf16 operands when serving in bf16 cut
    # the dominant VPU multiply/convert work (accumulation stays fp32 via
    # preferred_element_type); fp32 callers (tests/parity) keep fp32.
    cd = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
    # s[b,h,1,t] = (q . k_q[:, t]) * ks[t]
    s = jnp.einsum("bhqd,bhdk->bhqk",
                   (q * jnp.asarray(scale, q.dtype)).astype(cd),
                   k_cache.q.astype(cd),
                   preferred_element_type=jnp.float32)
    # scales are [B, H, 1, T] — shape-aligned with s [B, H, 1(q), T]
    # (upcast: they may be stored bf16 — kv_scale_dtype)
    s = s * k_cache.scale.astype(jnp.float32)
    kpos = jnp.arange(k_cache.q.shape[3])
    s = jnp.where((kpos <= index)[None, None, None, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    # fold the v scales into the probabilities, then quantized PV matmul
    pv = p * v_cache.scale.astype(jnp.float32)
    out = jnp.einsum("bhqk,bhdk->bhqd", pv.astype(cd),
                     v_cache.q.astype(cd),
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# fused Pallas kernel: int8 cache blocks + scales + softmax in one pass
# ---------------------------------------------------------------------------

_INT8_DECODE_BLOCK = 128


def _int8_decode_kernel(idx_ref, q_ref, kq_hbm, ks_hbm, vq_hbm, vs_hbm,
                        o_ref, k_buf, ks_buf, v_buf, vs_buf, sems, *,
                        bc, blk, scale):
    """Grid = (batch // bc,).  Per step: DMA one [bc, H, d, blk] quantized
    block of k and v plus their [bc, H, 1, blk] fp32 scales
    (double-buffered), compute the flash-style masked softmax update with
    the scales folded in.  Only ``ceil(valid / blk)`` blocks move — the
    invalid tail is never read (the jnp path reads the full padded cache
    every token).  ``bc`` batch rows per DMA lift the copies from the
    round-1 128 KB (which ran far below HBM bandwidth) to ~0.5-2 MB.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    valid = idx_ref[0] + 1
    nblk = pl.cdiv(valid, blk)
    q = q_ref[...].astype(jnp.float32) * scale               # [bc, H, d]

    def transfers(j, slot):
        bsl = pl.ds(i * bc, bc)
        sl = pl.ds(j * blk, blk)
        return (
            pltpu.make_async_copy(kq_hbm.at[bsl, :, :, sl], k_buf.at[slot],
                                  sems.at[slot, 0]),
            pltpu.make_async_copy(ks_hbm.at[bsl, :, :, sl], ks_buf.at[slot],
                                  sems.at[slot, 1]),
            pltpu.make_async_copy(vq_hbm.at[bsl, :, :, sl], v_buf.at[slot],
                                  sems.at[slot, 2]),
            pltpu.make_async_copy(vs_hbm.at[bsl, :, :, sl], vs_buf.at[slot],
                                  sems.at[slot, 3]),
        )

    for t in transfers(0, 0):
        t.start()

    def body(j, carry):
        m, l, acc = carry
        slot = jax.lax.rem(j, 2)
        for t in transfers(j, slot):
            t.wait()

        @pl.when(j + 1 < nblk)
        def _():
            for t in transfers(j + 1, jax.lax.rem(j + 1, 2)):
                t.start()

        k = k_buf[slot].astype(jnp.float32)              # [bc, H, d, blk]
        ks = ks_buf[slot][:, :, 0, :]                    # [bc, H, blk]
        # batched matvec on the VPU (Mosaic rejects batched dot_general);
        # s[b, h, t] = (q[b, h, :] . k_q[b, h, :, t]) * ks[b, h, t]
        s = jnp.sum(q[:, :, :, None] * k, axis=2) * ks   # [bc, H, blk]
        h = q.shape[1]
        kpos = j * blk + jax.lax.broadcasted_iota(
            jnp.int32, (bc, h, blk), 2)
        s = jnp.where(kpos < valid, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=2, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=2, keepdims=True)
        # fold the v scales into the probs, then accumulate
        pv = p * vs_buf[slot][:, :, 0, :]                # [bc, H, blk]
        acc = acc * alpha + jnp.sum(
            pv[:, :, None, :] * v_buf[slot].astype(jnp.float32), axis=3)
        return m_new, l, acc

    h, d = q_ref.shape[1], q_ref.shape[2]
    m0 = jnp.full((bc, h, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bc, h, 1), jnp.float32)
    acc0 = jnp.zeros((bc, h, d), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, nblk, body, (m0, l0, acc0))
    o_ref[...] = (acc / l).astype(o_ref.dtype)


def _decode_bc(b: int, h: int, d: int, blk: int, itemsize: float) -> int:
    """Largest power-of-2 batch chunk dividing b keeping VMEM in budget.

    Counts the double-buffered k+v value blocks (itemsize bytes/elem) PLUS
    the fp32 [bc, h, d, blk] broadcast-multiply intermediates of the VPU
    matvec (measured: an int4 bc=32 config compiled to a 17 MB scoped
    stack and died on the 16 MB VMEM limit)."""
    per_bc = h * d * blk * (2 * 2 * itemsize + 2 * 4)
    bc = 1
    while (bc * 2 <= b and b % (bc * 2) == 0
           and (bc * 2) * per_bc <= 11 * 1024 * 1024):
        bc *= 2
    return bc


@functools.partial(jax.jit, static_argnames=("blk", "interpret"))
def _decode_attention_int8_pallas(q, kq, ks, vq, vs, index,
                                  blk: int = _INT8_DECODE_BLOCK,
                                  interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, _, d = q.shape
    t = kq.shape[3]
    assert t % blk == 0, (t, blk)
    qf = q.reshape(b, h, d)
    scale = 1.0 / math.sqrt(d)
    idx = jnp.asarray(index, jnp.int32).reshape(1)
    itemsize = 0.5 if kq.dtype == jnp.int4 else 1.0
    bc = _decode_bc(b, h, d, blk, itemsize)

    kernel = functools.partial(_int8_decode_kernel, bc=bc, blk=blk,
                               scale=scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bc,),
        in_specs=[
            pl.BlockSpec((bc, h, d), lambda i, idx_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),   # k int8/int4
            pl.BlockSpec(memory_space=pltpu.HBM),   # k scales
            pl.BlockSpec(memory_space=pltpu.HBM),   # v int8/int4
            pl.BlockSpec(memory_space=pltpu.HBM),   # v scales
        ],
        out_specs=pl.BlockSpec((bc, h, d), lambda i, idx_ref: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, bc, h, d, blk), kq.dtype),
            pltpu.VMEM((2, bc, h, 1, blk), jnp.float32),
            pltpu.VMEM((2, bc, h, d, blk), vq.dtype),
            pltpu.VMEM((2, bc, h, 1, blk), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t * d, transcendentals=b * h * t,
            bytes_accessed=2 * b * h * t * (d + 4)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(idx, qf, kq, ks, vq, vs)
    return out.reshape(b, h, 1, d)
