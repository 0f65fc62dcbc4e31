"""Aliased in-place KV-cache writes for AR decode (round-2/3 ablations).

POSTMORTEM: the round-2 isolated ablation attributed +0.41 ms/layer-token
to a DUS "whole-cache carry copy"; round-3 trace attribution over the
REAL sampler (``benchmarks/decode_trace.py``, BASELINE.md round 3) shows
XLA in-places the DUS writes — ALL carry copies together are 5.5% of
token time, and both aliased write kernels below LOSE end-to-end
(lane_aliased 10.1, packed 8.8 vs 31.9 img/s): the strided RMW DMAs are
latency-bound.  Kept as measured, tested ablations; the shipped default
is the plain 'lane' DUS layout.

Layout is dictated by TPU HBM tiling: arrays are (8, 128)-tiled on the
last two dims, DMA slices must be 8-aligned in sublanes / 128-aligned in
lanes, and a [B, H, T, d=64] cache would PAD 64 -> 128 lanes (2x HBM).
Hence the **packed cache**: k and v of one layer share one dense
``[B, H, T, 2d]`` buffer (2d = 128 lanes exactly at the reference head
dim), and one token's write is a read-modify-write of the 8-sublane-row
block containing ``index`` (~4 MB round trip at B=128 vs the ~170 MB
carry copy).  Per-position scales live in ``[2, B, H, T]`` fp32 (k=0,
v=1; positions in lanes) and RMW their 128-lane block the same way.  One
kernel updates values + scales with ``input_output_aliases`` pinning both
cache buffers in place.

The attention read stays jnp (``decode_attention_packed``): XLA overlaps
the full-cache einsum with the adjacent qkv/mlp matmuls inside the scan,
which opaque kernel boundaries would forfeit (measured in round 1: the
fused pallas decode read lost 7.1 -> 1.8 img/s end-to-end).

Reference semantics: ``/root/reference/models/transformer.py:73-115``
(concat-grown fp16 cache, full masked softmax per step).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_NEG_INF = -1e30
_SCALE_BLK = 128


def _row_blk(dtype) -> int:
    """HBM sublane tile for the value cache: Mosaic requires DMA slices
    along the second-minor dim to be tile-aligned — measured tilings on
    v5e: int8 (8, 128), int4 (64, 128)."""
    return 64 if dtype == jnp.int4 else 8


class PackedQuantCache(NamedTuple):
    """One layer's quantized k+v decode cache, packed along lanes."""

    kv: jax.Array       # int8/int4 [B, H, T, 2d]; [..., :d]=k, [..., d:]=v
    scale: jax.Array    # fp32 [2, B, H, T]; [0]=k scales, [1]=v scales

    @property
    def head_dim(self) -> int:
        return self.kv.shape[-1] // 2


def _quantize(f: jax.Array, axis, eps: float, dtype):
    qmax = 7.0 if dtype == jnp.int4 else 127.0
    amax = jnp.max(jnp.abs(f), axis=axis)
    scale = jnp.maximum(amax, eps) / qmax
    q = jnp.clip(jnp.round(f / jnp.expand_dims(scale, axis)),
                 -qmax, qmax).astype(dtype)
    return q, scale


def pack_quantize(k: jax.Array, v: jax.Array, eps: float = 1e-8,
                  dtype=jnp.int8) -> PackedQuantCache:
    """k, v [B, H, T, d] float -> packed quantized cache."""
    kq, ks = _quantize(k.astype(jnp.float32), 3, eps, dtype)
    vq, vs = _quantize(v.astype(jnp.float32), 3, eps, dtype)
    return PackedQuantCache(
        kv=jnp.concatenate([kq, vq], axis=-1),
        scale=jnp.stack([ks, vs], axis=0))


def quantize_token_packed(k_new: jax.Array, v_new: jax.Array,
                          eps: float = 1e-8,
                          dtype=jnp.int8) -> Tuple[jax.Array, jax.Array]:
    """One token's k/v [B, H, 1, d] -> (vals [B, H, 2d], scales [2, B, H])."""
    kq, ks = _quantize(k_new.astype(jnp.float32)[:, :, 0, :], 2, eps, dtype)
    vq, vs = _quantize(v_new.astype(jnp.float32)[:, :, 0, :], 2, eps, dtype)
    return (jnp.concatenate([kq, vq], axis=-1),
            jnp.stack([ks, vs], axis=0))


def seed_packed_cache(k: jax.Array, v: jax.Array, total: int,
                      dtype=jnp.int8) -> PackedQuantCache:
    """Prefill k/v [B, H, prefix, d] float -> a ``total``-length packed
    cache with the prefix quantized in place and a zeroed tail (scales 1.0
    on unwritten positions — attention masks them out anyway)."""
    b, h, prefix, d = k.shape
    cache = pack_quantize(k, v, dtype=dtype)
    kv = jnp.zeros((b, h, total, 2 * d), dtype)
    sc = jnp.ones((2, b, h, total), jnp.float32)
    return PackedQuantCache(
        jax.lax.dynamic_update_slice(kv, cache.kv, (0, 0, 0, 0)),
        jax.lax.dynamic_update_slice(sc, cache.scale, (0, 0, 0, 0)))


# ---------------------------------------------------------------------------
# the aliased write kernel
# ---------------------------------------------------------------------------

def _write_kernel(idx_ref, vals_new, scales_new, kv_hbm, sc_hbm,
                  kv_out, sc_out, vals_blk, sc_blk, sems):
    """RMW the value row-block + 128-lane scale block holding ``index``.

    Grid over batch chunks keeps the row-block VMEM footprint bounded
    (int4 tiles are 64 sublanes tall — a full-batch block would blow the
    16 MB VMEM).  The cache inputs are aliased to the outputs; only the
    small blocks move through VMEM — everything else stays in place.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    bc = vals_blk.shape[0]                       # batch chunk
    idx = idx_ref[0]
    row_blk = vals_blk.shape[2]
    row_base = (idx // row_blk) * row_blk
    row = idx - row_base
    sc_base = (idx // _SCALE_BLK) * _SCALE_BLK
    lane = idx - sc_base

    vals_in = pltpu.make_async_copy(
        kv_out.at[pl.ds(i * bc, bc), :, pl.ds(row_base, row_blk), :],
        vals_blk, sems.at[0])
    vals_in.start()

    # scales: full-batch RMW once, on the first grid step
    @pl.when(i == 0)
    def _():
        sc_in = pltpu.make_async_copy(
            sc_out.at[:, :, :, pl.ds(sc_base, _SCALE_BLK)], sc_blk,
            sems.at[1])
        sc_in.start()
        sc_in.wait()
        b2, bb, h2 = scales_new.shape
        lanes = jax.lax.broadcasted_iota(
            jnp.int32, (2, bb, h2, _SCALE_BLK), 3)
        sc_blk[:] = jnp.where(lanes == lane, scales_new[:][..., None],
                              sc_blk[:])
        sc_back = pltpu.make_async_copy(
            sc_blk, sc_out.at[:, :, :, pl.ds(sc_base, _SCALE_BLK)],
            sems.at[1])
        sc_back.start()
        sc_back.wait()

    vals_in.wait()
    h, d2 = vals_new.shape[1], vals_new.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (bc, h, row_blk, d2), 2)
    new_c = vals_new[pl.ds(i * bc, bc)]
    if vals_blk.dtype == jnp.int4:
        # Mosaic cannot shape-cast int4 vectors; select in int8 space
        sel = jnp.where(rows == row,
                        new_c.astype(jnp.int8)[:, :, None, :],
                        vals_blk[:].astype(jnp.int8))
        vals_blk[:] = sel.astype(jnp.int4)
    else:
        vals_blk[:] = jnp.where(rows == row, new_c[:, :, None, :],
                                vals_blk[:])
    vals_back = pltpu.make_async_copy(
        vals_blk, kv_out.at[pl.ds(i * bc, bc), :,
                            pl.ds(row_base, row_blk), :], sems.at[0])
    vals_back.start()
    vals_back.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cache_write_pallas(kv, sc, vals_new, scales_new, index,
                        interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, t, d2 = kv.shape
    assert t % _SCALE_BLK == 0, (t, _SCALE_BLK)
    rblk = _row_blk(kv.dtype)
    idx = jnp.asarray(index, jnp.int32).reshape(1)

    # batch-chunk the grid so the row-block scratch stays ~2 MB
    bc = b
    while bc * h * rblk * d2 * (0.5 if kv.dtype == jnp.int4 else
                                kv.dtype.itemsize) > 2 * 1024 * 1024:
        assert bc % 2 == 0, (b, h, rblk, d2)
        bc //= 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bc,),
        in_specs=[
            pl.BlockSpec((b, h, d2), lambda i, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),     # vals_new [B,H,2d]
            pl.BlockSpec((2, b, h), lambda i, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),     # scales_new [2,B,H]
            pl.BlockSpec(memory_space=pltpu.HBM),      # kv cache (aliased)
            pl.BlockSpec(memory_space=pltpu.HBM),      # scale cache (aliased)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((bc, h, rblk, d2), kv.dtype),
            pltpu.VMEM((2, b, h, _SCALE_BLK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # input indices count the scalar-prefetch arg: idx=0, vals_new=1,
    # scales_new=2, kv cache=3 -> out 0, scale cache=4 -> out 1
    return pl.pallas_call(
        _write_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(kv.shape, kv.dtype),
            jax.ShapeDtypeStruct(sc.shape, sc.dtype),
        ],
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(idx, vals_new, scales_new, kv, sc)


def update_packed_cache(cache: PackedQuantCache, k_new: jax.Array,
                        v_new: jax.Array, index,
                        impl: str = "pallas") -> PackedQuantCache:
    """Write one token's k/v ([B, H, 1, d] float) at ``index``, in place.

    impl='pallas': the aliased kernel (TPU).  impl='jnp': functional
    dynamic_update_slice fallback (CPU/tests) — correctness-equal, but
    carries the whole-cache copy cost inside scans.
    """
    dtype = cache.kv.dtype
    vals_new, scales_new = quantize_token_packed(k_new, v_new, dtype=dtype)
    if impl in ("pallas", "pallas_interpret"):
        kv, sc = _cache_write_pallas(
            cache.kv, cache.scale, vals_new, scales_new, index,
            interpret=(impl == "pallas_interpret"))
        return PackedQuantCache(kv, sc)
    idx = jnp.asarray(index, jnp.int32)
    z = jnp.zeros((), jnp.int32)
    return PackedQuantCache(
        jax.lax.dynamic_update_slice(
            cache.kv, vals_new[:, :, None, :], (z, z, idx, z)),
        jax.lax.dynamic_update_slice(
            cache.scale, scales_new[..., None], (z, z, z, idx)))


# ---------------------------------------------------------------------------
# aliased write for the LANE layout ([B, H, d, T], ops/quant.QuantCache)
# ---------------------------------------------------------------------------
#
# MEASURED (BENCH r3, 256^2 batch 64 int4): the [B, H, T, 2d] packed
# layout above LOSES end-to-end 8.8 vs 31.9 img/s — its attention read
# must slice kv[..., :d] / kv[..., d:], which XLA materializes as a
# whole-cache relayout copy per step (~2x the cache HBM traffic the
# quantization bought back), and the opaque kernel boundary breaks the
# einsum overlap.  The winning shape keeps the round-2 lane layout and
# its bandwidth-perfect XLA read path UNTOUCHED, and only replaces the
# dynamic_update_slice write with an aliased RMW of the 128-lane block
# holding ``index`` — k/v values and scales in one kernel.


def _lane_write_kernel(idx_ref, kq_new, ks_new, vq_new, vs_new,
                       kq_hbm, ks_hbm, vq_hbm, vs_hbm,
                       kq_out, ks_out, vq_out, vs_out,
                       kblk, vblk, ksblk, vsblk, sems):
    """RMW the 128-lane block containing ``index`` of all four aliased
    lane-layout cache buffers (k/v values [B, H, d, T], scales
    [B, H, 1, T]).  Grid over batch chunks bounds VMEM.

    All four input DMAs are issued CONCURRENTLY, then all four writebacks
    — two DMA-latency round trips per chunk instead of the eight the
    round-3 version serialized (start/wait per buffer per direction).
    The RMW is latency-bound, not bandwidth-bound (the blocks total ~2-8
    MB against 819 GB/s), so round trips are the whole cost; this is the
    GQA write-path lever named in BASELINE round 4 (the [B, kv, d, T]
    grouped carries lose DUS in-place aliasing in XLA and copy 10.5 MB
    per cache per token — 1.79 s of each 2.79 s GQA iteration)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    bc = kblk.shape[0]
    idx = idx_ref[0]
    base = (idx // _SCALE_BLK) * _SCALE_BLK
    lane = idx - base

    targets = ((kq_out, kblk, kq_new), (vq_out, vblk, vq_new),
               (ks_out, ksblk, ks_new), (vs_out, vsblk, vs_new))

    def copies(direction):
        cps = []
        for s, (out_ref, blk, _) in enumerate(targets):
            hbm = out_ref.at[pl.ds(i * bc, bc), :, :,
                             pl.ds(base, _SCALE_BLK)]
            cps.append(pltpu.make_async_copy(hbm, blk, sems.at[s])
                       if direction == "in" else
                       pltpu.make_async_copy(blk, hbm, sems.at[s]))
        return cps

    for c in copies("in"):
        c.start()
    for c in copies("in"):
        c.wait()
    for _, blk, new in targets:
        d3 = blk.shape[2]
        h = blk.shape[1]
        lanes = jax.lax.broadcasted_iota(
            jnp.int32, (bc, h, d3, _SCALE_BLK), 3)
        newc = new[pl.ds(i * bc, bc)]            # [bc, h, d3, 1]
        if blk.dtype == jnp.int4:
            # Mosaic cannot shape-cast int4 vectors; select in int8 space
            sel = jnp.where(lanes == lane, newc.astype(jnp.int8),
                            blk[:].astype(jnp.int8))
            blk[:] = sel.astype(jnp.int4)
        else:
            blk[:] = jnp.where(lanes == lane, newc.astype(blk.dtype),
                               blk[:])
    for c in copies("out"):
        c.start()
    for c in copies("out"):
        c.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _lane_write_pallas(kq, ks, vq, vs, kq_new, ks_new, vq_new, vs_new,
                       index, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, d, t = kq.shape
    assert t % _SCALE_BLK == 0, (t, _SCALE_BLK)
    idx = jnp.asarray(index, jnp.int32).reshape(1)

    # batch-chunk so the two value blocks stay ~4 MB each (the RMW is
    # latency-bound: fewer, larger chunks = fewer DMA round trips)
    itemsize = 0.5 if kq.dtype == jnp.int4 else kq.dtype.itemsize
    bc = b
    while bc > 1 and bc * h * d * _SCALE_BLK * itemsize > 4 * 1024 * 1024:
        assert bc % 2 == 0, (b, h, d)
        bc //= 2
    # caches stay HBM-resident (pltpu.ANY may resolve to VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.HBM)
    vnew_spec = pl.BlockSpec((b, h, d, 1), lambda i, s: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    snew_spec = pl.BlockSpec((b, h, 1, 1), lambda i, s: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bc,),
        in_specs=[vnew_spec, snew_spec, vnew_spec, snew_spec,
                  full(), full(), full(), full()],
        out_specs=[full(), full(), full(), full()],
        scratch_shapes=[
            pltpu.VMEM((bc, h, d, _SCALE_BLK), kq.dtype),
            pltpu.VMEM((bc, h, d, _SCALE_BLK), vq.dtype),
            pltpu.VMEM((bc, h, 1, _SCALE_BLK), ks.dtype),
            pltpu.VMEM((bc, h, 1, _SCALE_BLK), vs.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    # input indices incl. the scalar-prefetch arg: idx=0, news=1..4,
    # caches=5..8 -> outputs 0..3
    return pl.pallas_call(
        _lane_write_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(kq.shape, kq.dtype),
            jax.ShapeDtypeStruct(ks.shape, ks.dtype),
            jax.ShapeDtypeStruct(vq.shape, vq.dtype),
            jax.ShapeDtypeStruct(vs.shape, vs.dtype),
        ],
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(idx, kq_new, ks_new, vq_new, vs_new, kq, ks, vq, vs)


def update_quant_caches_aliased(k_cache, v_cache, k_new_t, v_new_t, index,
                                impl: str = "pallas"):
    """Aliased in-place write of one token into lane-layout ``QuantCache``
    pair (k, v); drop-in replacement for two ``update_quant_cache`` calls
    (``ops/quant.py``) that removes the whole-cache carry copies XLA
    makes for DUS inside the decode scan.  ``*_new_t`` are [B, H, d, 1]
    float.  Shape-generic over the head axis: grouped-query caches
    ([B, kv_heads, d, T]) go through the same kernel — and THERE the
    aliased write is the winning path, because XLA stops in-placing the
    grouped DUS carries entirely (BASELINE round 4, trace_gqa4)."""
    from .quant import QuantCache, quantize_kv

    kq = quantize_kv(k_new_t, dtype=k_cache.q.dtype,
                     scale_dtype=k_cache.scale.dtype)
    vq = quantize_kv(v_new_t, dtype=v_cache.q.dtype,
                     scale_dtype=v_cache.scale.dtype)
    if impl == "jnp":
        z = jnp.zeros((), jnp.int32)
        idx = jnp.asarray(index, jnp.int32)
        dus = jax.lax.dynamic_update_slice
        return (QuantCache(dus(k_cache.q, kq.q, (z, z, z, idx)),
                           dus(k_cache.scale, kq.scale, (z, z, z, idx))),
                QuantCache(dus(v_cache.q, vq.q, (z, z, z, idx)),
                           dus(v_cache.scale, vq.scale, (z, z, z, idx))))
    kqv, ksv, vqv, vsv = _lane_write_pallas(
        k_cache.q, k_cache.scale, v_cache.q, v_cache.scale,
        kq.q, kq.scale, vq.q, vq.scale, index,
        interpret=(impl == "pallas_interpret"))
    return QuantCache(kqv, ksv), QuantCache(vqv, vsv)


# ---------------------------------------------------------------------------
# attention read over the packed cache (jnp — XLA overlaps it with the
# adjacent matmuls inside the decode scan)
# ---------------------------------------------------------------------------

def decode_attention_packed(q, cache: PackedQuantCache, index) -> jax.Array:
    """Single-token attention, masked to positions <= index.

    q [B, H, 1, d] float; cache [B, H, T, 2d] int8/int4 + [2, B, H, T]
    scales.  Scales fold in outside the contractions so the matmul
    operands stay quantized (1 byte / nibble per element of HBM read).
    """
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    kq = cache.kv[..., :d]
    vq = cache.kv[..., d:]
    s = jnp.einsum("bhqd,bhkd->bhqk",
                   (q * jnp.asarray(scale, q.dtype)).astype(jnp.float32),
                   kq.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    s = s * cache.scale[0][:, :, None, :]
    kpos = jnp.arange(cache.kv.shape[2])
    s = jnp.where((kpos <= index)[None, None, None, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    pv = p * cache.scale[1][:, :, None, :]
    out = jnp.einsum("bhqk,bhkd->bhqd", pv, vq.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)
