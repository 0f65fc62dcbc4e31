"""Single-token decode attention over an HBM-resident KV cache.

The sampler's cached decode step attends one query token against the
preallocated caches.  The naive jnp path (and the reference's torch path,
``/root/reference/models/transformer.py:73-115``) reads the ENTIRE padded
cache every step and masks the invalid tail — at the 512² geometry that is
1408 positions when on average only ~900 are valid, and the KV reads
dominate decode-step HBM traffic (caches outweigh the layer's weights).

This kernel keeps the caches in HBM and DMAs only ``ceil(valid/blk)``
blocks into a double-buffered VMEM scratch, overlapping the next block's
copy with the current block's math (flash-style running softmax, fp32
accumulation).  ``valid = index + 1`` arrives as a prefetched scalar so the
loop bound is dynamic per call without recompilation.

Cache layout is TRANSPOSED: ``[B, H, d, T]`` with the sequence in the lane
dimension.  Mosaic requires DMA slices to be 128-lane aligned; with the
reference's ``[.., T, d]`` layout the d=64 lane dim cannot be block-sliced,
while ``[.., d, T]`` slices T in 128-blocks and keeps d=64 in (8-aligned)
sublanes.  ``mas_tpu.models.sampler`` allocates the caches in this layout;
``transpose_cache`` converts prefill-shaped [B, H, P, d] k/v.

MEASURED (v5e, B=16, H=16, T=640, bf16):
  * per-(b,h) grid (16 KB DMAs): 702 us/call — 1.9x slower than jnp.
  * per-batch grid, all heads per step (256 KB DMAs, this version):
    374 us/call vs jnp 425 us — wins the isolated microbenchmark…
  * …but END-TO-END sampling is still faster with the jnp path
    (7.10 vs 4.82 img/s): inside the decode ``lax.scan`` XLA overlaps its
    fused attention with the adjacent qkv/mlp matmuls, which opaque kernel
    boundaries prevent.  'auto' therefore decodes via jnp; the kernel
    remains opt-in for longer-cache regimes where the valid-prefix
    skipping dominates.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

DECODE_BLOCK = 128
_NEG_INF = -1e30


def transpose_cache(kv: jax.Array) -> jax.Array:
    """[B, H, T, d] -> the decode layout [B, H, d, T]."""
    return kv.transpose(0, 1, 3, 2)


def decode_attention_jnp(q, k_cache_t, v_cache_t, index):
    """Reference path: full-cache masked attention.
    q [B, H, Q, d]; caches [B, H, d, T] (transposed); index = write pos.
    Q is 1 for MHA; GQA callers pass q grouped as [B, kv_heads, group, d]
    (the einsums are generic over the Q axis)."""
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    s = jnp.einsum("bhqd,bhdk->bhqk",
                   (q * jnp.asarray(scale, q.dtype)), k_cache_t,
                   preferred_element_type=jnp.float32)
    kpos = jnp.arange(k_cache_t.shape[3])
    s = jnp.where((kpos <= index)[None, None, None, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(v_cache_t.dtype)
    return jnp.einsum("bhqk,bhdk->bhqd", p, v_cache_t,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _decode_kernel(idx_ref, q_ref, k_hbm, v_hbm, o_ref,
                   k_buf, v_buf, sems, *, blk, scale):
    """Grid = (batch,).  ALL heads are processed per grid step so each DMA
    moves an [H, d, blk] chunk (e.g. 16x64x128 bf16 = 256 KB) — large
    enough to saturate HBM bandwidth, unlike a per-(b,h) grid whose 16 KB
    copies ran at ~5 %% of peak (measured; see module docstring)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    valid = idx_ref[0] + 1
    nblk = pl.cdiv(valid, blk)
    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)        # [H, d]

    def copy(j, slot):
        pltpu.make_async_copy(
            k_hbm.at[i, :, :, pl.ds(j * blk, blk)], k_buf.at[slot],
            sems.at[slot, 0]).start()
        pltpu.make_async_copy(
            v_hbm.at[i, :, :, pl.ds(j * blk, blk)], v_buf.at[slot],
            sems.at[slot, 1]).start()

    def wait(j, slot):
        pltpu.make_async_copy(
            k_hbm.at[i, :, :, pl.ds(j * blk, blk)], k_buf.at[slot],
            sems.at[slot, 0]).wait()
        pltpu.make_async_copy(
            v_hbm.at[i, :, :, pl.ds(j * blk, blk)], v_buf.at[slot],
            sems.at[slot, 1]).wait()

    copy(0, 0)

    def body(j, carry):
        m, l, acc = carry
        slot = jax.lax.rem(j, 2)
        wait(j, slot)

        @pl.when(j + 1 < nblk)
        def _():
            copy(j + 1, jax.lax.rem(j + 1, 2))

        k = k_buf[slot]                                   # [H, d, blk]
        v = v_buf[slot]                                   # [H, d, blk]
        # batched matvecs on the VPU (this Mosaic rejects batched
        # dot_general, and the kernel is DMA-bound anyway):
        # s[h, blk] = sum_d q[h, d] k[h, d, blk]
        # (cast before the minor-dim insert: Mosaic only reshapes 32-bit)
        qf = q.astype(jnp.float32)[:, :, None]            # [H, d, 1]
        s = jnp.sum(qf * k.astype(jnp.float32), axis=1)   # [H, blk]
        h = q.shape[0]
        kpos = j * blk + jax.lax.broadcasted_iota(jnp.int32, (h, blk), 1)
        s = jnp.where(kpos < valid, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        # acc[h, d] += sum_blk p[h, blk] v[h, d, blk]
        acc = acc * alpha + jnp.sum(
            p[:, None, :] * v.astype(jnp.float32), axis=2)  # [H, d]
        return m_new, l, acc

    h, d = q_ref.shape[1], q_ref.shape[2]
    m0 = jnp.full((h, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((h, 1), jnp.float32)
    acc0 = jnp.zeros((h, d), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, nblk, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("blk", "interpret"))
def _decode_attention_pallas(q, k_cache_t, v_cache_t, index,
                             blk: int = DECODE_BLOCK,
                             interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, _, d = q.shape
    t = k_cache_t.shape[3]
    assert t % blk == 0, (t, blk)
    qf = q.reshape(b, h, d)
    scale = 1.0 / math.sqrt(d)
    idx = jnp.asarray(index, jnp.int32).reshape(1)

    kernel = functools.partial(_decode_kernel, blk=blk, scale=scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, d), lambda i, idx_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),     # K cache stays in HBM
            pl.BlockSpec(memory_space=pltpu.HBM),     # V cache stays in HBM
        ],
        out_specs=pl.BlockSpec((1, h, d), lambda i, idx_ref: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, h, d, blk), k_cache_t.dtype),
            pltpu.VMEM((2, h, d, blk), v_cache_t.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t * d, transcendentals=b * h * t,
            bytes_accessed=2 * b * h * t * d * k_cache_t.dtype.itemsize),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(idx, qf, k_cache_t, v_cache_t)
    return out.reshape(b, h, 1, d)


def decode_attention(q, k_cache_t, v_cache_t, index, impl: str = "auto"):
    """Cached single-token attention; masked to positions <= index.

    q [B, H, 1, d]; caches in the TRANSPOSED decode layout [B, H, d, T].
    impl: 'auto' (pallas on TPU when T % 128 == 0) | 'jnp' | 'pallas' |
    'pallas_interpret'.
    """
    if impl == "auto":
        ok = k_cache_t.shape[3] % DECODE_BLOCK == 0
        impl = "pallas" if jax.default_backend() == "tpu" and ok else "jnp"
    if impl == "jnp":
        return decode_attention_jnp(q, k_cache_t, v_cache_t, index)
    if impl == "pallas":
        return _decode_attention_pallas(q, k_cache_t, v_cache_t, index)
    if impl == "pallas_interpret":
        return _decode_attention_pallas(q, k_cache_t, v_cache_t, index,
                                        interpret=True)
    raise ValueError(f"unknown impl {impl!r}")
