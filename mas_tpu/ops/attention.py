"""Fused blockwise (flash) attention for the MakeAScene transformer.

The reference materializes full [T, T] score matrices per layer under a
registered tril mask buffer (``/root/reference/models/transformer.py:57,
246-251``) — at T=1408, H=16 that is ~0.5 GB of fp32 score traffic per
layer per direction.  This kernel computes softmax(QK^T)V blockwise with
the standard running-max/denominator recurrence, so scores never leave
VMEM: HBM traffic drops from O(T^2) to O(T * d).

Numerics: CogView PB-relax (``transformer.py:44-71``) subtracts an
alpha-scaled global max — a per-row-constant shift that softmax cancels
exactly, which is what the flash running row-max performs implicitly; so
this kernel IS the PB-relax path, stabilized per-row instead of globally
(documented deviation, bit-compatible in fp32 up to reassociation).

Mask: the Make-A-Scene prefix-bidirectional causal mask
(``transformer.py:366-370``): position j visible from i iff ``j <= i`` OR
both i, j < prefix_length.  Computed closed-form from block indices —
never materialized in HBM.

Training gradients: ``flash_attention`` carries a ``jax.custom_vjp`` whose
backward is two more Pallas kernels (dKV and dQ passes) using the saved
(out, logsumexp) residuals — the standard flash backward split so each
pass keeps a single accumulator in VMEM.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
_NEG_INF = -1e30

# VMEM budget for the single-pass fp32 score tile (blk_q x t); v5e VMEM is
# ~16 MB — 4 MB for scores leaves room for q/k/v/p/acc + double buffering
_SINGLE_PASS_SCORE_BYTES = 4 * 1024 * 1024


def auto_blocks(t: int) -> tuple:
    """Measured block choice (v5e, B=16, H=16, T=1408, d=64, timed inside
    a 24-iteration ``lax.scan`` with scalar sync — per-call timings through
    the axon tunnel are dominated by output transfer and mislead):

      blk=(128, 128)  fwd 9.0 ms/layer   fwd+bwd 26.2 ms/layer
      blk=(128, T)    fwd 4.9 ms/layer   fwd+bwd 13.8 ms/layer  <- 1.9x
      blk=(T, 128)    fwd 6.9 ms/layer   fwd+bwd 17.1 ms/layer

    blk_k = T is the single-pass regime: one exact softmax, no running
    max/denominator recurrence, one [blk_q, 64] x [64, T] MXU dot per q
    block — it forgoes masked-block skipping (~45% more score flops at
    this mask) and still wins 1.9x because the small-block loop is
    bound by per-block VPU/layout work, not by the dots.  Auto-selected
    whenever the fp32 score tile fits the VMEM budget; the lse output
    layout pins blk_q to 128-divisible values.
    """
    if t % 128:
        # whole-array blocks (block dims equal to array dims are always
        # legal); resolve_attention_impl routes such lengths to jnp anyway
        return t, t
    blk_q = DEFAULT_BLOCK_Q
    if blk_q * t * 4 <= _SINGLE_PASS_SCORE_BYTES:
        return blk_q, t
    return blk_q, DEFAULT_BLOCK_K


# ---------------------------------------------------------------------------
# reference jnp implementation (tests + CPU fallback)
# ---------------------------------------------------------------------------

def prefix_causal_attention_jnp(q, k, v, prefix_length: int):
    """q,k,v [B, H, T, d] -> [B, H, T, d]; fp32 softmax."""
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    tq, tk = q.shape[2], k.shape[2]
    qpos = jnp.arange(tq)[:, None]
    kpos = jnp.arange(tk)[None, :]
    mask = (kpos <= qpos) | ((qpos < prefix_length) & (kpos < prefix_length))
    s = jnp.where(mask, s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32),
                      preferred_element_type=jnp.float32).astype(q.dtype)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _row_bound(qi, blk_q, prefix_length, q_offset=0):
    """Per-row visible-length bound [blk_q, 1]: the prefix-bidirectional
    causal mask is always a CONTIGUOUS span [0, bound) — prefix rows see
    [0, prefix), causal rows [0, qpos+1) — so one lane-iota compare
    replaces the 2-iota/3-op boolean tile (a ~4-VPU-pass saving per score
    tile, material because the fwd kernel is VPU-bound at d=64).
    ``q_offset``: absolute position of this call's first q row (band-split
    calls slice q outside the kernel)."""
    qpos = (q_offset + qi * blk_q
            + jax.lax.broadcasted_iota(jnp.int32, (blk_q, 1), 0))
    return jnp.where(qpos < prefix_length, prefix_length, qpos + 1)


def _mask_tile(qi, kj, blk_q, blk_k, prefix_length, q_offset=0,
               k_offset=0):
    """Boolean [blk_q, blk_k] visibility tile for q-block qi, k-block kj."""
    kpos = (k_offset + kj * blk_k
            + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 1))
    return kpos < _row_bound(qi, blk_q, prefix_length, q_offset)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, blk_q, blk_k,
                prefix_length, t_kv, scale, q_offset=0):
    from jax.experimental import pallas as pl

    qi = pl.program_id(1)
    # keep q/k/v in their storage dtype for the MXU dots (bf16 inputs hit
    # the native bf16xbf16->fp32 path); all accumulation is fp32
    q = (q_ref[0] * jnp.asarray(scale, q_ref.dtype))     # [blk_q, d]
    nk = t_kv // blk_k

    if blk_k == t_kv:
        # single-pass regime (auto_blocks' measured winner at the flagship
        # geometries): one exact softmax, no running-max/denominator
        # recurrence ops at all
        s = jax.lax.dot_general(
            q, k_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [blk_q, t] f32
        kpos = jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 1)
        s = jnp.where(
            kpos < _row_bound(qi, blk_q, prefix_length, q_offset), s,
            _NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0] = (acc / l).astype(o_ref.dtype)
        lse_ref[0, 0] = (m + jnp.log(l))[:, 0]
        return

    def body(kj, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(kj * blk_k, blk_k), :]
        v = v_ref[0, pl.ds(kj * blk_k, blk_k), :]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [blk_q, blk_k] f32
        mask = _mask_tile(qi, kj, blk_q, blk_k, prefix_length, q_offset)
        s = jnp.where(mask, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l

    # skip k-blocks that are fully masked: block kj is visible from q-block
    # qi iff kj*blk_k <= qi*blk_q + blk_q - 1 or both inside the prefix.
    # The prefix block boundary: ceil(prefix/blk_k). Upper bound for the
    # loop = max(causal bound, prefix bound when this q-block intersects
    # the prefix).
    causal_hi = jnp.minimum(
        (q_offset + qi * blk_q + blk_q - 1) // blk_k + 1, nk)
    prefix_hi = jnp.where(q_offset + qi * blk_q < prefix_length,
                          (prefix_length + blk_k - 1) // blk_k, 0)
    hi = jnp.maximum(causal_hi, prefix_hi)

    acc0 = jnp.zeros((blk_q, q_ref.shape[-1]), jnp.float32)
    m0 = jnp.full((blk_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((blk_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, hi, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0, 0] = (m + jnp.log(l))[:, 0]


@functools.partial(jax.jit, static_argnames=(
    "prefix_length", "blk_q", "blk_k", "interpret"))
def _flash_fwd(q, k, v, prefix_length: int, blk_q: int, blk_k: int,
               interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, t, d = q.shape
    assert t % blk_q == 0 and t % blk_k == 0, (t, blk_q, blk_k)
    bh = b * h
    qf = q.reshape(bh, t, d)
    kf = k.reshape(bh, t, d)
    vf = v.reshape(bh, t, d)
    scale = 1.0 / math.sqrt(d)

    kernel = functools.partial(
        _fwd_kernel, blk_q=blk_q, blk_k=blk_k,
        prefix_length=prefix_length, t_kv=t, scale=scale)
    out, lse = pl.pallas_call(
        kernel,
        grid=(bh, t // blk_q),
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t, d), q.dtype),
            # [bh, 1, t]: lane-major so (1, 1, blk_q) blocks tile legally
            # (Mosaic needs the last two block dims (8,128)-divisible or
            # equal to the array dims)
            jax.ShapeDtypeStruct((bh, 1, t), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t * t * d, transcendentals=bh * t * t,
            bytes_accessed=3 * bh * t * d * 4 + bh * t * d * 4),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, t, d), lse.reshape(b, h, t)


# ---------------------------------------------------------------------------
# band-split drivers: static per-band k-extents
# ---------------------------------------------------------------------------

def band_plan(t: int, blk_q: int, prefix_length: int) -> list:
    """[(q_start, q_len, k_len)] bands with STATIC k-extents.

    The prefix-bidirectional mask makes every row's visible span
    [0, bound) with bound <= max(prefix, q_block_end) — so q-blocks fully
    inside the prefix need only k[:prefix], and causal q-block i needs
    only k[:(i+1)*blk_q].  Running the single-pass kernel once per band
    (consecutive prefix blocks merged) skips the dead tail with zero
    recurrence and zero dynamic shapes: 57% of the full-row score work at
    the 1408/384 flagship geometry, 72% at 640/384.

    MEASURED (benchmarks/flash_singlepass.py, v5e): the 43% compute
    saving is almost exactly consumed by the per-band k/v window
    re-fetches (bands read overlapping k[:klen] prefixes — ~6x the k/v
    HBM traffic of one whole-row pass) plus 9x kernel launches: fwd+bwd
    6.90 vs 7.15 ms/layer at T=1408 (3.5% win), 3.12 vs 3.06 at T=640
    (wash).  Banding therefore engages only at t >= 1024.  An XLA-sliced
    operand variant (no index-map windows) was 1.5x WORSE than no
    banding at all — pallas operand materialization dominates."""
    n_pref = prefix_length // blk_q
    plan = []
    if n_pref:
        plan.append((0, n_pref * blk_q, prefix_length))
    for i in range(n_pref, t // blk_q):
        plan.append((i * blk_q, blk_q, (i + 1) * blk_q))
    return plan


def _band_ok(t: int, blk_q: int, blk_k: int, prefix_length: int) -> bool:
    """Band split is legal in the single-pass regime when the prefix is
    q-block aligned — every band's q-offset and k-window offset is then
    an integer number of blocks, so the per-band pallas calls address
    their windows through BlockSpec index maps on the FULL arrays (zero
    input copies; an XLA-sliced variant was measured 1.5x SLOWER than no
    banding at all — the operand materialization ate the saving)."""
    return (BAND_SPLIT and blk_k == t and t % blk_q == 0 and t >= 1024
            and 0 < prefix_length < t and prefix_length % blk_q == 0)


# Band splitting is an explicit OPT-IN ablation: the measured end-to-end
# win is ~3.5% of attention fwd+bwd at T=1408 (a wash at 640), but the
# per-geometry compile goes from 3 pallas kernels to 27 and blew a 95 s
# train-step compile past 15 MINUTES on the axon toolchain.  Not worth it
# as a default; flip for experiments (benchmarks/flash_singlepass.py).
BAND_SPLIT = False


@functools.partial(jax.jit, static_argnames=(
    "prefix_length", "blk_q", "interpret"))
def _flash_fwd_banded(q, k, v, prefix_length: int, blk_q: int,
                      interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, t, d = q.shape
    bh = b * h
    qf = q.reshape(bh, t, d)
    kf = k.reshape(bh, t, d)
    vf = v.reshape(bh, t, d)
    scale = 1.0 / math.sqrt(d)

    outs, lses = [], []
    for qs, qlen, klen in band_plan(t, blk_q, prefix_length):
        kernel = functools.partial(
            _fwd_kernel, blk_q=blk_q, blk_k=klen,
            prefix_length=prefix_length, t_kv=klen, scale=scale,
            q_offset=qs)
        qb = qs // blk_q
        # windows are addressed through index maps on the FULL arrays —
        # no operand slicing, no copies
        out, lse = pl.pallas_call(
            kernel,
            grid=(bh, qlen // blk_q),
            in_specs=[
                pl.BlockSpec((1, blk_q, d),
                             lambda i, j, qb=qb: (i, j + qb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, klen, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, klen, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, blk_q), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, qlen, d), q.dtype),
                jax.ShapeDtypeStruct((bh, 1, qlen), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=4 * bh * qlen * klen * d,
                transcendentals=bh * qlen * klen,
                bytes_accessed=(2 * bh * klen * d + 2 * bh * qlen * d) * 4),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            interpret=interpret,
        )(qf, kf, vf)
        outs.append(out)
        lses.append(lse)
    out = jnp.concatenate(outs, axis=1)
    lse = jnp.concatenate(lses, axis=2)
    return out.reshape(b, h, t, d), lse.reshape(b, h, t)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------

def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
                    dk_ref, dv_ref, *, blk_q, blk_k, prefix_length, t_q,
                    scale, q_offset=0, k_offset=0):
    """One k-block against all q-blocks: accumulate dK, dV."""
    from jax.experimental import pallas as pl

    kj = pl.program_id(1)
    k = k_ref[0].astype(jnp.float32)                     # [blk_k, d]
    v = v_ref[0].astype(jnp.float32)
    nq = t_q // blk_q

    def body(qi, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qi * blk_q, blk_q), :].astype(jnp.float32) * scale
        do = do_ref[0, pl.ds(qi * blk_q, blk_q), :].astype(jnp.float32)
        o = o_ref[0, pl.ds(qi * blk_q, blk_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(qi * blk_q, blk_q)]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [blk_q, blk_k]
        mask = _mask_tile(qi, kj, blk_q, blk_k, prefix_length, q_offset,
                          k_offset)
        p = jnp.where(mask, jnp.exp(s - lse[:, None]), 0.0)
        # delta_i = sum_d do * o  (rowwise)
        delta = jnp.sum(do * o, axis=1, keepdims=True)   # [blk_q, 1]
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [blk_q, blk_k]
        ds = p * (dp - delta)                            # [blk_q, blk_k]
        dv = dv + jax.lax.dot_general(
            p, do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [blk_k, d]
        dk = dk + jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [blk_k, d]
        return dk, dv

    # q-blocks that can see this k-block: qpos >= k start (causal), or any
    # row when the k-block intersects the prefix.  Positions are absolute;
    # band-split calls pre-slice q, so local block = (abs - q_offset)/blk_q.
    k_abs = k_offset + kj * blk_k
    lo_causal = jnp.maximum(k_abs - q_offset, 0) // blk_q
    lo = jnp.where(k_abs < prefix_length, 0, lo_causal)
    d = q_ref.shape[-1]
    dk0 = jnp.zeros((blk_k, d), jnp.float32)
    dv0 = jnp.zeros((blk_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(lo, nq, body, (dk0, dv0))
    # q was pre-scaled inside the body, so dk = ds^T (q*scale) is complete
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, dq_ref, *,
                   blk_q, blk_k, prefix_length, t_kv, scale, q_offset=0):
    """One q-block against its visible k-blocks: dQ."""
    from jax.experimental import pallas as pl

    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * scale
    do = do_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0]
    delta = jnp.sum(do * o, axis=1, keepdims=True)
    nk = t_kv // blk_k

    def body(kj, dq):
        k = k_ref[0, pl.ds(kj * blk_k, blk_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kj * blk_k, blk_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        mask = _mask_tile(qi, kj, blk_q, blk_k, prefix_length, q_offset)
        p = jnp.where(mask, jnp.exp(s - lse[:, None]), 0.0)
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(
            ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    causal_hi = jnp.minimum(
        (q_offset + qi * blk_q + blk_q - 1) // blk_k + 1, nk)
    prefix_hi = jnp.where(q_offset + qi * blk_q < prefix_length,
                          (prefix_length + blk_k - 1) // blk_k, 0)
    hi = jnp.maximum(causal_hi, prefix_hi)
    dq0 = jnp.zeros((blk_q, q_ref.shape[-1]), jnp.float32)
    dq = jax.lax.fori_loop(0, hi, body, dq0)
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "prefix_length", "blk_q", "blk_k", "interpret"))
def _flash_bwd(q, k, v, out, lse, do, prefix_length: int, blk_q: int,
               blk_k: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, t, d = q.shape
    bh = b * h
    rs = lambda x: x.reshape(bh, t, d)
    qf, kf, vf, of, dof = rs(q), rs(k), rs(v), rs(out), rs(do)
    lsef = lse.reshape(bh, 1, t)
    scale = 1.0 / math.sqrt(d)

    full = lambda: pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    dkv_kernel = functools.partial(
        _bwd_dkv_kernel, blk_q=blk_q, blk_k=blk_k,
        prefix_length=prefix_length, t_q=t, scale=scale)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(bh, t // blk_k),
        in_specs=[full(),
                  pl.BlockSpec((1, blk_k, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, blk_k, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
                  full(), full(), lse_spec],
        out_specs=[pl.BlockSpec((1, blk_k, d), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, blk_k, d), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((bh, t, d), q.dtype),
                   jax.ShapeDtypeStruct((bh, t, d), q.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=8 * bh * t * t * d, transcendentals=bh * t * t,
            bytes_accessed=6 * bh * t * d * 4),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(qf, kf, vf, dof, of, lsef)

    dq_kernel = functools.partial(
        _bwd_dq_kernel, blk_q=blk_q, blk_k=blk_k,
        prefix_length=prefix_length, t_kv=t, scale=scale)
    dq = pl.pallas_call(
        dq_kernel,
        grid=(bh, t // blk_q),
        in_specs=[pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
                  full(), full(),
                  pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, blk_q), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=5 * bh * t * t * d, transcendentals=bh * t * t,
            bytes_accessed=5 * bh * t * d * 4),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(qf, kf, vf, dof, of, lsef)

    unrs = lambda x: x.reshape(b, h, t, d)
    return unrs(dq), unrs(dk), unrs(dv)


@functools.partial(jax.jit, static_argnames=(
    "prefix_length", "blk_q", "interpret"))
def _flash_bwd_banded(q, k, v, out, lse, do, prefix_length: int,
                      blk_q: int, interpret: bool = False):
    """Band-split backward: dQ follows the forward's q-bands (static
    k[:k_len] per band); dK/dV band by K —  the prefix k-range is visible
    to every row, causal k-block j only to rows >= j*blk_q, so each call
    pre-slices q/do/o/lse to the visible suffix.  Same 57%-of-full-row
    work as the forward, all extents static."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, t, d = q.shape
    bh = b * h
    rs = lambda x: x.reshape(bh, t, d)
    qf, kf, vf, of, dof = rs(q), rs(k), rs(v), rs(out), rs(do)
    lsef = lse.reshape(bh, 1, t)
    scale = 1.0 / math.sqrt(d)

    def qspec(n):
        return pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    # ---- dQ: forward bands, windows via index maps (no copies) ----
    dqs = []
    for qs, qlen, klen in band_plan(t, blk_q, prefix_length):
        kernel = functools.partial(
            _bwd_dq_kernel, blk_q=blk_q, blk_k=klen,
            prefix_length=prefix_length, t_kv=klen, scale=scale,
            q_offset=qs)
        qb = qs // blk_q
        qwin = pl.BlockSpec((1, blk_q, d),
                            lambda i, j, qb=qb: (i, j + qb, 0),
                            memory_space=pltpu.VMEM)
        dq = pl.pallas_call(
            kernel,
            grid=(bh, qlen // blk_q),
            in_specs=[qwin, qspec(klen), qspec(klen), qwin, qwin,
                      pl.BlockSpec((1, 1, blk_q),
                                   lambda i, j, qb=qb: (i, 0, j + qb),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bh, qlen, d), q.dtype),
            cost_estimate=pl.CostEstimate(
                flops=5 * bh * qlen * klen * d,
                transcendentals=bh * qlen * klen,
                bytes_accessed=5 * bh * qlen * d * 4),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            interpret=interpret,
        )(qf, kf, vf, dof, of, lsef)
        dqs.append(dq)
    dq = jnp.concatenate(dqs, axis=1)

    # ---- dK/dV: k-bands [0, prefix) + one causal block at a time; the
    # q side stays FULL (the kernel's lo bound skips invisible q-blocks),
    # the k/v windows go through index maps ----
    kbands = [(0, prefix_length)]               # (k_start, k_len)
    kbands += [(ks, blk_q) for ks in range(prefix_length, t, blk_q)]
    qfull = pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    dks, dvs = [], []
    for ks, klen in kbands:
        kernel = functools.partial(
            _bwd_dkv_kernel, blk_q=blk_q, blk_k=klen,
            prefix_length=prefix_length, t_q=t, scale=scale,
            q_offset=0, k_offset=ks)
        kb = ks // klen
        kwin = pl.BlockSpec((1, klen, d),
                            lambda i, j, kb=kb: (i, kb, 0),
                            memory_space=pltpu.VMEM)
        qvis = t - ks if ks else t
        dk, dv = pl.pallas_call(
            kernel,
            grid=(bh, 1),
            in_specs=[qfull, kwin, kwin, qfull, qfull,
                      pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((1, klen, d), lambda i, j: (i, 0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, klen, d), lambda i, j: (i, 0, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((bh, klen, d), q.dtype),
                       jax.ShapeDtypeStruct((bh, klen, d), q.dtype)],
            cost_estimate=pl.CostEstimate(
                flops=8 * bh * qvis * klen * d,
                transcendentals=bh * qvis * klen,
                bytes_accessed=(4 * bh * qvis * d + 2 * bh * klen * d) * 4),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            interpret=interpret,
        )(qf, kf, vf, dof, of, lsef)
        dks.append(dk)
        dvs.append(dv)
    dk = jnp.concatenate(dks, axis=1)
    dv = jnp.concatenate(dvs, axis=1)

    unrs = lambda x: x.reshape(b, h, t, d)
    return unrs(dq), unrs(dk), unrs(dv)


# ---------------------------------------------------------------------------
# public API with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(q, k, v, prefix_length: int,
                    blk_q: int = DEFAULT_BLOCK_Q,
                    blk_k: int = DEFAULT_BLOCK_K,
                    interpret: bool = False):
    """Fused prefix-bidirectional-causal attention.

    q, k, v: [B, H, T, d]; T must divide by the block sizes (the model's
    1408 = 11 x 128 does).  Returns [B, H, T, d] in q's dtype.
    """
    out, _ = _fa_fwd(q, k, v, prefix_length, blk_q, blk_k, interpret)
    return out


def _fa_fwd(q, k, v, prefix_length, blk_q, blk_k, interpret):
    if _band_ok(q.shape[2], blk_q, blk_k, prefix_length):
        out, lse = _flash_fwd_banded(q, k, v, prefix_length, blk_q,
                                     interpret)
    else:
        out, lse = _flash_fwd(q, k, v, prefix_length, blk_q, blk_k,
                              interpret)
    return out, (q, k, v, out, lse)


def _fa_bwd(prefix_length, blk_q, blk_k, interpret, res, g):
    q, k, v, out, lse = res
    if _band_ok(q.shape[2], blk_q, blk_k, prefix_length):
        dq, dk, dv = _flash_bwd_banded(q, k, v, out, lse, g,
                                       prefix_length, blk_q, interpret)
    else:
        dq, dk, dv = _flash_bwd(q, k, v, out, lse, g, prefix_length,
                                blk_q, blk_k, interpret)
    return dq, dk, dv


flash_attention.defvjp(_fa_fwd, _fa_bwd)


def prefix_causal_attention(q, k, v, prefix_length: int,
                            impl: str = "auto") -> jax.Array:
    """Dispatch: pallas flash kernel on TPU, jnp elsewhere.

    impl: 'auto' | 'jnp' | 'pallas' | 'pallas_interpret'.
    """
    if impl == "auto":
        t = q.shape[2]
        ok = (t % DEFAULT_BLOCK_Q == 0 and t % DEFAULT_BLOCK_K == 0)
        impl = ("pallas" if jax.default_backend() == "tpu" and ok
                else "jnp")
    if impl == "jnp":
        return prefix_causal_attention_jnp(q, k, v, prefix_length)
    blk_q, blk_k = auto_blocks(q.shape[2])
    if impl == "pallas":
        return flash_attention(q, k, v, prefix_length, blk_q, blk_k)
    if impl == "pallas_interpret":
        return flash_attention(q, k, v, prefix_length, blk_q, blk_k,
                               interpret=True)
    raise ValueError(f"unknown impl {impl!r}")
