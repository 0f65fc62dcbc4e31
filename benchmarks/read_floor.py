"""Decode cache-READ floor profile (VERDICT r3 #2).

The round-3 trace (`decode_trace.py`) showed the decode scan is ~78%
attention cache-read kLoop fusions at ~83 us each vs a ~52 us int4
bandwidth bound.  This bench isolates WHERE the 1.6x surplus lives by
timing read-only attention variants inside one jitted scan (caches as
invariants — no write/carry noise; q carried with a serializing
dependency so steps can't CSE):

  value stream   int4 vs int8 vs bf16 cache dtypes (bandwidth vs unpack)
  scale stream   with vs without the per-position scale multiplies
  operand dtype  bf16 vs fp32 einsum operands (convert cost)
  k-only         score einsum alone vs score+softmax+pv

Run: python benchmarks/read_floor.py  (real TPU; ~4 min)
     python benchmarks/read_floor.py --t 1408 --b 64   # 512^2 geometry
     (T=1408 is the paper's full 512^2 sequence; batch 64 is bench512's
     measured argmax — VERDICT r4 #3: give 512^2 the same floor proof
     256^2 got instead of arguing by analogy)
"""

import argparse
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mas_tpu.ops.quant import quantize_kv

B, H, D, T = 128, 16, 64, 640
STEPS = 256
LAYERS = 24
_NEG_INF = -1e30


def bench(name, body, q0, raw_ops, prepare=None, iters=3, note=""):
    """scan(body, q, STEPS) in one jit; body must return a new q (the
    serializing dependency).  Reports per-step (per-layer-token) cost.

    Quantized caches must be BUILT INSIDE the jit (`prepare` maps the
    fp32/bf16 `raw_ops` arguments to the body's operands): int4 arrays
    can neither be closed over (HLO constant embedding does a
    device->host copy the axon backend raises UNIMPLEMENTED on) nor
    passed as jit arguments (device_put of an S4 array with a tiled
    layout recursively re-enters jit on this backend).  The shipped
    sampler never moves them across a jit boundary either — the cache
    lives in the scan carry.  Prepare cost is amortized: one ~84 MB
    quantize per run call = <1 us/step over 256 steps."""

    @jax.jit
    def run(q, raw):
        ops = prepare(*raw) if prepare else raw
        def step(q, i):
            return body(q, i, *ops), ()
        q, _ = jax.lax.scan(step, q, jnp.arange(STEPS))
        return q

    out = run(q0, raw_ops)
    float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = run(q0, raw_ops)
        float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
        times.append(time.time() - t0)
    us = sorted(times)[len(times) // 2] / STEPS * 1e6
    print(f"{name:44s} {us:8.1f} us/step  (x{LAYERS} = "
          f"{us * LAYERS / 1000:6.2f} ms/token) {note}", flush=True)
    return us


def attn(q, kc, vc, index, cd, with_scales=True, k_only=False):
    """The shipped _decode_attention_int8_jnp body, parameterized."""
    s = jnp.einsum("bhqd,bhdk->bhqk",
                   (q * jnp.asarray(1 / math.sqrt(D), q.dtype)).astype(cd),
                   kc.q.astype(cd), preferred_element_type=jnp.float32)
    if with_scales:
        s = s * kc.scale.astype(jnp.float32)
    if k_only:
        return s[..., :D]
    kpos = jnp.arange(kc.q.shape[3])
    s = jnp.where((kpos <= index)[None, None, None, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    pv = p * vc.scale.astype(jnp.float32) if with_scales else p
    out = jnp.einsum("bhqk,bhdk->bhqd", pv.astype(cd), vc.q.astype(cd),
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def main():
    global B, T
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=B,
                    help="CFG-doubled decode batch (128 = 256^2 headline "
                         "argmax; 64 = the 512^2 bench argmax)")
    ap.add_argument("--t", type=int, default=T,
                    help="cache length (640 = 256^2; 1408 = 512^2 paper "
                         "geometry)")
    args = ap.parse_args()
    B, T = args.b, args.t
    print(f"backend={jax.default_backend()}  B={B} H={H} D={D} T={T} "
          f"steps={STEPS}", flush=True)
    rng = jax.random.PRNGKey(0)
    kv = jax.random.normal(rng, (B, H, D, T), jnp.float32)
    q0 = jax.random.normal(jax.random.PRNGKey(1), (B, H, 1, D),
                           jnp.bfloat16)

    def prep(dtype, scale_dtype=jnp.float32):
        def prepare(kv):
            c = quantize_kv(kv, dtype=dtype, scale_dtype=scale_dtype)
            return (c, c)
        return prepare

    def feedback(q, out):
        # tiny dependency so scan steps serialize without changing cost
        return q + (out[..., :1] * 1e-6).astype(q.dtype)

    def mk(cd, **kw):
        def body(q, i, kc, vc):
            out = attn(q, kc, vc, i, cd, **kw)
            return feedback(q, out)
        return body

    # the headline suspects
    results = {}
    for name, qd in (("int4", jnp.int4), ("int8", jnp.int8)):
        results[name] = bench(f"{name} full (shipped bf16 operands)",
                              mk(jnp.bfloat16), q0, (kv,), prep(qd))
        bench(f"{name} no-scale (value stream only)",
              mk(jnp.bfloat16, with_scales=False), q0, (kv,), prep(qd))
        bench(f"{name} k-einsum only (+scale)",
              mk(jnp.bfloat16, k_only=True), q0, (kv,), prep(qd))
        bench(f"{name} fp32 operands",
              mk(jnp.float32), q0.astype(jnp.float32), (kv,), prep(qd))
    bench("int4 bf16-scales", mk(jnp.bfloat16), q0, (kv,),
          prep(jnp.int4, jnp.bfloat16))

    # q-axis scaling: if the einsum is VPU-MAC bound its cost scales ~Q
    # (each query row adds MACs); if HBM-bound it stays flat (same cache
    # bytes).  Q=4 also emulates the GQA group-4 read shape — if XLA
    # switches the wider-q contraction onto the MXU, GQA gains compute
    # relief on top of its 4x bandwidth cut.
    for qrows in (4, 8):
        qq = jax.random.normal(jax.random.PRNGKey(2), (B, H, qrows, D),
                               jnp.bfloat16)
        bench(f"int4 full, Q={qrows} rows",
              mk(jnp.bfloat16), qq, (kv,), prep(jnp.int4),
              note=f"(VPU-bound => ~{qrows}x Q=1; HBM-bound => flat)")

    # GQA-shaped reads: kv_heads caches serve group q rows each — SAME
    # total MACs as MHA (B*H*d*T), 1/group the cache bytes.  If the einsum
    # is VPU-MAC-bound these only win if XLA routes the group>1
    # contraction onto the MXU; the timings tell which.
    for kvh in (4, 1):
        grp = H // kvh
        kvs = jax.random.normal(rng, (B, kvh, D, T), jnp.float32)
        qg = jax.random.normal(jax.random.PRNGKey(3), (B, kvh, grp, D),
                               jnp.bfloat16)
        bench(f"int4 GQA kv_heads={kvh} (group={grp})",
              mk(jnp.bfloat16), qg, (kvs,), prep(jnp.int4),
              note="(same MACs as MHA, 1/group bytes)")

    # shipped zero-pad shape (decode_q_rows): q padded with zero rows and
    # row 0 sliced back out — confirms the random-rows Q=8 result transfers
    # to the exact sampler graph (pad + einsums + slice)
    def mk_padded(rows):
        def body(q, i, kc, vc):
            qp = jnp.concatenate(
                [q, jnp.zeros((B, H, rows - 1, D), q.dtype)], axis=2)
            out = attn(qp, kc, vc, i, jnp.bfloat16)[:, :, :1]
            return feedback(q, out)
        return body

    for rows in (4, 8):
        bench(f"int4 zero-pad to Q={rows}, slice row0", mk_padded(rows),
              q0, (kv,), prep(jnp.int4))

    # int8 MXU dots: quantize q per (b,h) row, einsum int8 x int8 -> int32
    # (v5e MXU has a native int8 path), dequant scores by qs*ks; for pv,
    # quantize (p * vs) per row to int8.  Converts the VPU dequant-matvec
    # into MXU work at the cost of two small per-row quantizations.
    def mk_int8_mxu(rows):
        def body(q, i, kc, vc):
            qf = q.astype(jnp.float32) * (1 / math.sqrt(D))
            if rows > 1:
                qf = jnp.concatenate(
                    [qf, jnp.zeros((B, H, rows - 1, D), jnp.float32)],
                    axis=2)
            qs = jnp.max(jnp.abs(qf), axis=3, keepdims=True) / 127 + 1e-12
            qi = jnp.round(qf / qs).astype(jnp.int8)
            s = jnp.einsum("bhqd,bhdk->bhqk", qi, kc.q.astype(jnp.int8),
                           preferred_element_type=jnp.int32)
            s = s.astype(jnp.float32) * qs * kc.scale.astype(jnp.float32)
            kpos = jnp.arange(kc.q.shape[3])
            s = jnp.where((kpos <= i)[None, None, None, :], s, _NEG_INF)
            p = jax.nn.softmax(s, axis=-1)
            pv = p * vc.scale.astype(jnp.float32)
            ps = jnp.max(pv, axis=3, keepdims=True) / 127 + 1e-12
            pi = jnp.round(pv / ps).astype(jnp.int8)
            o = jnp.einsum("bhqk,bhdk->bhqd", pi, vc.q.astype(jnp.int8),
                           preferred_element_type=jnp.int32)
            out = o.astype(jnp.float32) * ps
            return feedback(q, out[:, :, :1])
        return body

    for rows in (1, 8):
        try:
            bench(f"int8 MXU dots (quantized q), Q={rows}",
                  mk_int8_mxu(rows), q0, (kv,), prep(jnp.int8))
        except Exception as e:   # int8 dot support is backend-dependent
            print(f"int8 MXU dots Q={rows}: FAILED "
                  f"({type(e).__name__}: {str(e)[:120]})", flush=True)

    # bf16 cache: no quantization at all — the pure-bandwidth reference
    def bf16_body(q, i, kv16, _vc):
        s = jnp.einsum("bhqd,bhdk->bhqk",
                       q * jnp.asarray(1 / math.sqrt(D), q.dtype), kv16,
                       preferred_element_type=jnp.float32)
        kpos = jnp.arange(T)
        s = jnp.where((kpos <= i)[None, None, None, :], s, _NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhqk,bhdk->bhqd", p.astype(jnp.bfloat16), kv16,
                         preferred_element_type=jnp.float32)
        return feedback(q, out.astype(q.dtype))

    bf16 = kv.astype(jnp.bfloat16)
    bf = bench("bf16 cache (2x int8 bytes, no dequant)", bf16_body, q0,
               (bf16, bf16))

    # arithmetic floors at 819 GB/s HBM
    for name, bytes_ in (("int4", B * H * T * (D // 2 + 4) * 2),
                         ("int8", B * H * T * (D + 4) * 2),
                         ("bf16", B * H * T * D * 2 * 2)):
        print(f"  floor {name}: {bytes_ / 819e9 * 1e6:.1f} us "
              f"({bytes_ / 1e6:.0f} MB @ 819 GB/s)", flush=True)
    print(f"measured: int4 {results['int4']:.1f} int8 "
          f"{results['int8']:.1f} bf16 {bf:.1f} us", flush=True)


if __name__ == "__main__":
    main()
