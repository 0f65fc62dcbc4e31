"""Decode-step component ablation at the serving geometry.

Times each component INSIDE one jitted ``lax.scan`` with the caches as
donated carries — the sampler's actual regime (standalone per-call timings
through the axon tunnel are dominated by ~1-2 ms dispatch overhead and
non-donated full-cache copies, and mislead by 10x).

Geometry: B=128 (64 + CFG doubling), H=16, d=64, T=640 (256² pipeline);
per-(layer, token) costs are scan_time / STEPS, x24 layers for ms/token.

Run: python benchmarks/decode_ablation.py  (real TPU; ~3 min)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mas_tpu.ops.quant import (QuantCache, decode_attention_int8,
                               quantize_kv, update_quant_cache)

B, H, D, T = 128, 16, 64, 640
LAYERS = 24
STEPS = 256


def bench_scan(name, make_body, carries, iters=3):
    """scan(body, carries, STEPS) in one jit; report per-step cost."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(carries):
        def body(c, step):
            return make_body(c, step), ()
        c, _ = jax.lax.scan(body, carries, jnp.arange(STEPS))
        return c

    c = jax.tree.map(jnp.copy, carries)
    c = run(c)                                    # compile
    jax.tree.map(lambda x: float(jnp.asarray(x).reshape(-1)[0].astype(
        jnp.float32)), c)
    times = []
    for _ in range(iters):
        c2 = jax.tree.map(jnp.copy, carries)
        t0 = time.time()
        c2 = run(c2)
        jax.tree.map(lambda x: float(jnp.asarray(x).reshape(-1)[0].astype(
            jnp.float32)), c2)
        times.append(time.time() - t0)
    dt = sorted(times)[len(times) // 2] / STEPS * 1000
    print(f"{name:52s} {dt:7.4f} ms/step  (x{LAYERS} = "
          f"{dt * LAYERS:6.2f} ms/token)", flush=True)
    return dt


def main():
    r = jax.random.PRNGKey(0)
    q = jax.random.normal(r, (B, H, 1, D), jnp.bfloat16)
    k = jax.random.normal(r, (B, H, D, T), jnp.bfloat16)
    new = jax.random.normal(r, (B, H, D, 1), jnp.bfloat16)
    kq = quantize_kv(k)

    bw = 2 * B * H * (D + 4) * T / 1e9
    print(f"cache read per (layer, token): {bw * 1000:.1f} MB "
          f"(~{bw / 0.819 * 1000:.3f} ms at 819 GB/s)", flush=True)

    # (a) attention only, lane layout (cache constant carry, donated)
    bench_scan(
        "attention only, lane [B,H,d,T]",
        lambda c, s: (decode_attention_int8(c[0], c[1], c[2], s)
                      .astype(jnp.bfloat16), c[1], c[2]),
        (q, kq, kq))

    # (b) writes only (quantize + DUS both caches)
    bench_scan(
        "quantize+DUS writes only, lane",
        lambda c, s: (update_quant_cache(c[0], new, s),
                      update_quant_cache(c[1], new, s)),
        (kq, kq))

    # (c) write + attention (the real per-layer pattern)
    def wa(c, s):
        q_, kc, vc = c
        kc = update_quant_cache(kc, new, s)
        vc = update_quant_cache(vc, new, s)
        return (decode_attention_int8(q_, kc, vc, s).astype(jnp.bfloat16),
                kc, vc)
    bench_scan("write + attention, lane", wa, (q, kq, kq))

    # (d) sublane layout [B,H,T,d]
    k_s = k.transpose(0, 1, 3, 2).astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(k_s), 3, keepdims=True), 1e-8) / 127
    kq_s = QuantCache(
        q=jnp.clip(jnp.round(k_s / amax), -127, 127).astype(jnp.int8),
        scale=amax)

    def write_s(cache, s):
        nf = new.transpose(0, 1, 3, 2).astype(jnp.float32)
        am = jnp.maximum(jnp.max(jnp.abs(nf), 3, keepdims=True), 1e-8) / 127
        qn = jnp.clip(jnp.round(nf / am), -127, 127).astype(jnp.int8)
        return QuantCache(
            q=jax.lax.dynamic_update_slice(cache.q, qn, (0, 0, s, 0)),
            scale=jax.lax.dynamic_update_slice(cache.scale, am,
                                               (0, 0, s, 0)))

    def attn_s(q_, kc, vc, s):
        sc = jnp.einsum("bhqd,bhkd->bhqk", q_.astype(jnp.float32),
                        kc.q.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
        sc = sc * kc.scale[:, :, None, :, 0] / (D ** 0.5)
        kpos = jnp.arange(T)
        sc = jnp.where((kpos <= s)[None, None, None, :], sc, -1e30)
        p = jax.nn.softmax(sc, axis=-1)
        pv = p * vc.scale[:, :, None, :, 0]
        return jnp.einsum("bhqk,bhkd->bhqd", pv, vc.q.astype(jnp.float32),
                          preferred_element_type=jnp.float32)

    def wa_s(c, s):
        q_, kc, vc = c
        kc, vc = write_s(kc, s), write_s(vc, s)
        return attn_s(q_, kc, vc, s).astype(jnp.bfloat16), kc, vc
    bench_scan("write + attention, sublane [B,H,T,d]", wa_s, (q, kq_s, kq_s))

    # (e) attention at T=512 — the tail-skipping headroom
    k512 = QuantCache(q=kq.q[:, :, :, :512].copy(),
                      scale=kq.scale[:, :, :, :512].copy())
    bench_scan(
        "attention only, lane, T=512 (avg valid)",
        lambda c, s: (decode_attention_int8(c[0], c[1], c[2], s)
                      .astype(jnp.bfloat16), c[1], c[2]),
        (q, k512, k512))

    # (f) sampling head: guided mix + top-k + categorical at vocab 8192
    logits = jax.random.normal(r, (B, 8192), jnp.float32)

    def sample_head(c, s):
        lg, key = c
        cond, uncond = lg[:B // 2], lg[B // 2:]
        g = uncond + 3.0 * (cond - uncond)
        kth = jax.lax.top_k(g, 64)[0][:, -1:]
        g = jnp.where(g < kth, -jnp.inf, g)
        key, k2 = jax.random.split(key)
        tok = jax.random.categorical(k2, g, axis=-1)
        return lg + tok.sum() * 0.0, key
    bench_scan("sampling head (CFG mix + top-64 + categorical)",
               sample_head, (logits, jax.random.PRNGKey(1)))


if __name__ == "__main__":
    main()
