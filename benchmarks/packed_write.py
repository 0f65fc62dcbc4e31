"""A/B: packed aliased cache write vs the round-2 DUS carry copy.

Times the per-layer decode pattern (write one token + masked attention
over the cache) inside a jitted ``lax.scan`` with donated carries — the
sampler's regime.  Compares:

  a. lane layout [B,H,d,T] + dynamic_update_slice (shipped round 2),
  b. packed [B,H,T,2d] + the aliased Pallas write (ops/decode_cache.py),

for int8 and int4.  Run: python benchmarks/packed_write.py  (real TPU).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mas_tpu.ops.decode_cache import (pack_quantize, update_packed_cache,
                                      decode_attention_packed)
from mas_tpu.ops.quant import (decode_attention_int8, quantize_kv,
                               update_quant_cache)

B, H, D, T = 128, 16, 64, 640
STEPS = 256
LAYERS = 24


def main():
    r = jax.random.PRNGKey(0)
    q = jax.random.normal(r, (B, H, 1, D), jnp.bfloat16)
    new = jax.random.normal(r, (B, H, 1, D), jnp.bfloat16)
    kv_seq = jax.random.normal(r, (B, H, T, D), jnp.bfloat16)

    for dtn in ("int8", "int4"):
        dt = jnp.int8 if dtn == "int8" else jnp.int4

        # (a) lane layout + DUS (round-2 shipped path)
        def lane_body(c, s, dt=dt):
            q_, kc, vc = c
            kc = update_quant_cache(kc, new.transpose(0, 1, 3, 2), s)
            vc = update_quant_cache(vc, new.transpose(0, 1, 3, 2), s)
            return (decode_attention_int8(q_, kc, vc, s)
                    .astype(jnp.bfloat16), kc, vc)

        # (b) packed + aliased pallas write
        def packed_body(c, s, dt=dt):
            q_, cache = c
            cache = update_packed_cache(cache, new, new * 0.5, s,
                                        impl="pallas")
            return (decode_attention_packed(q_, cache, s)
                    .astype(jnp.bfloat16), cache)

        # (c) packed + jnp DUS write (isolates the aliasing win)
        def packed_dus_body(c, s, dt=dt):
            q_, cache = c
            cache = update_packed_cache(cache, new, new * 0.5, s,
                                        impl="jnp")
            return (decode_attention_packed(q_, cache, s)
                    .astype(jnp.bfloat16), cache)

        def build(kv_seq, which):
            if which == "lane":
                c = quantize_kv(kv_seq.transpose(0, 1, 3, 2), dtype=dt)
                return (q, c, c)
            return (q, pack_quantize(kv_seq, kv_seq * 0.5, dtype=dt))

        # int4 leaves can't cross jit on axon (device_put recursion bug),
        # so the carries are built from bf16 donors INSIDE the timed jit;
        # the build cost is one-time work before the 256-step scan and is
        # amortized out of the per-step number.
        def timed(name, body, which):
            @jax.jit
            def run(kv_seq):
                c = build(kv_seq, which)
                def b(c, s):
                    return body(c, s), ()
                c, _ = jax.lax.scan(b, c, jnp.arange(STEPS))
                leaf = c[0]
                return leaf.astype(jnp.float32).mean()

            out = float(run(kv_seq))      # compile + run
            times = []
            for _ in range(3):
                t0 = time.time()
                out = float(run(kv_seq))
                times.append(time.time() - t0)
            dtms = sorted(times)[1] / STEPS * 1000
            print(f"{dtn} {name:48s} {dtms:7.4f} ms/step (x{LAYERS} = "
                  f"{dtms * LAYERS:6.2f} ms/token)", flush=True)

        timed("lane DUS write + attention (r2 shipped)", lane_body, "lane")
        timed("packed PALLAS write + attention", packed_body, "packed")
        timed("packed jnp DUS write + attention", packed_dus_body, "packed")


if __name__ == "__main__":
    main()
