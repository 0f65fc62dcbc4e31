"""Per-layer flash timing inside a 24-iteration scan (the only timing
methodology that survives the axon tunnel's ~35 ms per-call floor).

Measures the round-3 single-pass specialization (no recurrence ops +
row-bound mask) against the recorded round-2 numbers
(auto_blocks docstring: blk=(128, T) fwd 4.9 ms/layer, fwd+bwd 13.8).

Run: python benchmarks/flash_singlepass.py  (real TPU, ~3 min)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mas_tpu.ops.attention import flash_attention

B, H, D = 16, 16, 64
LAYERS = 24
PREFIX = 384


def timed(fn, *args, iters=5):
    out = fn(*args)
    float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
        ts.append(time.time() - t0)
    return float(np.median(ts) * 1e3) / LAYERS


def main():
    for t in (640, 1408):
        rng = jax.random.PRNGKey(0)
        q, k, v = (jax.random.normal(r, (B, H, t, D), jnp.bfloat16)
                   for r in jax.random.split(rng, 3))

        # (128, t) = shipped single-pass; t//2 splits let the bwd kernels'
        # lo/hi bounds actually SKIP masked halves (at blk_k=t the bwd
        # computes the full t x t score matrix, mask-only); 128 = the
        # small-block loser kept for reference
        # blk_k sits in sublane position of the k/v blocks (8-divisible is
        # enough; score-tile lanes pad to the next 128 internally)
        half = t // 2 if (t // 2) % 8 == 0 else t
        # band=True re-runs the single-pass config through the band-split
        # drivers (attention.BAND_SPLIT opt-in; see _band_ok docstring)
        cfgs = [(128, t, False), (128, t, True), (128, half, False),
                (256, half, False), (128, 128, False)]
        seen = set()
        cfgs = [c for c in cfgs
                if t % c[0] == 0 and t % c[1] == 0
                and not (c in seen or seen.add(c))]
        for blk_q, blk_k, band in cfgs:
            import mas_tpu.ops.attention as A
            A.BAND_SPLIT = band
            @jax.jit
            def fwd_scan(q, k, v, bq=blk_q, bk=blk_k):
                def body(c, _):
                    o = flash_attention(c, k, v, PREFIX, bq, bk)
                    return o, ()
                o, _ = jax.lax.scan(body, q, None, length=LAYERS)
                return o.astype(jnp.float32).mean()

            @jax.jit
            def full_scan(q, k, v, bq=blk_q, bk=blk_k):
                def body(c, _):
                    f = lambda x: jnp.sum(
                        flash_attention(x, k, v, PREFIX, bq, bk)
                        .astype(jnp.float32))
                    g = jax.grad(f)(c)
                    return g.astype(c.dtype), ()
                o, _ = jax.lax.scan(body, q, None, length=LAYERS)
                return o.astype(jnp.float32).mean()

            fwd_ms = timed(fwd_scan, q, k, v)
            full_ms = timed(full_scan, q, k, v)
            # visible-fraction model flops
            vis = (PREFIX * PREFIX + (t * t - PREFIX * PREFIX
                                      + t - PREFIX) / 2) / (t * t)
            fwd_tf = 2 * 2 * B * H * t * t * D * vis / 1e12
            tag = " banded" if band else ""
            print(f"T={t} blk=({blk_q},{blk_k}){tag}: fwd {fwd_ms:6.2f} "
                  f"ms/layer ({fwd_tf / fwd_ms * 1e3:5.1f} TF/s vis) "
                  f"fwd+bwd {full_ms:6.2f} ms/layer", flush=True)
            A.BAND_SPLIT = False


if __name__ == "__main__":
    main()
