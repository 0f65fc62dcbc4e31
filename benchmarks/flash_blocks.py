"""Flash-attention block-size sweep at the flagship geometry.

train_profile.py attributed 72% of the 24L/1408-token step to attention —
the flash kernels run far below the MXU bound with the round-1 (128, 128)
blocks.  1408 = 11 x 128 admits blk_q in {128, 176, 352, 704} (sublane dim:
any multiple of 8 dividing T) and blk_k in {128, 1408} (lane dim of the
score tile: must be 128-divisible AND divide T).  blk_k = T is the
single-pass regime: exact softmax, no running-max recurrence, one big MXU
dot per q block — at the cost of not skipping masked k blocks (~45% more
score flops at this mask).  Measures fwd and fwd+bwd, isolated (forced
completion), then the winner must be confirmed END-TO-END via
train_profile.py (round-1 lesson: isolated wins can lose fused).

Run: python benchmarks/flash_blocks.py  (real TPU, ~4 min)
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

B, H, T, D = 16, 16, 1408, 64
PREFIX = 384


def main():
    rng = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(r, (B, H, T, D), jnp.bfloat16)
               for r in jax.random.split(rng, 3))

    def timed(fn, *args, iters=5):
        out = fn(*args)
        jax.tree.map(lambda x: float(jnp.asarray(x).reshape(-1)[0]
                                     .astype(jnp.float32)), out)
        ts = []
        for _ in range(iters):
            t0 = time.time()
            out = fn(*args)
            jax.tree.map(lambda x: float(jnp.asarray(x).reshape(-1)[0]
                                         .astype(jnp.float32)), out)
            ts.append(time.time() - t0)
        return float(np.median(ts) * 1e3)

    # model flops (fwd): 2 matmuls over the visible ~55% of T^2
    fwd_tf = 2 * 2 * B * H * T * T * D * 0.55 / 1e12

    # the lse output block (1, 1, blk_q) pins blk_q to 128-divisible values
    for blk_q, blk_k in ((128, 128), (128, 1408), (1408, 128),
                     (1408, 1408)):
        try:
            # positional args: custom_vjp rejects kwargs
            f = jax.jit(lambda q, k, v, bq=blk_q, bk=blk_k:
                        flash_attention(q, k, v, PREFIX, bq, bk))
            fwd_ms = timed(f, q, k, v)

            def loss(q, k, v, f=f):
                return jnp.sum(f(q, k, v).astype(jnp.float32))

            g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            full_ms = timed(g, q, k, v)
            print(f"blk_q={blk_q:4d} blk_k={blk_k:4d}: "
                  f"fwd {fwd_ms:6.2f} ms ({fwd_tf / fwd_ms * 1e3:5.1f} "
                  f"TF/s)  fwd+bwd {full_ms:7.2f} ms", flush=True)
        except Exception as exn:                          # noqa: BLE001
            print(f"blk_q={blk_q:4d} blk_k={blk_k:4d}: FAILED "
                  f"{str(exn).splitlines()[0][:100]}", flush=True)


if __name__ == "__main__":
    main()
