"""Isolate which gn_swish Pallas kernel diverges compiled-vs-interpret on TPU."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mas_tpu.ops.pallas.gn_swish import (_gn_swish_fwd_stats_pallas,
                                         _gn_swish_bwd_pallas)


def cmp(name, a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    err = np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-3))
    print(f"{name:>12}: max_rel {err:.3e}  {'FAIL' if err > 1e-3 else 'ok'}",
          flush=True)
    return err


def main():
    shape = tuple(int(v) for v in (sys.argv[1:] or [2, 64, 64, 128]))
    print("shape", shape, flush=True)
    b, h, w, c = shape
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    x = (jax.random.normal(k[0], shape, jnp.float32) * 2).astype(jnp.bfloat16)
    scale = 1.0 + 0.1 * jax.random.normal(k[1], (c,), jnp.float32)
    bias = 0.1 * jax.random.normal(k[2], (c,), jnp.float32)
    g = jax.random.normal(k[3], shape, jnp.float32).astype(jnp.bfloat16)

    yc, sc_ = _gn_swish_fwd_stats_pallas(x, scale, bias, 32, 1e-6, False)
    yi, si = _gn_swish_fwd_stats_pallas(x, scale, bias, 32, 1e-6, True)
    cmp("fwd out", yc, yi)
    cmp("fwd stats", sc_, si)

    stats = si  # identical stats into both bwd paths
    dc = _gn_swish_bwd_pallas(x, g, scale, bias, stats, 32, False)
    di = _gn_swish_bwd_pallas(x, g, scale, bias, stats, 32, True)
    for name, a_, b_ in zip(("dx", "dgamma", "dbeta"), dc, di):
        cmp(name, a_, b_)


if __name__ == "__main__":
    main()
