"""On-chip validation of the Pallas GroupNorm+swish backward (VERDICT r4 #2).

The custom-VJP backward in ``mas_tpu/ops/pallas/gn_swish.py`` landed at the
end of round 4 with CPU interpret-mode tests only, yet ``defvjp`` makes it
the default TPU gradient path for every ResnetBlock in both VQ models
(``mas_tpu/ops/norms.py:41-44``).  This harness runs it on the real chip
at every production GN shape of the 512^2 VQ-IMG model (batch 2 — the
reference's own training geometry, ``/root/reference/conf/img_config.yaml:
2-17``; hot loop ``/root/reference/train.py:60-134``).

Method: a *float32* jnp GN+swish is the oracle.  Both bf16 paths — the
Pallas custom VJP and the jnp VJP it replaces — are measured against it
with L2-normalized error per output (fwd, dx, dgamma, dbeta).  Parity
passes when the Pallas error is the same class as the jnp-bf16 error
(<= 3x + 1e-3 slack): i.e. the kernel adds no error beyond bf16 rounding.
Naive pallas-vs-jnp per-element comparison is meaningless here — dbeta is
a cancelling sum of ~1e5 zero-mean terms and the two bf16 paths round
swish at different points (jnp: bf16 swish; pallas: f32 swish), which a
first version of this check misread as a 5x "miscompile".  Compiled-vs-
interpret on identical inputs agrees to the bf16 ulp (dgamma/dbeta exact;
``benchmarks/gn_bwd_debug.py``).

Timing: the axon tunnel costs ~24 ms per dispatch, so each impl's
fwd+bwd is chained 20x inside one jit (dx feeds the next iteration) and
the per-step time is the chain time / 20.

Exit code is nonzero if any shape exceeds tolerance, so runners can gate
the default on the outcome.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# every distinct (H, W, C) a GroupNorm sees in the 512^2 VQ-IMG model,
# channels (128, 128, 128, 256, 512, 512): encoder tail + decoder head
# touch each resolution twice, once per channel width at the transitions
SHAPES = [
    (2, 512, 512, 128),
    (2, 256, 256, 128),
    (2, 128, 128, 128),
    (2, 128, 128, 256),
    (2, 64, 64, 256),
    (2, 64, 64, 512),
    (2, 32, 32, 512),
]

CHAIN = 20


def l2_err(a, ref):
    a = np.asarray(a, np.float64).ravel()
    ref = np.asarray(ref, np.float64).ravel()
    return float(np.linalg.norm(a - ref) / max(np.linalg.norm(ref), 1e-12))


def grads_of(fn, x, scale, bias, ct):
    # ct rides as an argument: a closure-captured [2,512,512,128] fp32
    # constant blows the axon compile-helper's request-size limit (413)
    def loss(x_, s_, b_, ct_):
        return jnp.sum(fn(x_, s_, b_).astype(jnp.float32) * ct_)

    out = jax.jit(fn)(x, scale, bias)
    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(x, scale, bias, ct)
    return out, grads


def bench_chain(fn, x, scale, bias, ct):
    """Median per-step ms of fwd+bwd, 20 chained steps per dispatch."""
    g = jax.grad(lambda x_, ct_: jnp.sum(
        fn(x_, scale, bias).astype(jnp.float32) * ct_))

    @jax.jit
    def chain(x_, ct_):
        def body(_, carry):
            return g(carry, ct_).astype(carry.dtype)
        return jax.lax.fori_loop(0, CHAIN, body, x_)

    chain(x, ct).block_until_ready()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        chain(x, ct).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3 / CHAIN)


def main():
    from mas_tpu.ops.norms import group_norm, swish
    from mas_tpu.ops.pallas.gn_swish import gn_swish_pallas

    print(f"backend: {jax.default_backend()}  {jax.devices()}", flush=True)
    failures = []
    rows = []
    print(f"{'shape':>22} {'out':>15} {'dx':>15} {'dgamma':>15} "
          f"{'dbeta':>15} {'pl_ms':>7} {'jnp_ms':>7}")
    for shape in SHAPES:
        b, h, w, c = shape
        key = jax.random.PRNGKey(hash(shape) % (2**31))
        k1, k2, k3, k4 = jax.random.split(key, 4)
        x32 = jax.random.normal(k1, shape, jnp.float32) * 2.0
        x = x32.astype(jnp.bfloat16)
        scale = 1.0 + 0.1 * jax.random.normal(k2, (c,), jnp.float32)
        bias = 0.1 * jax.random.normal(k3, (c,), jnp.float32)
        ct = jax.random.normal(k4, shape, jnp.float32)

        def jnp_fn(x_, s_, b_):
            return swish(group_norm(x_, s_, b_, 32, 1e-6))

        def pl_fn(x_, s_, b_):
            return gn_swish_pallas(x_, s_, b_, 32, 1e-6)

        # f32 oracle (same bf16 input so only compute precision differs)
        o_out, o_g = grads_of(jnp_fn, x.astype(jnp.float32), scale, bias, ct)
        j_out, j_g = grads_of(jnp_fn, x, scale, bias, ct)
        p_out, p_g = grads_of(pl_fn, x, scale, bias, ct)
        jax.block_until_ready((o_out, o_g, j_out, j_g, p_out, p_g))

        names = ("out", "dx", "dgamma", "dbeta")
        oracle = (o_out,) + o_g
        errs_j = [l2_err(v, r) for v, r in zip((j_out,) + j_g, oracle)]
        errs_p = [l2_err(v, r) for v, r in zip((p_out,) + p_g, oracle)]
        bad = [n for n, ep, ej in zip(names, errs_p, errs_j)
               if ep > 3.0 * ej + 1e-3]
        if bad:
            failures.append((shape, bad,
                             dict(zip(names, zip(errs_p, errs_j)))))

        tp = bench_chain(pl_fn, x, scale, bias, ct)
        tj = bench_chain(jnp_fn, x, scale, bias, ct)
        cells = [f"{ep:7.1e}/{ej:7.1e}" for ep, ej in zip(errs_p, errs_j)]
        rows.append(dict(shape=list(shape), pallas_ms=tp, jnp_ms=tj,
                         err_pallas=dict(zip(names, errs_p)),
                         err_jnp=dict(zip(names, errs_j))))
        print(f"{str(shape):>22} {cells[0]} {cells[1]} {cells[2]} "
              f"{cells[3]} {tp:7.3f} {tj:7.3f}  "
              f"{'FAIL ' + ','.join(bad) if bad else 'ok'}", flush=True)

    print("(err cells: pallas/jnp, both L2 vs f32 oracle)")
    tot_p = sum(r["pallas_ms"] for r in rows)
    tot_j = sum(r["jnp_ms"] for r in rows)
    print(f"summed fwd+bwd over all shapes: pallas {tot_p:.2f} ms  "
          f"jnp {tot_j:.2f} ms  ({tot_j / tot_p:.2f}x)")
    if failures:
        print(f"PARITY FAIL: {failures}")
        sys.exit(1)
    print("PARITY OK on all production shapes")


if __name__ == "__main__":
    main()
