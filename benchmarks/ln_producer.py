"""Producer-epilogue LN stats fusion: the last named train-MFU lever.

BASELINE's LN postmortem chain (results/train_levers.txt): the all-LN
identity bound is 87 ms of an 824 ms batch-16 flagship step; a fused
one-pass Pallas LN recovered 13% of it and the LN->matmul fold +2.1 ms —
so the cost is the fp32 stats REDUCTIONS over the residual stream, and
the only remaining idea is computing those stats in the epilogue of the
op that PRODUCES the residual, so the stream is never re-read.

Two of the four sandwich LNs per layer consume a residual produced by a
plain add (``x + attn_out`` -> ln_out's input; ``x + mlp_out`` -> the
next layer's ln_in input); the other two consume matmul outputs whose
producer is XLA's own MXU kernel (not expressible without replacing
XLA's matmul — the decode-kernel/GN-bwd/fused-LN history says that
trade loses).  This harness measures the expressible half in isolation
at the exact flagship residual shape:

  A. jnp baseline:       y = LN(a + b) @ W        (what the step compiles)
  B. pallas add+stats:   (x, mean, rstd) = one-pass kernel over (a, b);
                         y = ((x-mean)*rstd*g + beta) @ W
                         (normalize fuses into the consumer matmul read;
                          the stats never re-stream the residual)

fwd-only and fwd+bwd (B's VJP = jnp recompute, the gn_swish_fwd_only
pattern — a producer fusion cannot address the backward's dstats
reductions, which bound its ceiling to the forward stats share).

Run: python benchmarks/ln_producer.py   (real TPU, ~3 min)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, D = 16, 1408, 1024
EPS = 1e-5
CHAIN = 20


def _add_stats_kernel(a_ref, b_ref, x_ref, stats_ref):
    a = a_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    x32 = a + b
    xb = x32.astype(x_ref.dtype)
    x_ref[...] = xb
    # stats from the bf16-rounded tensor: same numbers the jnp LN sees
    xf = xb.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)               # [T, 1]
    var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
    stats_ref[:, 0:1] = mean
    stats_ref[:, 1:2] = jax.lax.rsqrt(var + EPS)


@functools.partial(jax.jit, static_argnames=("interpret",))
def add_stats_pallas(a, b, interpret=False):
    """(a + b, row stats) in one pass: returns (x bf16, stats [rows, 2])."""
    rows, d = a.shape
    tile = 512
    assert rows % tile == 0
    return pl.pallas_call(
        _add_stats_kernel,
        grid=(rows // tile,),
        in_specs=[pl.BlockSpec((tile, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, d), a.dtype),
            jax.ShapeDtypeStruct((rows, 2), jnp.float32),
        ],
        interpret=interpret,
    )(a, b)


def normalize_with(x, stats, g, beta, dtype):
    xf = x.astype(jnp.float32)
    out = ((xf - stats[:, 0:1]) * stats[:, 1:2] * g.astype(jnp.float32)
           + beta.astype(jnp.float32))
    return out.astype(dtype)


@jax.custom_vjp
def add_ln_producer(a, b, g, beta):
    x, stats = add_stats_pallas(a, b)
    return x, normalize_with(x, stats, g, beta, a.dtype)


def _jnp_add_ln(a, b, g, beta):
    x = a + b
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = ((xf - mean) * jax.lax.rsqrt(var + EPS) * g.astype(jnp.float32)
           + beta.astype(jnp.float32))
    return x, out.astype(a.dtype)


def _producer_fwd(a, b, g, beta):
    y = add_ln_producer(a, b, g, beta)
    return y, (a, b, g, beta)


def _producer_bwd(res, ct):
    a, b, g, beta = res
    _, vjp = jax.vjp(_jnp_add_ln, a, b, g, beta)
    return vjp(ct)


add_ln_producer.defvjp(_producer_fwd, _producer_bwd)


def bench(name, fn, args, grad=False):
    if grad:
        f = jax.grad(lambda *a_: jnp.sum(fn(*a_).astype(jnp.float32)))
    else:
        f = fn

    @jax.jit
    def chain(a, b, g, beta, w):
        # both paths map [rows, D] -> [rows, D] (and grad-w.r.t.-arg0 has
        # arg0's shape), so the output feeds the next iteration directly —
        # one dispatch, CHAIN serialized steps.  Reduce to a scalar inside
        # the jit: block_until_ready() is a no-op under the axon tunnel,
        # so completion is forced by the float() host transfer below.
        def body(_, carry):
            return f(carry, b, g, beta, w).astype(carry.dtype)
        out = jax.lax.fori_loop(0, CHAIN, body, a)
        return jnp.sum(out.astype(jnp.float32))

    float(chain(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(chain(*args))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts) * 1e3 / CHAIN)
    print(f"{name:42s} {ms:8.3f} ms/iter", flush=True)
    return ms


def main():
    print(f"backend={jax.default_backend()}  residual [{B}x{T}, {D}] bf16, "
          f"x{CHAIN} chained", flush=True)
    rows = B * T
    k = jax.random.split(jax.random.PRNGKey(0), 5)
    a = jax.random.normal(k[0], (rows, D), jnp.float32).astype(jnp.bfloat16)
    b = jax.random.normal(k[1], (rows, D), jnp.float32).astype(jnp.bfloat16)
    g = 1.0 + 0.1 * jax.random.normal(k[2], (D,), jnp.float32)
    beta = 0.1 * jax.random.normal(k[3], (D,), jnp.float32)
    w = jax.random.normal(k[4], (D, D), jnp.float32).astype(jnp.bfloat16) \
        * 0.02

    # parity first
    xp, yp = add_ln_producer(a, b, g, beta)
    xj, yj = _jnp_add_ln(a, b, g, beta)
    ex = float(jnp.max(jnp.abs(xp.astype(jnp.float32)
                               - xj.astype(jnp.float32))))
    ey = float(jnp.max(jnp.abs(yp.astype(jnp.float32)
                               - yj.astype(jnp.float32))))
    print(f"parity: x {ex:.2e}  ln {ey:.2e}", flush=True)
    assert ex == 0.0 and ey < 3e-2, (ex, ey)

    # x (the residual) stays live downstream exactly like the real layer:
    # x_next = x + branch(LN(x)); without the + x XLA could DCE the
    # kernel's residual output and flatter the producer path
    def jnp_path(a_, b_, g_, beta_, w_):
        x_, t = _jnp_add_ln(a_, b_, g_, beta_)
        return x_ + (t @ w_).astype(x_.dtype)

    def producer_path(a_, b_, g_, beta_, w_):
        x_, t = add_ln_producer(a_, b_, g_, beta_)
        return x_ + (t @ w_).astype(x_.dtype)

    fj = bench("fwd  jnp LN(a+b) @ W", jnp_path, (a, b, g, beta, w))
    fp = bench("fwd  pallas add+stats, normalize in read",
               producer_path, (a, b, g, beta, w))
    gj = bench("fwd+bwd jnp", jnp_path, (a, b, g, beta, w), grad=True)
    gp = bench("fwd+bwd producer (jnp-recompute VJP)",
               producer_path, (a, b, g, beta, w), grad=True)
    print(f"fwd delta {100 * (fj - fp) / fj:+.1f}%   "
          f"fwd+bwd delta {100 * (gj - gp) / gj:+.1f}%   "
          f"(positive = producer kernel wins)", flush=True)
    # scale the verdict: 48 residual-LN sites/step at the flagship batch-16
    # geometry, 824 ms step, 87 ms all-LN bound
    per_site = (gj - gp)
    print(f"implied step-level ceiling: {48 * per_site:+.1f} ms of 824 ms "
          f"({48 * per_site / 824 * 100:+.1f}% step) if all 48 "
          f"residual-LN sites fused", flush=True)


if __name__ == "__main__":
    main()
