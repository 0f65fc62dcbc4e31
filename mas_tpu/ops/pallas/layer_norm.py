"""Fused LayerNorm as one-pass Pallas TPU kernels (fwd + bwd).

The flagship transformer spends 12.4% of its train step in the four
sandwich LayerNorms per layer (measured: `train_profile.py --levers`,
round 4 — replacing every LN with identity moved 829 -> 726 ms/step at
batch 16/1408 tok).  XLA lowers the jnp LN as separate reduce and map
fusions, so the activation streams HBM 3x fwd (reduce mean, reduce var,
apply) and ~4x bwd.  These kernels tile rows into VMEM and do the whole
thing per pass: fwd = 1 read + 1 write, bwd = 2 reads + 1 write with
the row stats recomputed on the VMEM-resident tile (cheaper than
streaming saved stats back from HBM — Mosaic also rejects the [1, tile]
stat blocks outright) and the dscale/dbias cross-row reduction
accumulated in a VMEM-resident output block.

Semantics match ``mas_tpu.ops.norms.layer_norm`` (fp32 stats regardless
of input dtype, biased variance, eps inside the rsqrt); reference LN
call sites: ``/root/reference/models/transformer.py:142-210`` (sandwich
LN), ``:267-268`` (final LN).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(rows: int, d: int, bufs: int) -> int:
    """Largest power-of-two row tile dividing ``rows`` whose ``bufs``
    fp32 [tile, d] working buffers stay within ~12 MB of VMEM."""
    budget = (12 << 20) // (bufs * d * 4)
    for t in (1024, 512, 256, 128, 64, 32, 16, 8):
        if t <= budget and rows % t == 0:
            return t
    return 0


def _stats(x, eps):
    mean = jnp.mean(x, axis=1, keepdims=True)                # [T, 1]
    var = jnp.mean(jnp.square(x - mean), axis=1, keepdims=True)
    return mean, jax.lax.rsqrt(var + eps)


def _fwd_kernel(x_ref, scale_ref, bias_ref, out_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)                       # [T, D]
    mean, rstd = _stats(x, eps)
    y = (x - mean) * rstd
    out_ref[...] = (y * scale_ref[...].astype(jnp.float32)
                    + bias_ref[...].astype(jnp.float32)).astype(out_ref.dtype)


def _bwd_kernel(x_ref, g_ref, scale_ref, dx_ref, dsb_ref, *, eps):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dsb_ref[...] = jnp.zeros_like(dsb_ref)

    x = x_ref[...].astype(jnp.float32)                       # [T, D]
    g = g_ref[...].astype(jnp.float32)
    mean, rstd = _stats(x, eps)                              # recomputed
    xhat = (x - mean) * rstd
    gs = g * scale_ref[...].astype(jnp.float32)
    m1 = jnp.mean(gs, axis=1, keepdims=True)
    m2 = jnp.mean(gs * xhat, axis=1, keepdims=True)
    dx_ref[...] = (rstd * (gs - m1 - xhat * m2)).astype(dx_ref.dtype)
    # cross-row param grads: accumulate into the (constant-index, hence
    # VMEM-resident) output block; flushed to HBM once after the last tile
    dsb_ref[0:1, :] += jnp.sum(g * xhat, axis=0, keepdims=True)
    dsb_ref[1:2, :] += jnp.sum(g, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _ln_fwd_pallas(x2, scale, bias, eps, interpret=False):
    n, d = x2.shape
    tile = _pick_tile(n, d, bufs=4)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * n * d, transcendentals=n,
            bytes_accessed=2 * n * d * x2.dtype.itemsize),
        interpret=interpret,
    )(x2, scale.reshape(1, d), bias.reshape(1, d))
    return out


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _ln_bwd_pallas(x2, g2, scale, eps, interpret=False):
    n, d = x2.shape
    tile = _pick_tile(n, d, bufs=7)
    dx, dsb = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, d), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), g2.dtype),
            jax.ShapeDtypeStruct((2, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=14 * n * d, transcendentals=n,
            bytes_accessed=3 * n * d * x2.dtype.itemsize),
        interpret=interpret,
    )(x2, g2, scale.reshape(1, d))
    return dx, dsb[0], dsb[1]


def _jnp_forward(x, scale, bias, eps):
    from ..norms import layer_norm
    return layer_norm(x, scale, bias, eps)


def _supported(x) -> bool:
    if jax.default_backend() != "tpu" or x.ndim < 2:
        return False
    n = 1
    for s in x.shape[:-1]:
        n *= s
    # below ~4k rows (e.g. the sampler's per-token [B, 1, D] LNs) the
    # kernel dispatch costs more than the saved HBM pass — stay on jnp
    return (n >= 4096 and x.shape[-1] % 128 == 0
            and _pick_tile(n, x.shape[-1], bufs=7) != 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def ln_pallas(x, scale, bias, eps=1e-5):
    """LayerNorm over the last axis; Pallas on TPU, jnp fallback."""
    if not _supported(x):
        return _jnp_forward(x, scale, bias, eps)
    d = x.shape[-1]
    return _ln_fwd_pallas(x.reshape(-1, d), scale, bias, eps).reshape(x.shape)


def _fwd(x, scale, bias, eps):
    return ln_pallas(x, scale, bias, eps), (x, scale, bias)


def _bwd(eps, res, g):
    x, scale, bias = res
    if not _supported(x):
        # jnp fallback: recompute the vjp through the reference (XLA fuses)
        _, vjp = jax.vjp(
            lambda x_, s_, b_: _jnp_forward(x_, s_, b_, eps), x, scale, bias)
        return vjp(g)
    d = x.shape[-1]
    dx, dscale, dbias = _ln_bwd_pallas(
        x.reshape(-1, d), g.reshape(-1, d), scale, eps)
    return (dx.reshape(x.shape), dscale.astype(scale.dtype),
            dbias.astype(scale.dtype))


ln_pallas.defvjp(_fwd, _bwd)
