"""Fused GroupNorm(32, eps) + Swish as a two-pass Pallas TPU kernel.

Replaces the reference's GroupNorm->swish prologue of every ResnetBlock conv
(``/root/reference/models/modules.py:119-128``).  Grid = (batch, phase, row
tiles); phase 0 accumulates per-group sum/sum-of-squares in VMEM scratch,
phase 1 re-streams the tiles and writes swish(norm(x)*scale+bias).  Stats
never touch HBM.  Differentiable via a custom VJP whose backward recomputes
through the jnp reference (XLA fuses it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(rows: int, channels: int = 128) -> int:
    """Largest power-of-two row tile with in+out double-buffered blocks
    fitting comfortably in VMEM: 4 * tile * C * 4B <= ~8MB."""
    budget = (8 << 20) // (16 * channels)
    for t in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if t <= budget and rows % t == 0:
            return t
    return 0


def _kernel(x_ref, scale_ref, bias_ref, g_map_ref, out_ref, acc_ref, *,
            eps, inv_count):
    """g_map [C, G] is the channel->group one-hot; group reductions and the
    per-channel broadcast are MXU matmuls (Mosaic rejects 3-D reshapes of a
    VMEM tile, so no [T, G, C/G] view)."""
    phase = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when(jnp.logical_and(phase == 0, t == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(phase == 0)
    def _():
        x = x_ref[0].astype(jnp.float32)                    # [T, C]
        g_map = g_map_ref[...].astype(jnp.float32)          # [C, G]
        col = jnp.sum(x, axis=0, keepdims=True)             # [1, C]
        col_sq = jnp.sum(x * x, axis=0, keepdims=True)
        acc_ref[0:1, :] += jnp.dot(col, g_map,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
        acc_ref[1:2, :] += jnp.dot(col_sq, g_map,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)

    @pl.when(phase == 1)
    def _():
        x = x_ref[0].astype(jnp.float32)
        g_map = g_map_ref[...].astype(jnp.float32)          # [C, G]
        mean = acc_ref[0:1, :] * inv_count                  # [1, G]
        var = acc_ref[1:2, :] * inv_count - mean * mean
        rstd = jax.lax.rsqrt(var + eps)
        # broadcast group stats back to channels: [1, G] @ [G, C]
        mean_c = jnp.dot(mean, g_map.T, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        rstd_c = jnp.dot(rstd, g_map.T, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        a = (x - mean_c) * rstd_c
        a = a * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
        out_ref[0] = (a * jax.nn.sigmoid(a)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "interpret"))
def _gn_swish_fwd_pallas(x, scale, bias, num_groups, eps, interpret=False):
    b, h, w, c = x.shape
    rows = h * w
    tile = _pick_tile(rows, c)
    assert tile, f"rows {rows} has no power-of-two tile divisor"
    n_tiles = rows // tile
    xr = x.reshape(b, rows, c)
    scale2 = scale.reshape(1, c)
    bias2 = bias.reshape(1, c)
    inv_count = 1.0 / (rows * (c // num_groups))
    cpg = c // num_groups
    g_map = (jnp.arange(c)[:, None] // cpg
             == jnp.arange(num_groups)[None, :]).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, inv_count=inv_count),
        grid=(b, 2, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda b_, p, t: (b_, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b_, p, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b_, p, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, num_groups), lambda b_, p, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda b_, p, t: (b_, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rows, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((2, num_groups), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * rows * c, bytes_accessed=3 * b * rows * c * 4,
            transcendentals=b * rows * c),
        interpret=interpret,
    )(xr, scale2, bias2, g_map)
    return out.reshape(b, h, w, c)


def _jnp_forward(x, scale, bias, num_groups, eps):
    from ..norms import group_norm, swish
    return swish(group_norm(x, scale, bias, num_groups, eps))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gn_swish_pallas(x, scale, bias, num_groups=32, eps=1e-6):
    if (jax.default_backend() != "tpu"
            or _pick_tile(x.shape[1] * x.shape[2], x.shape[-1]) == 0
            or x.shape[-1] % num_groups):
        return _jnp_forward(x, scale, bias, num_groups, eps)
    return _gn_swish_fwd_pallas(x, scale, bias, num_groups, eps)


def _fwd(x, scale, bias, num_groups, eps):
    return gn_swish_pallas(x, scale, bias, num_groups, eps), (x, scale, bias)


def _bwd(num_groups, eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _jnp_forward(x_, s_, b_, num_groups, eps),
        x, scale, bias)
    return vjp(g)


gn_swish_pallas.defvjp(_fwd, _bwd)
