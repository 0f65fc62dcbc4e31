"""Fused GroupNorm(32, eps) + Swish as Pallas TPU kernels (fwd + bwd).

Replaces the reference's GroupNorm->swish prologue of every ResnetBlock conv
(``/root/reference/models/modules.py:119-128``).  Forward: grid = (batch,
phase, row tiles); phase 0 accumulates per-group sum/sum-of-squares in VMEM
scratch, phase 1 re-streams the tiles and writes swish(norm(x)*scale+bias)
plus the per-(batch, group) mean/rstd as a tiny side output.  Stats never
touch HBM mid-kernel.

Backward: the round-4 GAN-step trace (results/gan_trace.txt) showed the
jnp-recompute VJP lowering as a family of fp32 ``convert_reduce`` fusions —
53.5 ms of a 320.7 ms step at 512^2 batch 2 (plus the multiply_reduce /
select_reduce relatives), i.e. the activation streams HBM several times in
fp32.  The Pallas backward reuses the saved fwd stats (skipping the stats
recompute pass entirely) and runs two tiled passes:

  reduce: recompute xhat / d_swish per tile, accumulate the per-group
          sums S1 = sum(dxhat), S2 = sum(dxhat*xhat) and the per-channel
          param grads (dbeta = sum(ga), dgamma = sum(ga*xhat)) in
          VMEM-resident constant-index output blocks;
  apply:  dx = rstd * (dxhat - (S1 + xhat*S2) / N) per group.

Group reductions and the group->channel broadcast are MXU matmuls against
the one-hot channel->group map (Mosaic rejects 3-D reshapes of a VMEM
tile, so no [T, G, C/G] view).  Total traffic: 2 reads (reduce) + 2 reads
+ 1 write (apply) of the bf16 activation vs the jnp VJP's >=3 fp32-convert
round trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(rows: int, channels: int = 128, bufs: int = 16) -> int:
    """Largest power-of-two row tile with ``bufs`` fp32-equivalent [tile, C]
    working buffers fitting comfortably in ~8MB of VMEM."""
    budget = (8 << 20) // (bufs * channels)
    for t in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if t <= budget and rows % t == 0:
            return t
    return 0


def _kernel(x_ref, scale_ref, bias_ref, g_map_ref, out_ref, stats_ref,
            acc_ref, *, eps, inv_count):
    """g_map [C, G] is the channel->group one-hot; group reductions and the
    per-channel broadcast are MXU matmuls."""
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

        @pl.when(t == 0)
        def _():
            # side output for the custom VJP: saves the bwd a full
            # stats-recompute pass over x
            stats_ref[0, 0:1, :] = mean
            stats_ref[0, 1:2, :] = rstd

        # broadcast group stats back to channels: [1, G] @ [G, C]
        mean_c = jnp.dot(mean, g_map.T, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        rstd_c = jnp.dot(rstd, g_map.T, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        a = (x - mean_c) * rstd_c
        a = a * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
        out_ref[0] = (a * jax.nn.sigmoid(a)).astype(out_ref.dtype)


def _recompute_tile(x_ref, g_ref, scale_ref, bias_ref, g_map, stats_ref):
    """Shared bwd-tile recompute: xhat, ga (= dL/da), dxhat, rstd_c."""
    x = x_ref[0].astype(jnp.float32)                        # [T, C]
    g = g_ref[0].astype(jnp.float32)
    mean = stats_ref[0, 0:1, :]                             # [1, G]
    rstd = stats_ref[0, 1:2, :]
    mean_c = jnp.dot(mean, g_map.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)   # [1, C]
    rstd_c = jnp.dot(rstd, g_map.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    scale = scale_ref[...].astype(jnp.float32)              # [1, C]
    xhat = (x - mean_c) * rstd_c
    a = xhat * scale + bias_ref[...].astype(jnp.float32)
    s = jax.nn.sigmoid(a)
    ga = g * (s * (1.0 + a * (1.0 - s)))                    # d swish
    return xhat, ga, ga * scale, rstd_c


def _bwd_reduce_kernel(x_ref, g_ref, scale_ref, bias_ref, g_map_ref,
                       stats_ref, sums_g_ref, sums_c_ref):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        sums_g_ref[...] = jnp.zeros_like(sums_g_ref)
        sums_c_ref[...] = jnp.zeros_like(sums_c_ref)

    g_map = g_map_ref[...].astype(jnp.float32)              # [C, G]
    xhat, ga, dxhat, _ = _recompute_tile(
        x_ref, g_ref, scale_ref, bias_ref, g_map, stats_ref)
    col_dxhat = jnp.sum(dxhat, axis=0, keepdims=True)       # [1, C]
    col_dxhat_xhat = jnp.sum(dxhat * xhat, axis=0, keepdims=True)
    sums_g_ref[0, 0:1, :] += jnp.dot(
        col_dxhat, g_map, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    sums_g_ref[0, 1:2, :] += jnp.dot(
        col_dxhat_xhat, g_map, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    sums_c_ref[0, 0:1, :] += jnp.sum(ga, axis=0, keepdims=True)   # dbeta
    sums_c_ref[0, 1:2, :] += jnp.sum(ga * xhat, axis=0,           # dgamma
                                     keepdims=True)


def _bwd_apply_kernel(x_ref, g_ref, scale_ref, bias_ref, g_map_ref,
                      stats_ref, sums_g_ref, dx_ref, *, inv_count):
    g_map = g_map_ref[...].astype(jnp.float32)              # [C, G]
    xhat, _, dxhat, rstd_c = _recompute_tile(
        x_ref, g_ref, scale_ref, bias_ref, g_map, stats_ref)
    s1_c = jnp.dot(sums_g_ref[0, 0:1, :], g_map.T,          # [1, C]
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    s2_c = jnp.dot(sums_g_ref[0, 1:2, :], g_map.T,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    dx_ref[0] = (rstd_c * (dxhat - (s1_c + xhat * s2_c) * inv_count)
                 ).astype(dx_ref.dtype)


def _row_specs(tile, c, num_groups, with_stats):
    """Block specs shared by the bwd kernels: x, g, scale, bias, g_map
    (+ stats)."""
    specs = [
        pl.BlockSpec((1, tile, c), lambda b_, t: (b_, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile, c), lambda b_, t: (b_, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda b_, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda b_, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, num_groups), lambda b_, t: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if with_stats:
        specs.append(pl.BlockSpec((1, 2, num_groups), lambda b_, t: (b_, 0, 0),
                                  memory_space=pltpu.VMEM))
    return specs


def _group_map(c, num_groups):
    cpg = c // num_groups
    return (jnp.arange(c)[:, None] // cpg
            == jnp.arange(num_groups)[None, :]).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "interpret"))
def _gn_swish_fwd_pallas(x, scale, bias, num_groups, eps, interpret=False):
    out, _ = _gn_swish_fwd_stats_pallas(x, scale, bias, num_groups, eps,
                                        interpret)
    return out


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "interpret"))
def _gn_swish_fwd_stats_pallas(x, scale, bias, num_groups, eps,
                               interpret=False):
    """Returns (swish(groupnorm(x)), stats[B, 2, G]) — stats rows are
    (mean, rstd) per batch x group, consumed by the Pallas VJP."""
    b, h, w, c = x.shape
    rows = h * w
    tile = _pick_tile(rows, c)
    assert tile, f"rows {rows} has no power-of-two tile divisor"
    n_tiles = rows // tile
    xr = x.reshape(b, rows, c)
    inv_count = 1.0 / (rows * (c // num_groups))

    out, stats = pl.pallas_call(
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
        out_specs=[
            pl.BlockSpec((1, tile, c), lambda b_, p, t: (b_, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, num_groups), lambda b_, p, t: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, rows, c), x.dtype),
            jax.ShapeDtypeStruct((b, 2, num_groups), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, num_groups), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * rows * c, bytes_accessed=3 * b * rows * c * 4,
            transcendentals=b * rows * c),
        interpret=interpret,
    )(xr, scale.reshape(1, c), bias.reshape(1, c), _group_map(c, num_groups))
    return out.reshape(b, h, w, c), stats


@functools.partial(jax.jit, static_argnames=("num_groups", "interpret"))
def _gn_swish_bwd_pallas(x, g, scale, bias, stats, num_groups,
                         interpret=False):
    """Pallas VJP: returns (dx, dscale, dbias).  Two tiled passes over
    (x, g) reusing the fwd stats; all accumulation fp32 in VMEM."""
    b, h, w, c = x.shape
    rows = h * w
    tile = _pick_tile(rows, c)
    assert tile, f"rows {rows} has no power-of-two tile divisor"
    n_tiles = rows // tile
    xr = x.reshape(b, rows, c)
    gr = g.reshape(b, rows, c)
    scale2 = scale.reshape(1, c)
    bias2 = bias.reshape(1, c)
    g_map = _group_map(c, num_groups)
    inv_count = 1.0 / (rows * (c // num_groups))
    nbytes = b * rows * c * x.dtype.itemsize

    sums_g, sums_c = pl.pallas_call(
        _bwd_reduce_kernel,
        grid=(b, n_tiles),
        in_specs=_row_specs(tile, c, num_groups, with_stats=True),
        out_specs=[
            pl.BlockSpec((1, 2, num_groups), lambda b_, t: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, c), lambda b_, t: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 2, num_groups), jnp.float32),
            jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=16 * b * rows * c, bytes_accessed=2 * nbytes,
            transcendentals=b * rows * c),
        interpret=interpret,
    )(xr, gr, scale2, bias2, g_map, stats)

    dx = pl.pallas_call(
        functools.partial(_bwd_apply_kernel, inv_count=inv_count),
        grid=(b, n_tiles),
        in_specs=_row_specs(tile, c, num_groups, with_stats=True) + [
            pl.BlockSpec((1, 2, num_groups), lambda b_, t: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda b_, t: (b_, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rows, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=18 * b * rows * c, bytes_accessed=3 * nbytes,
            transcendentals=b * rows * c),
        interpret=interpret,
    )(xr, gr, scale2, bias2, g_map, stats, sums_g)

    dbeta = jnp.sum(sums_c[:, 0, :], axis=0)
    dgamma = jnp.sum(sums_c[:, 1, :], axis=0)
    return (dx.reshape(x.shape), dgamma.astype(scale.dtype),
            dbeta.astype(bias.dtype))


def _jnp_forward(x, scale, bias, num_groups, eps):
    from ..norms import group_norm, swish
    return swish(group_norm(x, scale, bias, num_groups, eps))


def _supported(x, num_groups) -> bool:
    return (jax.default_backend() == "tpu"
            and _pick_tile(x.shape[1] * x.shape[2], x.shape[-1]) != 0
            and x.shape[-1] % num_groups == 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gn_swish_pallas(x, scale, bias, num_groups=32, eps=1e-6):
    if not _supported(x, num_groups):
        return _jnp_forward(x, scale, bias, num_groups, eps)
    return _gn_swish_fwd_pallas(x, scale, bias, num_groups, eps)


def _fwd(x, scale, bias, num_groups, eps):
    if not _supported(x, num_groups):
        return (_jnp_forward(x, scale, bias, num_groups, eps),
                (x, scale, bias, None))
    y, stats = _gn_swish_fwd_stats_pallas(x, scale, bias, num_groups, eps)
    return y, (x, scale, bias, stats)


def _bwd(num_groups, eps, res, g):
    x, scale, bias, stats = res
    if stats is None:
        _, vjp = jax.vjp(
            lambda x_, s_, b_: _jnp_forward(x_, s_, b_, num_groups, eps),
            x, scale, bias)
        return vjp(g)
    return _gn_swish_bwd_pallas(x, g, scale, bias, stats, num_groups)


gn_swish_pallas.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gn_swish_pallas_fwd_only(x, scale, bias, num_groups=32, eps=1e-6):
    """Pallas forward + jnp-recompute VJP (the round-4 default config).

    On-chip A/B (``benchmarks/gn_bwd_check.py``) showed XLA's fused
    convert_reduce VJP beating the Pallas two-pass backward at every
    production shape, so this is the 'auto' TPU path; the full-Pallas
    variant above stays opt-in (``MAS_GN_IMPL=pallas``).
    """
    if not _supported(x, num_groups):
        return _jnp_forward(x, scale, bias, num_groups, eps)
    return _gn_swish_fwd_pallas(x, scale, bias, num_groups, eps)


def _fwd_only_fwd(x, scale, bias, num_groups, eps):
    if not _supported(x, num_groups):
        return (_jnp_forward(x, scale, bias, num_groups, eps),
                (x, scale, bias))
    return (_gn_swish_fwd_pallas(x, scale, bias, num_groups, eps),
            (x, scale, bias))


def _fwd_only_bwd(num_groups, eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _jnp_forward(x_, s_, b_, num_groups, eps),
        x, scale, bias)
    return vjp(g)


gn_swish_pallas_fwd_only.defvjp(_fwd_only_fwd, _fwd_only_bwd)
