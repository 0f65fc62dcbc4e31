"""Vector-quantization primitives: fused L2 distance + argmin.

The reference computes a full [N, K] distance matrix in HBM and argmins it
(``/root/reference/models/modules.py:501-505``).  The TPU-native version
tiles latents over a Pallas grid, keeps the codebook resident in VMEM, and
never materializes the distance matrix in HBM — the MXU computes the
``-2 z @ e^T`` term per tile and the VPU folds in the norms and running
argmin.  ``vq_argmin`` returns indices only (what the straight-through
estimator needs); the embedding gather happens outside with ``jnp.take``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

TILE_N = 1024
_OUT_ROWS = 8  # indices emitted as (8, TILE_N // 8) tiles (Mosaic tiling rule)


def vq_argmin_jnp(z: jax.Array, codebook: jax.Array) -> jax.Array:
    """Reference implementation: z [N, D], codebook [K, D] -> indices [N]."""
    zf = z.astype(jnp.float32)
    cf = codebook.astype(jnp.float32)
    d = (jnp.sum(zf * zf, axis=1, keepdims=True)
         + jnp.sum(cf * cf, axis=1)[None, :]
         - 2.0 * jnp.dot(zf, cf.T, precision=jax.lax.Precision.HIGHEST))
    return jnp.argmin(d, axis=1).astype(jnp.int32)


def _vq_kernel(z_ref, cb_ref, cb_sq_ref, idx_ref):
    """One grid step: a [TILE_N, D] tile of latents vs the full codebook."""
    z = z_ref[...].astype(jnp.float32)                    # [T, D]
    cb = cb_ref[...].astype(jnp.float32)                  # [K, D]
    cb_sq = cb_sq_ref[...].astype(jnp.float32)            # [1, K]
    # MXU: cross term; ||z||^2 is constant per row so it never affects argmin.
    # HIGHEST precision keeps argmin bit-identical to the fp32 jnp path.
    scores = jax.lax.dot_general(
        z, cb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)              # [T, K] = z @ cb^T
    d = cb_sq - 2.0 * scores
    idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    idx_ref[...] = idx.reshape(_OUT_ROWS, TILE_N // _OUT_ROWS)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _vq_argmin_pallas(z: jax.Array, codebook: jax.Array,
                      interpret: bool = False) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = z.shape
    k = codebook.shape[0]
    n_pad = -n % TILE_N
    if n_pad:
        z = jnp.pad(z, ((0, n_pad), (0, 0)))
    n_tiles = (n + n_pad) // TILE_N
    cb_sq = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=1)[None, :]

    cols = TILE_N // _OUT_ROWS
    idx = pl.pallas_call(
        _vq_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_N, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_OUT_ROWS, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * _OUT_ROWS, cols), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * (n + n_pad) * k * d,
            bytes_accessed=(n + n_pad) * d * 4 + k * d * 4 + (n + n_pad) * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(z, codebook, cb_sq)
    return idx.reshape(-1)[:n]


def vq_argmin(z: jax.Array, codebook: jax.Array, impl: str = "auto") -> jax.Array:
    """Nearest-codebook-entry indices. z [N, D], codebook [K, D] -> [N] int32.

    impl: 'auto' (pallas on TPU, jnp elsewhere) | 'jnp' | 'pallas' |
    'pallas_interpret' (for CPU tests).

    Indices are integers, so this op has no gradient; inputs are
    stop-gradiented so the Pallas kernel (which has no autodiff rule) can sit
    inside a differentiated train step.
    """
    z = jax.lax.stop_gradient(z)
    codebook = jax.lax.stop_gradient(codebook)
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    if impl == "jnp":
        return vq_argmin_jnp(z, codebook)
    if impl == "pallas":
        return _vq_argmin_pallas(z, codebook)
    if impl == "pallas_interpret":
        return _vq_argmin_pallas(z, codebook, interpret=True)
    raise ValueError(f"unknown impl {impl!r}")


def vq_quantize(z: jax.Array, codebook: jax.Array, impl: str = "auto"):
    """Quantize latents: returns (z_q, indices). z [..., D] any leading shape."""
    lead = z.shape[:-1]
    flat = z.reshape(-1, z.shape[-1])
    idx = vq_argmin(flat, codebook, impl=impl)
    z_q = jnp.take(codebook, idx, axis=0).reshape(*lead, codebook.shape[-1])
    return z_q, idx.reshape(lead)
