"""Normalization + activation primitives (NHWC, TPU-friendly).

The reference applies GroupNorm(32, eps=1e-6) -> swish before almost every
conv (``/root/reference/models/modules.py:35-41,119-128``).  On TPU the
normalize+affine+swish tail fuses into the producing/consuming HLO, so the
jnp path is already bandwidth-optimal for the elementwise part; the fused
Pallas kernel (``mas_tpu.ops.pallas.gn_swish``) additionally keeps the
two-pass statistics in VMEM for the large early-stage activations.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def swish(x: jax.Array) -> jax.Array:
    """x * sigmoid(x) (reference ``modules.py:35-37``)."""
    return x * jax.nn.sigmoid(x)


def group_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               num_groups: int = 32, eps: float = 1e-6) -> jax.Array:
    """GroupNorm over an NHWC tensor. Stats in fp32 regardless of input dtype."""
    b, h, w, c = x.shape
    assert c % num_groups == 0, f"channels {c} not divisible by {num_groups} groups"
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(b, h, w, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 4), keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(b, h, w, c)
    out = xn * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(orig_dtype)


def group_norm_swish(x: jax.Array, scale: jax.Array, bias: jax.Array,
                     num_groups: int = 32, eps: float = 1e-6,
                     impl: str = "auto") -> jax.Array:
    """Fused GroupNorm -> swish.

    ``impl``: 'auto' | 'jnp' | 'pallas' | 'pallas_fwd'.  The env var
    ``MAS_GN_IMPL`` overrides 'auto' (A/B hook used by
    ``benchmarks/gn_bwd_check.py`` / ``gan_trace.py``).

    'auto' on TPU resolves to the Pallas *forward* with the jnp-recompute
    VJP ('pallas_fwd').  The full Pallas backward passed on-chip parity
    (error class = bf16 cotangent rounding, same as dx) but LOSES on time
    — isolated: 13.0 ms vs 11.1 ms jnp over the 512^2 shape set; end-to-
    end GAN step: see results/gan_trace.txt A/B — because XLA's fused
    convert_reduce VJP already streams the activation fewer times than
    the kernel's two extra passes.  Kept opt-in as 'pallas'.
    """
    if impl == "auto":
        impl = os.environ.get("MAS_GN_IMPL", "").strip() or (
            "pallas_fwd" if _on_tpu() else "jnp")
    if impl in ("pallas", "pallas_fwd"):
        from .pallas.gn_swish import gn_swish_pallas, gn_swish_pallas_fwd_only
        fn = gn_swish_pallas if impl == "pallas" else gn_swish_pallas_fwd_only
        return fn(x, scale, bias, num_groups=num_groups, eps=eps)
    return swish(group_norm(x, scale, bias, num_groups, eps))


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               eps: float = 1e-5, impl: str = "jnp") -> jax.Array:
    """LayerNorm over the last axis, fp32 stats.

    ``impl='pallas'`` routes large-activation shapes through the fused
    one-pass kernel (``mas_tpu.ops.pallas.layer_norm``) on TPU; small
    shapes and other backends fall back to this jnp path automatically.
    """
    if impl == "pallas":
        from .pallas.layer_norm import ln_pallas
        return ln_pallas(x, scale, bias, eps)
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(orig_dtype)


def folded_ln_dense(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
                    kernel: jax.Array, bias: jax.Array,
                    eps: float = 1e-5, dtype=None) -> jax.Array:
    """``Dense(LayerNorm(x))`` without materializing ``LayerNorm(x)``.

    Algebraic fold: with ``LN(x) = r*(x - mu)*gamma + beta`` (per-row
    stats ``mu``, ``r = rsqrt(var + eps)``),

        LN(x) @ W + b
          = r * (x @ (gamma ⊙ W)) - (r*mu) * colsum + beta @ W + b

    where ``colsum_j = sum_i gamma_i W_ij`` and ``gamma ⊙ W`` scales W's
    rows (input features).  The normalized ``[..., d]`` tensor is never
    written to / re-read from HBM — the all-LN identity bound is 10.6% of
    the flagship train step and a standalone fused LN kernel recovered
    only 13% of it (``results/train_levers.txt``), because the separate
    pass still pays the full activation write+read.  Here the row stats
    fuse into the matmul's operand read and the epilogue is per-row
    scalars plus two rank-1 terms, all fusable into the matmul output.

    Matmul runs in ``dtype`` (bf16 on TPU) like flax ``Dense``; stats and
    the epilogue in fp32, matching ``layer_norm``'s fp32-stats contract.
    Folding gamma into W re-rounds the product to bf16 once — same
    rounding class as the unfused path's bf16 LN output cast.
    """
    dtype = dtype or x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)                       # [..., 1] fp32
    wf = kernel.astype(jnp.float32)
    wg = wf * ln_scale.astype(jnp.float32)[:, None]    # [din, dout] fp32
    colsum = jnp.sum(wg, axis=0)                       # [dout]
    beta_w = ln_bias.astype(jnp.float32) @ wf          # [dout]
    y = x.astype(dtype) @ wg.astype(dtype)             # MXU matmul
    out = (y.astype(jnp.float32) * r - (r * mu) * colsum
           + beta_w + bias.astype(jnp.float32))
    return out.astype(dtype)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
