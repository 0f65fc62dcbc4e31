"""Normalization + activation primitives (NHWC, TPU-friendly).

The reference applies GroupNorm(32, eps=1e-6) -> swish before almost every
conv (``/root/reference/models/modules.py:35-41,119-128``).  On TPU the
normalize+affine+swish tail fuses into the producing/consuming HLO, so the
jnp path is already bandwidth-optimal for the elementwise part; the fused
Pallas kernel (``mas_tpu.ops.pallas.gn_swish``) additionally keeps the
two-pass statistics in VMEM for the large early-stage activations.
"""

from __future__ import annotations

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
    """Fused GroupNorm -> swish. ``impl``: 'auto' | 'jnp' | 'pallas'."""
    if impl == "pallas" or (impl == "auto" and _use_pallas()):
        from .pallas.gn_swish import gn_swish_pallas
        return gn_swish_pallas(x, scale, bias, num_groups=num_groups, eps=eps)
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


def _use_pallas() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
