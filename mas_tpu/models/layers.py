"""Conv building blocks for the VQ autoencoders (NHWC, TPU-native layouts).

Semantics match the *active* reference modules
(``/root/reference/models/modules.py``): GroupNorm(32, eps=1e-6) -> swish
prologues (35-41), ResnetBlock (84-136), single-head 2-D AttnBlock (139-191),
nearest-2x Upsample (44-59), and stride-2 Downsample with the asymmetric
(0,1,0,1) pad (62-81).  Data layout is NHWC and kernels HWIO throughout — the
TPU conv layout — instead of the reference's NCHW/OIHW.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.norms import group_norm_swish, group_norm, swish


class GroupNormSwish(nn.Module):
    """GroupNorm(32, eps=1e-6) followed by swish, fused on TPU."""

    num_groups: int = 32
    eps: float = 1e-6
    impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return group_norm_swish(x, scale, bias, self.num_groups, self.eps,
                                impl=self.impl)


class GroupNorm(nn.Module):
    num_groups: int = 32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return group_norm(x, scale, bias, self.num_groups, self.eps)


def conv(features: int, kernel: int = 3, stride: int = 1,
         padding="SAME", name: Optional[str] = None,
         dtype=None) -> nn.Conv:
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=padding, name=name, dtype=dtype)


class ResnetBlock(nn.Module):
    """GN->swish->conv3x3 twice, with a 1x1 ``nin_shortcut`` on channel change
    (reference ``modules.py:84-136``; ``conv_shortcut`` variant is never used
    by the reference configs, so only the 1x1 shortcut is built)."""

    out_channels: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None
    gn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        in_channels = x.shape[-1]
        h = GroupNormSwish(impl=self.gn_impl, name="norm1")(x)
        h = conv(self.out_channels, name="conv1", dtype=self.dtype)(h)
        h = GroupNormSwish(impl=self.gn_impl, name="norm2")(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = conv(self.out_channels, name="conv2", dtype=self.dtype)(h)
        if in_channels != self.out_channels:
            x = conv(self.out_channels, kernel=1, name="nin_shortcut",
                     dtype=self.dtype)(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head 2-D self-attention at the bottleneck
    (reference ``modules.py:139-191``): 1x1 convs for q/k/v/proj, softmax over
    the h*w positions, residual.  Runs as one batched einsum on the MXU."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hn = GroupNorm(name="norm")(x)
        q = conv(c, kernel=1, name="q", dtype=self.dtype)(hn)
        k = conv(c, kernel=1, name="k", dtype=self.dtype)(hn)
        v = conv(c, kernel=1, name="v", dtype=self.dtype)(hn)
        q = q.reshape(b, h * w, c)
        k = k.reshape(b, h * w, c)
        v = v.reshape(b, h * w, c)
        scores = jnp.einsum("bqc,bkc->bqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (c ** -0.5)
        attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(b, h, w, c)
        out = conv(c, kernel=1, name="proj_out", dtype=self.dtype)(out)
        return x + out


class Downsample(nn.Module):
    """Asymmetric (0,1,0,1) pad + stride-2 VALID conv
    (reference ``modules.py:62-81``): pad bottom/right by one, no top/left."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(c, (3, 3), strides=(2, 2), padding="VALID",
                       name="conv", dtype=self.dtype)(x)


class Upsample(nn.Module):
    """Nearest-neighbor 2x + conv3x3 (reference ``modules.py:44-59``)."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return conv(c, name="conv", dtype=self.dtype)(x)


class SyncBatchNorm(nn.Module):
    """BatchNorm whose batch statistics span all data-parallel replicas.

    The reference wraps ``quant_conv`` in ``nn.SyncBatchNorm``
    (``models/vqvae.py:14-17``).  Under pjit/jit global-view SPMD a plain
    ``jnp.mean`` over the (sharded) batch axis *is* a cross-replica mean —
    XLA inserts the collective — so no explicit psum is needed.  When used
    inside ``shard_map`` (per-shard view), pass ``axis_name`` and the stats
    are pmean-ed explicitly.
    """

    momentum: float = 0.9   # torch BatchNorm default momentum 0.1 => 0.9 decay
    eps: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            mean_sq = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean_sq = jax.lax.pmean(mean_sq, self.axis_name)
            var = mean_sq - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return ((x.astype(jnp.float32) - mean) * inv + bias).astype(x.dtype)
