"""PatchGAN discriminator (pix2pix-style), TPU-native NHWC.

Rebuilds the reference ``Discriminator`` (``/root/reference/losses/
discriminator.py:8-38``): a Conv4x4-stride2 + LeakyReLU(0.2) ladder with
BatchNorm, ``n_layers=3``, 64 base filters, emitting a 1-channel patch logit
map.  Weight init normal(0, 0.02); BatchNorm scale normal(1, 0.02)
(reference ``weights_init``, ``discriminator.py:41-48``).

TPU notes: NHWC layout; convs are 4x4 so they map straight onto the MXU via
XLA's conv lowering; BatchNorm statistics are computed in fp32.  Under SPMD
the batch axis is sharded, so batch statistics are per-replica during the
train step unless wrapped with a cross-replica axis — the discriminator is a
small tower (≈2.7M params) and the reference likewise never syncs its BN, so
per-replica stats are the faithful semantics here (the reference only
SyncBatchNorms the VQ ``quant_conv``, ``models/vqvae.py:16``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

_CONV_INIT = nn.initializers.normal(stddev=0.02)
_BN_SCALE_INIT = nn.initializers.normal(stddev=0.02)


def _bn_scale_init(key, shape, dtype=jnp.float32):
    # normal(mean=1.0, std=0.02), reference discriminator.py:46
    return 1.0 + _BN_SCALE_INIT(key, shape, dtype)


class PatchDiscriminator(nn.Module):
    """x [B, H, W, C] -> patch logits [B, H/8, W/8, 1] (with n_layers=3)."""

    input_channels: int = 3
    base_filters: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = (4, 4)
        h = nn.Conv(self.base_filters, kw, strides=(2, 2), padding=1,
                    kernel_init=_CONV_INIT, name="conv_0")(x)
        h = nn.leaky_relu(h, negative_slope=0.2)
        nf_mult = 1
        for n in range(1, self.n_layers + 1):
            nf_mult = min(2 ** n, 8)
            stride = 2 if n < self.n_layers else 1
            h = nn.Conv(self.base_filters * nf_mult, kw,
                        strides=(stride, stride), padding=1, use_bias=False,
                        kernel_init=_CONV_INIT, name=f"conv_{n}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, scale_init=_bn_scale_init,
                             dtype=jnp.float32, name=f"bn_{n}")(h)
            h = nn.leaky_relu(h, negative_slope=0.2)
        logits = nn.Conv(1, kw, strides=(1, 1), padding=1,
                         kernel_init=_CONV_INIT, name="conv_out")(h)
        return logits


def hinge_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    """Discriminator hinge loss (reference ``loss_img.py:11-15``)."""
    loss_real = jnp.mean(jax.nn.relu(1.0 - logits_real.astype(jnp.float32)))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + logits_fake.astype(jnp.float32)))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    """Non-saturating BCE variant (reference ``loss_img.py:18-21``)."""
    real = jnp.mean(jax.nn.softplus(-logits_real.astype(jnp.float32)))
    fake = jnp.mean(jax.nn.softplus(logits_fake.astype(jnp.float32)))
    return 0.5 * (real + fake)


def generator_loss(logits_fake: jax.Array) -> jax.Array:
    """g_loss = -mean D(rec) (reference ``loss_img.py:108-111``)."""
    return -jnp.mean(logits_fake.astype(jnp.float32))


def adopt_weight(weight: float, step: jax.Array,
                 threshold: int, value: float = 0.0) -> jax.Array:
    """Gate ``weight`` to ``value`` until ``step >= threshold``
    (reference ``loss_img.py:24-27``)."""
    return jnp.where(step >= threshold,
                     jnp.float32(weight), jnp.float32(value))
