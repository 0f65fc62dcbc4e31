"""VQ-VAE / VQGAN autoencoder, TPU-native (NHWC, bf16-capable).

Mirrors the reference ``VQBASE`` (``/root/reference/models/vqvae.py:8-39``)
and the *active* Encoder/Decoder (``models/modules.py:199-240,337-369``):

  Encoder: conv3x3 -> per stage {num_res_blocks x ResnetBlock (+Attn at
  attn_resolutions)} + Downsample (len(channels)-2 times => 16x reduction
  with defaults) -> ResnetBlock-Attn-ResnetBlock -> GN-swish-conv -> z.

  Decoder: conv3x3 -> ResnetBlock-Attn-ResnetBlock -> per stage
  {(num_res_blocks+1) x ResnetBlock (+Attn)} + Upsample -> GN-swish-conv.

The quantizer itself is functional (``mas_tpu.models.codebook``); the
codebook embedding is a param of this module so optax owns it.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.config import VQModelConfig
from .codebook import codebook_init_embedding, quantize_eval, lookup
from .layers import (AttnBlock, Downsample, GroupNormSwish, ResnetBlock,
                     SyncBatchNorm, Upsample, conv)


def _dtype(cfg: VQModelConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


class Encoder(nn.Module):
    cfg: VQModelConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        dt = _dtype(cfg)
        chans = cfg.channels
        res = cfg.resolution
        h = conv(chans[0], name="conv_in", dtype=dt)(x)
        for i in range(len(chans) - 1):
            for j in range(cfg.num_res_blocks):
                h = ResnetBlock(chans[i + 1], dropout=cfg.dropout, dtype=dt,
                                name=f"down_{i}_block_{j}")(h, deterministic)
                if res in cfg.attn_resolutions:
                    h = AttnBlock(dtype=dt, name=f"down_{i}_attn_{j}")(h)
            if i < len(chans) - 2:
                h = Downsample(dtype=dt, name=f"down_{i}_downsample")(h)
                res //= 2
        h = ResnetBlock(chans[-1], dropout=cfg.dropout, dtype=dt,
                        name="mid_block_1")(h, deterministic)
        h = AttnBlock(dtype=dt, name="mid_attn")(h)
        h = ResnetBlock(chans[-1], dropout=cfg.dropout, dtype=dt,
                        name="mid_block_2")(h, deterministic)
        h = GroupNormSwish(name="norm_out")(h)
        h = conv(cfg.z_channels, name="conv_out", dtype=dt)(h)
        return h


class Decoder(nn.Module):
    """Split into ``trunk`` (everything up to norm_out) and ``final`` (the
    last conv) so the VQGAN adaptive GAN weight can take gradients w.r.t.
    the final kernel alone — the reference passes
    ``model.module.decoder.model[-1]`` as ``last_layer`` into
    ``calculate_adaptive_weight`` (``train.py:96``, ``loss_img.py:56-65``).
    Param names are identical to the previous compact layout."""

    cfg: VQModelConfig

    def setup(self):
        cfg = self.cfg
        dt = _dtype(cfg)
        ch_mult = cfg.channels[1:]
        n_stages = len(ch_mult)
        block_in = ch_mult[-1]

        self.conv_in = conv(block_in, name="conv_in", dtype=dt)
        self.mid_block_1 = ResnetBlock(block_in, dropout=cfg.dropout,
                                       dtype=dt, name="mid_block_1")
        self.mid_attn = AttnBlock(dtype=dt, name="mid_attn")
        self.mid_block_2 = ResnetBlock(block_in, dropout=cfg.dropout,
                                       dtype=dt, name="mid_block_2")

        # (stage index, blocks, attns-or-None, upsample-or-None), in run order
        stages = []
        res = cfg.resolution // 2 ** (n_stages - 1)
        for i in reversed(range(n_stages)):
            block_out = ch_mult[i]
            blocks = [ResnetBlock(block_out, dropout=cfg.dropout, dtype=dt,
                                  name=f"up_{i}_block_{j}")
                      for j in range(cfg.num_res_blocks + 1)]
            attns = ([AttnBlock(dtype=dt, name=f"up_{i}_attn_{j}")
                      for j in range(cfg.num_res_blocks + 1)]
                     if res in cfg.attn_resolutions else None)
            ups = (Upsample(dtype=dt, name=f"up_{i}_upsample")
                   if i > 0 else None)
            stages.append((blocks, attns, ups))
            res *= 2
        self.stages = stages
        self.norm_out = GroupNormSwish(name="norm_out")
        self.conv_out = conv(cfg.out_channels, name="conv_out", dtype=dt)

    def trunk(self, z, deterministic: bool = True):
        h = self.conv_in(z)
        h = self.mid_block_1(h, deterministic)
        h = self.mid_attn(h)
        h = self.mid_block_2(h, deterministic)
        for blocks, attns, ups in self.stages:
            for j, block in enumerate(blocks):
                h = block(h, deterministic)
                if attns is not None:
                    h = attns[j](h)
            if ups is not None:
                h = ups(h)
        return self.norm_out(h)

    def final(self, h):
        return self.conv_out(h).astype(jnp.float32)

    def __call__(self, z, deterministic: bool = True):
        return self.final(self.trunk(z, deterministic))


class VQModel(nn.Module):
    """encode -> quant_conv(+SyncBatchNorm) -> codebook -> post_quant_conv ->
    decode.  Eval-mode full forward; training-mode quantization runs in the
    train step via ``codebook.quantize_train`` (it carries state/rng)."""

    cfg: VQModelConfig

    def setup(self):
        cfg = self.cfg
        self.encoder = Encoder(cfg, name="encoder")
        self.decoder = Decoder(cfg, name="decoder")
        self.quant_conv = conv(cfg.embed_dim, kernel=1, name="quant_conv",
                               dtype=_dtype(cfg))
        self.quant_bn = SyncBatchNorm(name="quant_bn")
        self.post_quant_conv = conv(cfg.z_channels, kernel=1,
                                    name="post_quant_conv", dtype=_dtype(cfg))
        self.codebook_embedding = self.param(
            "codebook_embedding",
            lambda key: codebook_init_embedding(key, cfg.codebook))

    def encode_latent(self, x, train: bool = False,
                      deterministic: bool = True):
        """image -> pre-quantization latent [B, h, w, embed_dim]."""
        h = self.encoder(x, deterministic=deterministic)
        h = self.quant_conv(h)
        h = self.quant_bn(h, use_running_average=not train)
        return h

    def decode_latent(self, z_q, deterministic: bool = True):
        """quantized latent -> reconstruction."""
        h = self.post_quant_conv(z_q)
        return self.decoder(h, deterministic)

    def decode_trunk(self, z_q, deterministic: bool = True):
        """quantized latent -> pre-final-conv activations (for the VQGAN
        adaptive GAN weight; see ``Decoder``)."""
        h = self.post_quant_conv(z_q)
        return self.decoder.trunk(h, deterministic)

    def decode_final(self, h):
        """pre-final activations -> reconstruction (final conv only)."""
        return self.decoder.final(h)

    def encode(self, x) -> Tuple[jax.Array, jax.Array]:
        """eval-mode encode: returns (z_q, indices)  [vqvae.py:20-24]."""
        z = self.encode_latent(x, train=False)
        z_q, idx = quantize_eval(z, self.codebook_embedding)
        return z_q, idx

    def encode_tokens(self, x) -> jax.Array:
        """image -> token indices [B, h, w] (stage-2 tokenization)."""
        return self.encode(x)[1]

    def decode_code(self, indices) -> jax.Array:
        """token indices [B, h, w] -> image  [vqvae.py:31-34, fixed]."""
        z_q = lookup(indices, self.codebook_embedding).astype(_dtype(self.cfg))
        return self.decode_latent(z_q)

    def reconstruct(self, x, quantize: bool = True) -> jax.Array:
        """encode -> (optionally quantize) -> decode.

        ``quantize=False`` reproduces the train step's BOOTSTRAP
        pass-through (codebook counter < q_init: latents skip the untrained
        codebook, ``codebook.quantize_train``) — the reference logs recon
        grids from the training forward (train.py:43-47), so logging during
        the pass-through window must skip quantization too or the grids
        collapse to the random codebook."""
        z = self.encode_latent(x, train=False)
        if quantize:
            z, _ = quantize_eval(z, self.codebook_embedding)
        return self.decode_latent(z)

    def __call__(self, x) -> Tuple[jax.Array, jax.Array]:
        """eval full forward -> (reconstruction, q_loss)  [vqvae.py:36-39]."""
        z = self.encode_latent(x, train=False)
        z_q, _ = quantize_eval(z, self.codebook_embedding)
        zf = z.astype(jnp.float32)
        zqf = z_q.astype(jnp.float32)
        # eval-mode value of the train-step loss: the stop_gradients of
        # quantize_train vanish outside autodiff, leaving (1 + beta) * mse
        q_loss = (1.0 + self.cfg.codebook.beta) * jnp.mean(
            jnp.square(zqf - zf))
        return self.decode_latent(z_q), q_loss
