"""VQ-SEG loss: weighted binary cross-entropy + codebook loss.

Mirrors the reference ``BCELossWithQuant`` (``/root/reference/losses/
loss_seg.py:6-22``): BCE-with-logits over the 159 channels with
``pos_weight = 20`` on channels [153, 158) — the 5 face channels — plus
``codebook_weight * q_loss``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.config import SegLossConfig


def weighted_bce_with_logits(logits: jax.Array, targets: jax.Array,
                             pos_weight: jax.Array) -> jax.Array:
    """Numerically-stable BCEWithLogits with per-channel positive weight.

    Matches ``torch.nn.functional.binary_cross_entropy_with_logits``
    semantics: loss = (1-t)*x + (1 + (w-1)*t) * log(1 + exp(-x))  [stable
    form: max(x,0) - x*t ... rewritten below], reduced by mean.
    logits/targets [..., C]; pos_weight [C].
    """
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    w = pos_weight.astype(jnp.float32)
    # log(1 + exp(-x)) stable: softplus(-x)
    log_sig = -jax.nn.softplus(-x)          # log(sigmoid(x))
    log_one_minus = -jax.nn.softplus(x)     # log(1 - sigmoid(x))
    loss = -(w * t * log_sig + (1.0 - t) * log_one_minus)
    return jnp.mean(loss)


def _pos_weight(cfg: SegLossConfig) -> jax.Array:
    pos_weight = jnp.ones((cfg.image_channels,), jnp.float32)
    return pos_weight.at[cfg.face_channel_start:cfg.face_channel_end
                         ].set(cfg.face_weight)


def bce_loss_with_quant(q_loss: jax.Array, targets: jax.Array,
                        logits: jax.Array,
                        cfg: SegLossConfig = SegLossConfig()) -> jax.Array:
    """targets/logits [B, H, W, C] (NHWC)."""
    bce = weighted_bce_with_logits(logits, targets, _pos_weight(cfg))
    return bce + cfg.codebook_weight * q_loss.astype(jnp.float32)


def vqvae_bce_loss(q_loss: jax.Array, targets: jax.Array,
                   logits: jax.Array,
                   cfg: SegLossConfig = SegLossConfig()) -> jax.Array:
    """The reference's unused alternative ``VQVAEWithBCELoss``
    (``losses/loss_seg.py:25-41``): MSE on sigmoid outputs + weighted BCE
    + codebook loss — kept for parity."""
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    mse = jnp.mean(jnp.square(probs - targets.astype(jnp.float32)))
    bce = weighted_bce_with_logits(logits, targets, _pos_weight(cfg))
    return mse + bce + cfg.codebook_weight * q_loss.astype(jnp.float32)
