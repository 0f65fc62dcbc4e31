"""VQ-IMG composite loss (taming-style VQGAN), functional TPU rebuild.

Rebuilds the reference ``VQLPIPSWithDiscriminator``
(``/root/reference/losses/loss_img.py:30-141``) as pure functions consumed
by the dual-optimizer train step:

  generator   (optimizer_idx 0): L1 + perceptual_weight * object-aware LPIPS
      + face_loss + d_weight * disc_factor * (-mean D(rec))
      + codebook_weight * q_loss                       (loss_img.py:78-129)
  discriminator (optimizer_idx 1): disc_factor * hinge(D(real), D(fake))
                                                       (loss_img.py:132-141)

The adaptive ``d_weight = ||∂nll/∂W_last|| / (||∂g/∂W_last|| + 1e-4)``,
clamped to [0, 1e4], times ``disc_weight`` (``loss_img.py:54-63``), where
``W_last`` is the decoder's final conv kernel.  In JAX the two gradients are
two ``jax.grad`` calls on closures that re-run ONLY the final conv (+ the
loss heads) from the cached trunk activations — same cost profile as the
reference's two ``retain_graph`` backward passes, but explicit.

The unconditional per-image ``object_loss`` of the reference is a stub
(zeroed, commented out at ``loss_img.py:90-106``); its *intent* lives on as
the object-aware LPIPS gradient weighting (``lpips_object.py``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..utils.config import VQGANLossConfig
from .discriminator import adopt_weight, generator_loss, hinge_d_loss
from .face_loss import face_loss
from .lpips_object import box_weight_map, scale_gradient


class PerceptualFns(NamedTuple):
    """Bound apply fns for the frozen loss towers.

    lpips(real, fake) -> [B];  facenet(x) -> list of 5 taps (or None to
    disable the face term);  disc(x) -> patch logits.
    """

    lpips: Callable[[jax.Array, jax.Array], jax.Array]
    disc: Callable[[jax.Array], jax.Array]
    facenet: Optional[Callable[[jax.Array], Any]] = None


def nll_loss_fn(fns: PerceptualFns, cfg: VQGANLossConfig, images: jax.Array,
                recon: jax.Array, bbox_obj: jax.Array) -> jax.Array:
    """L1 + perceptual_weight * object-aware LPIPS, scalar mean
    (loss_img.py:79-86: the [B,1,1,1] p_loss broadcast-adds into the
    elementwise L1 map before the mean, i.e. mean(L1) + w * mean(p))."""
    l1 = jnp.mean(jnp.abs(images.astype(jnp.float32)
                          - recon.astype(jnp.float32)))
    h, w = recon.shape[1], recon.shape[2]
    wmap = box_weight_map(bbox_obj, h, w, cfg.object_weight)
    p = jnp.mean(fns.lpips(images, scale_gradient(recon, wmap)))
    # pixelloss_weight: the reference stores-but-never-applies it
    # (loss_img.py:34 self.pixel_weight); here the config knob is live
    # (default 1.0 = reference behavior)
    return cfg.pixelloss_weight * l1 + cfg.perceptual_weight * p


def generator_step_loss(
    fns: PerceptualFns,
    cfg: VQGANLossConfig,
    images: jax.Array,            # [B, H, W, 3]
    recon: jax.Array,             # [B, H, W, 3] (differentiable)
    q_loss: jax.Array,
    step: jax.Array,
    bbox_obj: jax.Array,          # [B, M, 4] padded
    bbox_face: jax.Array,         # [B, M, 4] padded
    trunk_h: jax.Array,           # pre-final-conv activations (stop-grad ok)
    final_kernel: jax.Array,      # decoder conv_out kernel param
    apply_final: Callable[[jax.Array, jax.Array], jax.Array],
) -> Dict[str, jax.Array]:
    """Full generator-side loss with the adaptive GAN weight.

    ``apply_final(kernel, trunk_h) -> recon`` re-runs only the last conv;
    used by the two inner grads.  Returns a dict with 'loss' plus aux
    metrics (structured, unlike the reference's ad-hoc tuple — see the
    SURVEY §3.2 latent-crash note).
    """
    nll = nll_loss_fn(fns, cfg, images, recon, bbox_obj)

    f_loss = jnp.zeros((), jnp.float32)
    if cfg.face_loss and fns.facenet is not None:
        f_loss = face_loss(fns.facenet, images, recon, bbox_face)

    logits_fake = fns.disc(recon)
    g = generator_loss(logits_fake)

    # --- adaptive d_weight: grads of nll and g w.r.t. the final kernel -----
    trunk_sg = jax.lax.stop_gradient(trunk_h)

    def nll_of(kernel):
        r = apply_final(kernel, trunk_sg)
        return nll_loss_fn(fns, cfg, images, r, bbox_obj)

    def g_of(kernel):
        return generator_loss(fns.disc(apply_final(kernel, trunk_sg)))

    nll_grads = jax.grad(nll_of)(final_kernel)
    g_grads = jax.grad(g_of)(final_kernel)
    d_weight = (jnp.linalg.norm(nll_grads.reshape(-1))
                / (jnp.linalg.norm(g_grads.reshape(-1)) + 1e-4))
    d_weight = jax.lax.stop_gradient(
        jnp.clip(d_weight, 0.0, 1e4)) * cfg.disc_weight

    disc_factor = adopt_weight(cfg.disc_factor, step, cfg.disc_start)
    loss = (nll + d_weight * disc_factor * g
            + cfg.codebook_weight * jnp.mean(q_loss.astype(jnp.float32))
            + f_loss)
    return dict(loss=loss, nll_loss=nll, g_loss=g, face_loss=f_loss,
                d_weight=d_weight, disc_factor=disc_factor)


def discriminator_step_loss(disc_apply: Callable[[jax.Array], jax.Array],
                            cfg: VQGANLossConfig, images: jax.Array,
                            recon: jax.Array,
                            step: jax.Array) -> Dict[str, jax.Array]:
    """Hinge D loss on detached real/fake (loss_img.py:132-141)."""
    logits_real = disc_apply(jax.lax.stop_gradient(images))
    logits_fake = disc_apply(jax.lax.stop_gradient(recon))
    disc_factor = adopt_weight(cfg.disc_factor, step, cfg.disc_start)
    d_loss = disc_factor * hinge_d_loss(logits_real, logits_fake)
    return dict(loss=d_loss,
                logits_real=jnp.mean(logits_real),
                logits_fake=jnp.mean(logits_fake))
