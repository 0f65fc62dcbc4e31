"""Jitted train steps (global-view SPMD; batch sharded over the data axis).

VQ-SEG step mirrors the reference loop ``train.py:37-58``: forward through
the autoencoder with training-mode quantization (counter/reservoir/k-means
phase machine), weighted-BCE + codebook loss, Adam with gradient
accumulation.  The codebook k-means write-back happens *after* the optimizer
update (see ``models/codebook.py`` deviations note).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..losses.seg import bce_loss_with_quant
from ..models.codebook import quantize_train
from ..models.vqvae import VQModel
from ..utils.config import SegLossConfig, VQModelConfig
from .state import VQTrainState

EMBED_KEY = "codebook_embedding"


def to_float_image(images: jax.Array) -> jax.Array:
    """uint8 [0,255] -> float32 [0,1]; float dtypes pass through.

    Input pipelines may ship RGB as uint8 (``StructuredSceneBatches
    (image_u8=True)``) — 4x less host->device traffic, which matters
    because the axon client leaks every staging buffer, so long image-
    stage runs must bound total upload volume.  The conversion happens
    on device inside the jitted step (dtype is static under jit, so the
    branch costs nothing)."""
    if images.dtype == jnp.uint8:
        return images.astype(jnp.float32) / 255.0
    return images


def _writeback_embedding(params, emb, triggered):
    """On a k-means step, overwrite the codebook param with the centroids."""
    new = jax.lax.select(triggered, emb, params[EMBED_KEY])
    return {**params, EMBED_KEY: new}


def make_seg_train_step(model: VQModel, tx,
                        loss_cfg: SegLossConfig = SegLossConfig(),
                        vq_impl: str = "auto",
                        donate: bool = True,
                        from_packed_labels: bool = False) -> Callable:
    """Returns jitted ``step(state, seg_batch, rng) -> (state, metrics)``.

    ``seg_batch``: [B, H, W, 159] float targets (NHWC) — or, with
    ``from_packed_labels``, compact int16 [B, H, W, 4] label maps
    (``segmap.pack_seg_labels``) expanded to the one-hot IN-GRAPH
    (``one_hot_seg_packed``): the host then ships 0.5 MB/sample instead
    of 41 MB, which is the difference between a starved and a saturated
    chip on tunnel/thin-PCIe hosts (and the north-star "jit-able seg
    assembly").
    ``donate``: donate the state buffers (params, optimizer state, the
    up-to-200MB codebook reservoir) so XLA updates them in place; the
    passed-in state is CONSUMED — rebind it.  Disable for interactive
    reuse of one state object.
    """
    cb_cfg = model.cfg.codebook
    use_dropout = model.cfg.dropout > 0.0

    def loss_fn(params, batch_stats, vq_state, seg, rng):
        if from_packed_labels:
            from ..data.segmap import one_hot_seg_packed
            seg = one_hot_seg_packed(seg)
        rng, k_enc, k_dec = jax.random.split(rng, 3)
        enc_rngs = {"rngs": {"dropout": k_enc}} if use_dropout else {}
        dec_rngs = {"rngs": {"dropout": k_dec}} if use_dropout else {}
        z, updates = model.apply(
            {"params": params, "batch_stats": batch_stats}, seg, train=True,
            deterministic=not use_dropout,
            method=VQModel.encode_latent, mutable=["batch_stats"],
            **enc_rngs)
        z_q, q_loss, idx, vq_state, emb_wb, trig = quantize_train(
            z, params[EMBED_KEY], vq_state, cb_cfg, rng, impl=vq_impl)
        recon = model.apply({"params": params}, z_q,
                            not use_dropout,
                            method=VQModel.decode_latent, **dec_rngs)
        loss = bce_loss_with_quant(q_loss, seg, recon, loss_cfg)
        aux = dict(q_loss=q_loss, recon=recon, indices=idx,
                   batch_stats=updates["batch_stats"], vq_state=vq_state,
                   emb_writeback=emb_wb, kmeans_triggered=trig)
        return loss, aux

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: VQTrainState, seg, rng) -> Tuple[VQTrainState, Dict]:
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, state.vq_state, seg, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = _writeback_embedding(params, aux["emb_writeback"],
                                      aux["kmeans_triggered"])
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=aux["batch_stats"],
            vq_state=aux["vq_state"],
            opt_state=opt_state,
        )
        metrics = dict(loss=loss, q_loss=aux["q_loss"],
                       kmeans_triggered=aux["kmeans_triggered"])
        return new_state, metrics

    return step


def make_img_train_step(model: VQModel, disc, tx, disc_tx,
                        loss_cfg, lpips_model, face_model=None,
                        vq_impl: str = "auto",
                        donate: bool = True) -> Callable:
    """VQ-IMG (VQGAN) dual-optimizer step (reference ``train.py:80-103``).

    One jitted step runs BOTH optimizer indices of the reference loop:
    the generator update (L1 + object-aware LPIPS + face loss + adaptive-
    weighted GAN term + codebook loss) and the discriminator hinge update —
    the autoencoder forward happens once, its reconstruction feeds both.

    Signature: ``step(state, batch, frozen, rng) -> (state, metrics)`` with
      batch  = dict(image [B,H,W,3], bbox_obj [B,M,4], bbox_face [B,M,4])
      frozen = dict(lpips=<variables>, face=<variables or absent>)
    ``frozen`` towers are step *arguments* (not closure constants) so the
    jitted executable doesn't embed the VGG16/ResNet50 weights.
    """
    from ..losses.vqgan import (PerceptualFns, discriminator_step_loss,
                                generator_step_loss)

    cb_cfg = model.cfg.codebook
    use_face = face_model is not None and loss_cfg.face_loss

    use_dropout = model.cfg.dropout > 0.0

    def g_loss_fn(params, batch_stats, vq_state, disc_vars, frozen, batch,
                  rng, step_no):
        images = batch["image"]
        rng, k_enc, k_dec = jax.random.split(rng, 3)
        enc_rngs = {"rngs": {"dropout": k_enc}} if use_dropout else {}
        dec_rngs = {"rngs": {"dropout": k_dec}} if use_dropout else {}
        z, updates = model.apply(
            {"params": params, "batch_stats": batch_stats}, images,
            train=True, deterministic=not use_dropout,
            method=VQModel.encode_latent,
            mutable=["batch_stats"], **enc_rngs)
        z_q, q_loss, idx, vq_state, emb_wb, trig = quantize_train(
            z, params[EMBED_KEY], vq_state, cb_cfg, rng, impl=vq_impl)
        trunk_h = model.apply({"params": params}, z_q,
                              not use_dropout,
                              method=VQModel.decode_trunk, **dec_rngs)
        recon = model.apply({"params": params}, trunk_h,
                            method=VQModel.decode_final)

        def apply_final(kernel, h):
            # full tree with the kernel substituted (setup materializes all
            # params even though decode_final only reads conv_out)
            p2 = dict(params)
            p2["decoder"] = dict(params["decoder"])
            p2["decoder"]["conv_out"] = {
                **params["decoder"]["conv_out"], "kernel": kernel}
            return model.apply({"params": p2}, h,
                               method=VQModel.decode_final)

        def disc_fwd(x):
            # D frozen for the G step (reference change_requires_grad,
            # train.py:92); batch-mode stats, updates discarded.
            out, _ = disc.apply(
                jax.lax.stop_gradient(disc_vars), x, train=True,
                mutable=["batch_stats"])
            return out

        fns = PerceptualFns(
            lpips=lambda r, f: lpips_model.apply(frozen["lpips"], r, f),
            disc=disc_fwd,
            facenet=(lambda x: face_model.apply(frozen["face"], x))
            if use_face else None)

        m = generator_step_loss(
            fns, loss_cfg, images, recon, q_loss, step_no,
            batch["bbox_obj"], batch["bbox_face"], trunk_h,
            params["decoder"]["conv_out"]["kernel"], apply_final)
        aux = dict(metrics=m, q_loss=q_loss, recon=recon, indices=idx,
                   batch_stats=updates["batch_stats"], vq_state=vq_state,
                   emb_writeback=emb_wb, kmeans_triggered=trig)
        return m["loss"], aux

    def d_loss_fn(disc_params, disc_stats, images, recon, step_no):
        stats = disc_stats

        def fwd(x):
            nonlocal stats
            out, upd = disc.apply(
                {"params": disc_params, "batch_stats": stats}, x,
                train=True, mutable=["batch_stats"])
            stats = upd["batch_stats"]
            return out

        m = discriminator_step_loss(fwd, loss_cfg, images, recon, step_no)
        return m["loss"], (m, stats)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: VQTrainState, batch, frozen, rng):
        batch = {**batch, "image": to_float_image(batch["image"])}
        disc_vars = {"params": state.disc_params["params"],
                     "batch_stats": state.disc_params["batch_stats"]}

        # --- generator update ----------------------------------------------
        (_, aux), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.params, state.batch_stats, state.vq_state, disc_vars,
            frozen, batch, rng, state.step)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = _writeback_embedding(params, aux["emb_writeback"],
                                      aux["kmeans_triggered"])

        # --- discriminator update ------------------------------------------
        recon_sg = jax.lax.stop_gradient(aux["recon"])
        (_, (d_metrics, disc_stats)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(
            disc_vars["params"], disc_vars["batch_stats"], batch["image"],
            recon_sg, state.step)
        d_updates, disc_opt_state = disc_tx.update(
            d_grads, state.disc_opt_state, disc_vars["params"])
        disc_params = optax.apply_updates(disc_vars["params"], d_updates)

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=aux["batch_stats"],
            vq_state=aux["vq_state"],
            opt_state=opt_state,
            disc_params={"params": disc_params, "batch_stats": disc_stats},
            disc_opt_state=disc_opt_state,
        )
        g_m = aux["metrics"]
        metrics = dict(
            loss=g_m["loss"], nll_loss=g_m["nll_loss"],
            g_loss=g_m["g_loss"], face_loss=g_m["face_loss"],
            d_weight=g_m["d_weight"], disc_factor=g_m["disc_factor"],
            q_loss=aux["q_loss"], d_loss=d_metrics["loss"],
            logits_real=d_metrics["logits_real"],
            logits_fake=d_metrics["logits_fake"],
            kmeans_triggered=aux["kmeans_triggered"])
        return new_state, metrics

    return step


def make_transformer_train_step(model, tx, uncond_p: float = 0.1,
                                start_uncond: int = 0,
                                donate: bool = True) -> Callable:
    """Stage-2 AR training step (reference ``train.py:136-161``).

    CFG dropout: with probability ``uncond_p`` the *whole batch's* text
    tokens are zeroed (the reference uses a single host-side ``random()``
    per step, ``train.py:147-148``), active from step ``start_uncond``.
    Loss = cross-entropy of image-position logits vs image tokens.
    """
    from .state import TransformerTrainState

    def loss_fn(params, text, seg, img):
        logits = model.apply({"params": params}, text, seg, img)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), img)
        return jnp.mean(ce)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: TransformerTrainState, text, seg, img, rng):
        drop = jnp.logical_and(
            state.step >= start_uncond,
            jax.random.uniform(rng) < uncond_p)
        text = jnp.where(drop, jnp.zeros_like(text), text)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, text, seg,
                                                  img)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        return new_state, dict(loss=loss, uncond=drop)

    return step


def make_seg_eval_step(model: VQModel) -> Callable:
    @jax.jit
    def step(params, batch_stats, seg):
        recon, q_loss = model.apply(
            {"params": params, "batch_stats": batch_stats}, seg)
        return recon, q_loss

    return step
