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


def _writeback_embedding(params, emb, triggered):
    """On a k-means step, overwrite the codebook param with the centroids."""
    new = jax.lax.select(triggered, emb, params[EMBED_KEY])
    return {**params, EMBED_KEY: new}


def make_seg_train_step(model: VQModel, tx,
                        loss_cfg: SegLossConfig = SegLossConfig(),
                        vq_impl: str = "auto") -> Callable:
    """Returns jitted ``step(state, seg_batch, rng) -> (state, metrics)``.

    ``seg_batch``: [B, H, W, 159] float targets (NHWC).
    """
    cb_cfg = model.cfg.codebook

    def loss_fn(params, batch_stats, vq_state, seg, rng):
        z, updates = model.apply(
            {"params": params, "batch_stats": batch_stats}, seg, train=True,
            method=VQModel.encode_latent, mutable=["batch_stats"])
        z_q, q_loss, idx, vq_state, emb_wb, trig = quantize_train(
            z, params[EMBED_KEY], vq_state, cb_cfg, rng, impl=vq_impl)
        recon = model.apply({"params": params}, z_q,
                            method=VQModel.decode_latent)
        loss = bce_loss_with_quant(q_loss, seg, recon, loss_cfg)
        aux = dict(q_loss=q_loss, recon=recon, indices=idx,
                   batch_stats=updates["batch_stats"], vq_state=vq_state,
                   emb_writeback=emb_wb, kmeans_triggered=trig)
        return loss, aux

    @jax.jit
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


def make_transformer_train_step(model, tx, uncond_p: float = 0.1,
                                start_uncond: int = 0) -> Callable:
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

    @jax.jit
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
