"""Vector-quantizer codebook with the staged k-means bootstrap, functional.

Rebuilds the reference ``Codebook`` (``/root/reference/models/modules.py:
451-528``) as pure functions over explicit state so the whole phase machine
lives *inside* the jitted train step:

  * counter / reservoir are carried state (checkpointed, like the reference
    restores ``quantize.q_counter`` on resume, ``train.py:76``),
  * phase transitions are ``lax.cond``s on the counter,
  * the periodic k-means re-init runs on device (``mas_tpu.ops.kmeans``).

Cross-replica semantics: the reference ``dist.all_gather``s per-rank
reservoirs before k-means (``modules.py:490-495``).  Under pjit global-view
SPMD the batch is a single global array, so one *replicated* reservoir
sampled from the global batch is the same thing — no explicit collective
needed; XLA keeps the replicated update consistent.

Known deviations (documented, not bugs):
  * reservoir eviction is uniform-random-slot replacement once full instead
    of concat+shuffle+truncate — same stationary distribution family, static
    shapes (no data-dependent concat under jit);
  * per-image latent sampling is with replacement (``randint``) instead of a
    ``randperm`` prefix;
  * on a k-means step the commitment-loss gradient w.r.t. the fresh
    centroids is dropped for that single step (the write-back happens after
    the optimizer update); the reference applies one Adam step to them.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.kmeans import kmeans
from ..ops.vq import vq_quantize
from ..utils.config import CodebookConfig


@struct.dataclass
class CodebookState:
    counter: jax.Array        # int32 scalar, micro-step count
    reservoir: jax.Array      # [R, D] fp32
    filled: jax.Array         # int32 scalar, valid rows in reservoir


def codebook_init_state(cfg: CodebookConfig) -> CodebookState:
    return CodebookState(
        counter=jnp.zeros((), jnp.int32),
        reservoir=jnp.zeros((cfg.reservoir_size, cfg.codebook_dim),
                            jnp.float32),
        filled=jnp.zeros((), jnp.int32),
    )


def codebook_init_embedding(key: jax.Array, cfg: CodebookConfig) -> jax.Array:
    """uniform(-1/K, 1/K), as the reference (``modules.py:463``)."""
    return jax.random.uniform(
        key, (cfg.codebook_size, cfg.codebook_dim), jnp.float32,
        minval=-1.0 / cfg.codebook_size, maxval=1.0 / cfg.codebook_size)


def _update_reservoir(state: CodebookState, z_flat_img: jax.Array,
                      cfg: CodebookConfig, key: jax.Array) -> CodebookState:
    """Sample ``samples_per_image`` latents per image into the reservoir."""
    b, hw, d = z_flat_img.shape
    s = min(cfg.samples_per_image, hw)
    k1, k2 = jax.random.split(key)
    pos = jax.random.randint(k1, (b, s), 0, hw)
    samples = jnp.take_along_axis(
        z_flat_img, pos[:, :, None], axis=1).reshape(b * s, d)
    samples = jax.lax.stop_gradient(samples.astype(jnp.float32))

    n_new = b * s
    r = cfg.reservoir_size
    seq = state.filled + jnp.arange(n_new, dtype=jnp.int32)
    rand = jax.random.randint(k2, (n_new,), 0, r)
    slots = jnp.where(seq < r, seq % r, rand)
    reservoir = state.reservoir.at[slots].set(samples)
    filled = jnp.minimum(state.filled + n_new, r)
    return state.replace(reservoir=reservoir, filled=filled)


def quantize_eval(z: jax.Array, embedding: jax.Array,
                  impl: str = "auto") -> Tuple[jax.Array, jax.Array]:
    """z [..., D] -> (z_q, indices); no straight-through, no state."""
    z_q, idx = vq_quantize(z, embedding.astype(z.dtype), impl=impl)
    return z_q, idx


def lookup(indices: jax.Array, embedding: jax.Array) -> jax.Array:
    """indices [...] -> codebook vectors [..., D] (reference
    ``get_codebook_entry``/``embed_code``, ``modules.py:519-528``; note the
    reference's ``decode_code`` calls a nonexistent ``embed_code`` — fixed
    here)."""
    return jnp.take(embedding, indices, axis=0)


def quantize_train(
    z: jax.Array,                 # [B, h, w, D] latents after quant_conv
    embedding: jax.Array,         # [K, D] codebook param (differentiable)
    state: CodebookState,
    cfg: CodebookConfig,
    key: jax.Array,
    impl: str = "auto",
):
    """One training-mode quantization with the full phase schedule.

    Returns ``(z_q_st, q_loss, indices, new_state, emb_writeback,
    kmeans_triggered)``.  ``emb_writeback`` is the (stop-gradient) embedding
    value the train step must store into params *after* the optimizer update
    when ``kmeans_triggered`` — mirroring the reference's in-place
    ``embedding.weight.data = centroids`` (``modules.py:499``).
    """
    b, h, w, d = z.shape
    counter = state.counter + 1
    state = state.replace(counter=counter)
    k_res, k_km = jax.random.split(key)

    # --- phase 1: reservoir collection (counter > q_start_collect) ---------
    z_img = jax.lax.stop_gradient(z.reshape(b, h * w, d))
    state = jax.lax.cond(
        counter > cfg.q_start_collect,
        lambda s: _update_reservoir(s, z_img, cfg, k_res),
        lambda s: s,
        state)

    # --- phase 3: periodic k-means re-init ---------------------------------
    in_window = jnp.logical_and(counter >= cfg.q_init, counter < cfg.q_re_end)
    on_tick = (counter - cfg.q_init) % max(cfg.q_re_step, 1) == 0
    trigger = jnp.logical_and(in_window, on_tick)

    def do_kmeans(_):
        cents = kmeans(state.reservoir, k_km, cfg.codebook_size,
                       iters=cfg.kmeans_iters, n_valid=state.filled)
        return jax.lax.stop_gradient(cents)

    emb_used = jax.lax.cond(trigger, do_kmeans, lambda _: embedding,
                            operand=None)

    # --- phase 2 vs 4: pass-through window vs quantize ----------------------
    def passthrough(_):
        return (z, jnp.zeros((), z.dtype),
                jnp.zeros((b, h, w), jnp.int32))

    def quantize(_):
        z_q, idx = vq_quantize(z, emb_used.astype(z.dtype), impl=impl)
        zf = z.astype(jnp.float32)
        zqf = z_q.astype(jnp.float32)
        q_loss = (jnp.mean(jnp.square(jax.lax.stop_gradient(zqf) - zf))
                  + cfg.beta * jnp.mean(
                      jnp.square(zqf - jax.lax.stop_gradient(zf))))
        # straight-through estimator (modules.py:512)
        z_q_st = z + jax.lax.stop_gradient(z_q - z)
        return z_q_st, q_loss.astype(z.dtype), idx

    z_q, q_loss, idx = jax.lax.cond(
        counter < cfg.q_init, passthrough, quantize, operand=None)

    emb_writeback = jax.lax.stop_gradient(emb_used)
    return z_q, q_loss, idx, state, emb_writeback, trigger
