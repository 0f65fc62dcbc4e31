"""Train state containers (explicit, checkpointable pytrees).

The reference checkpoints {model, discriminator, optim, disc_optim, step}
plus the codebook phase counter (``/root/reference/train.py:69-76,108-116``);
these structs carry exactly that state so orbax snapshots are lossless.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.codebook import CodebookState, codebook_init_state
from ..utils.config import OptimizerConfig, VQModelConfig


def make_adam(cfg: OptimizerConfig,
              rescale_lr: bool = True) -> optax.GradientTransformation:
    """Adam with ``accumulate_grad``-step accumulation (``optax.MultiSteps``).

    ``rescale_lr``: divide lr by the accumulation factor.  The reference
    does this ONLY in pretrain_image (``train.py:61-66``); its seg and
    transformer loops accumulate at the undivided lr (``train.py:51-53,
    153-156`` — plain ``loss.backward()`` summing with a full-lr Adam).
    Adam's update magnitude is invariant to the summed-vs-averaged
    gradient scale, so MultiSteps' averaging plus this flag reproduces
    each stage's effective step size: image loops pass True, seg and
    transformer loops pass False.
    """
    lr = cfg.lr / max(cfg.accumulate_grad, 1) if rescale_lr else cfg.lr
    tx = optax.adam(lr, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps)
    if cfg.accumulate_grad > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulate_grad)
    return tx


@struct.dataclass
class VQTrainState:
    step: jax.Array                       # int32 micro-step counter
    params: Any
    batch_stats: Any
    vq_state: CodebookState
    opt_state: Any
    # VQ-IMG only: discriminator tower + its optimizer
    disc_params: Any = None
    disc_opt_state: Any = None


def create_vq_train_state(model, cfg: VQModelConfig, tx, rng,
                          disc_model=None, disc_tx=None,
                          disc_rng=None) -> VQTrainState:
    sample = jnp.zeros((1, cfg.resolution, cfg.resolution, cfg.in_channels),
                       jnp.float32)
    # full forward so every submodule (encoder, quant convs, codebook,
    # decoder) materializes its params
    variables = model.init(rng, sample)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    disc_params = None
    disc_opt_state = None
    if disc_model is not None:
        dvars = disc_model.init(
            disc_rng if disc_rng is not None else rng,
            jnp.zeros((1, cfg.resolution, cfg.resolution, 3), jnp.float32),
            train=False)
        disc_params = {"params": dvars["params"],
                       "batch_stats": dvars.get("batch_stats", {})}
        if disc_tx is not None:
            disc_opt_state = disc_tx.init(disc_params["params"])
    return VQTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        vq_state=codebook_init_state(cfg.codebook),
        opt_state=tx.init(params),
        disc_params=disc_params,
        disc_opt_state=disc_opt_state,
    )


@struct.dataclass
class TransformerTrainState:
    step: jax.Array
    params: Any
    opt_state: Any
