"""VQ-IMG (VQGAN) dual-optimizer train step: runs, updates both towers,
adaptive d_weight is finite, disc gated until disc_start (SURVEY §3.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mas_tpu.losses.discriminator import PatchDiscriminator
from mas_tpu.losses.lpips import LPIPS
from mas_tpu.models.vqvae import VQModel
from mas_tpu.train.state import create_vq_train_state, make_adam
from mas_tpu.train.steps import make_img_train_step
from mas_tpu.utils.config import (CodebookConfig, OptimizerConfig,
                                  VQGANLossConfig, VQModelConfig)


@pytest.fixture(scope="module")
def setup():
    cfg = VQModelConfig(
        in_channels=3, out_channels=3, resolution=32,
        channels=(32, 32, 64), attn_resolutions=(8,),
        z_channels=32, embed_dim=32,
        codebook=CodebookConfig(codebook_size=16, codebook_dim=32,
                                init_steps=2, reservoir_size=64,
                                samples_per_image=4))
    model = VQModel(cfg)
    disc = PatchDiscriminator(n_layers=2)
    lpips = LPIPS()
    rng = jax.random.PRNGKey(0)

    tx = make_adam(OptimizerConfig(lr=1e-4))
    disc_tx = make_adam(OptimizerConfig(lr=1e-4))
    state = create_vq_train_state(model, cfg, tx, rng, disc_model=disc,
                                  disc_tx=disc_tx)
    x = jax.random.uniform(rng, (2, 32, 32, 3))
    lpips_vars = lpips.init(jax.random.PRNGKey(1), x, x)
    frozen = {"lpips": lpips_vars}

    loss_cfg = VQGANLossConfig(disc_start=3, face_loss=False)
    # donate=False: these tests re-step from the same fixture state
    step = make_img_train_step(model, disc, tx, disc_tx, loss_cfg, lpips,
                               face_model=None, vq_impl="jnp",
                               donate=False)
    batch = dict(
        image=x,
        bbox_obj=jnp.array([[[4, 4, 20, 20]], [[0, 0, 0, 0]]], jnp.float32),
        bbox_face=jnp.zeros((2, 1, 4), jnp.float32))
    return state, step, batch, frozen, loss_cfg


def test_img_step_runs_and_updates(setup):
    state, step, batch, frozen, _ = setup
    p0 = state.params["decoder"]["conv_out"]["kernel"]
    d0 = state.disc_params["params"]["conv_out"]["kernel"]
    new_state, metrics = step(state, batch, frozen, jax.random.PRNGKey(2))
    assert int(new_state.step) == 1
    for k in ("loss", "nll_loss", "g_loss", "d_weight", "d_loss",
              "q_loss", "disc_factor"):
        assert np.isfinite(float(metrics[k])), k
    # generator moved
    assert not np.allclose(
        np.asarray(p0),
        np.asarray(new_state.params["decoder"]["conv_out"]["kernel"]))
    # adaptive weight is clamped + positive
    assert 0.0 <= float(metrics["d_weight"]) <= 1e4


def test_disc_gated_then_active(setup):
    state, step, batch, frozen, loss_cfg = setup
    # steps 0,1,2: disc_factor = 0 (disc_start=3) -> d_loss == 0, D frozen-ish
    s = state
    for i in range(3):
        d_before = np.asarray(s.disc_params["params"]["conv_out"]["kernel"])
        s, m = step(s, batch, frozen, jax.random.PRNGKey(i))
        assert float(m["disc_factor"]) == 0.0
        assert float(m["d_loss"]) == 0.0
    s, m = step(s, batch, frozen, jax.random.PRNGKey(9))
    assert float(m["disc_factor"]) == 1.0
    assert float(m["d_loss"]) > 0.0


def test_codebook_state_carried(setup):
    state, step, batch, frozen, _ = setup
    s, _ = step(state, batch, frozen, jax.random.PRNGKey(0))
    s, _ = step(s, batch, frozen, jax.random.PRNGKey(1))
    s, _ = step(s, batch, frozen, jax.random.PRNGKey(2))
    # init_steps=2 => collection started after counter>2
    assert int(s.vq_state.counter) == 3
    assert int(s.vq_state.filled) > 0


def test_uint8_image_batch_matches_float(setup):
    """image_u8 pipelines: the step converts uint8 -> float32/255 on
    device (steps.to_float_image), so metrics match the float path
    exactly for u8-representable images."""
    state, step, batch, frozen, _ = setup
    u8 = np.round(np.asarray(batch["image"]) * 255).astype(np.uint8)
    batch_u8 = {**batch, "image": jnp.asarray(u8)}
    batch_f = {**batch, "image": jnp.asarray(u8, jnp.float32) / 255.0}
    _, m_u8 = step(state, batch_u8, frozen, jax.random.PRNGKey(4))
    _, m_f = step(state, batch_f, frozen, jax.random.PRNGKey(4))
    for k in ("loss", "nll_loss", "d_loss", "q_loss"):
        np.testing.assert_allclose(float(m_u8[k]), float(m_f[k]),
                                   rtol=1e-6, err_msg=k)
