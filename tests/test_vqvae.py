import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mas_tpu.models.vqvae import Decoder, Encoder, VQModel
from mas_tpu.utils.config import CodebookConfig, VQModelConfig


def tiny_cfg(**kw):
    base = dict(
        in_channels=3, out_channels=3,
        channels=(32, 32, 64, 64),       # 2 downsamples => 4x reduction
        num_res_blocks=1,
        attn_resolutions=(8,),
        resolution=32,
        z_channels=32,
        embed_dim=32,
        codebook=CodebookConfig(codebook_size=64, codebook_dim=32,
                                init_steps=4, reservoir_size=256,
                                kmeans_iters=2),
    )
    base.update(kw)
    return VQModelConfig(**base)


class TestEncoderDecoder:
    def test_encoder_shape(self):
        cfg = tiny_cfg()
        enc = Encoder(cfg)
        x = jnp.zeros((2, 32, 32, 3))
        params = enc.init(jax.random.PRNGKey(0), x)
        z = enc.apply(params, x)
        assert z.shape == (2, 8, 8, 32)    # 4x spatial reduction

    def test_decoder_shape(self):
        cfg = tiny_cfg()
        dec = Decoder(cfg)
        z = jnp.zeros((2, 8, 8, 32))
        params = dec.init(jax.random.PRNGKey(0), z)
        x = dec.apply(params, z)
        assert x.shape == (2, 32, 32, 3)

    def test_seg_channels(self):
        # the reference pitfall: seg decoder must emit 159 channels
        cfg = tiny_cfg(in_channels=159, out_channels=159)
        dec = Decoder(cfg)
        z = jnp.zeros((1, 8, 8, 32))
        params = dec.init(jax.random.PRNGKey(0), z)
        assert dec.apply(params, z).shape == (1, 32, 32, 159)


class TestVQModel:
    def test_forward_roundtrip(self):
        cfg = tiny_cfg()
        model = VQModel(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(1), x)
        recon, q_loss = model.apply(variables, x)
        assert recon.shape == x.shape
        assert jnp.isfinite(q_loss)

    def test_tokens_roundtrip(self):
        cfg = tiny_cfg()
        model = VQModel(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(1), x)
        tokens = model.apply(variables, x, method=VQModel.encode_tokens)
        assert tokens.shape == (2, 8, 8)
        assert tokens.dtype == jnp.int32
        img = model.apply(variables, tokens, method=VQModel.decode_code)
        assert img.shape == (2, 32, 32, 3)

    def test_downsample_asymmetric_pad_matches_torch(self):
        """stride-2 conv with (0,1,0,1) pad == torch reference semantics."""
        import torch
        from mas_tpu.models.layers import Downsample
        x = np.random.RandomState(0).randn(1, 8, 8, 4).astype(np.float32)
        mod = Downsample()
        params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        out = mod.apply(params, jnp.asarray(x))
        kernel = np.array(params["params"]["conv"]["kernel"])  # HWIO
        bias = np.array(params["params"]["conv"]["bias"])
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        xt = torch.nn.functional.pad(xt, (0, 1, 0, 1))
        wt = torch.from_numpy(kernel).permute(3, 2, 0, 1)      # OIHW
        ref = torch.nn.functional.conv2d(xt, wt, torch.from_numpy(bias),
                                         stride=2)
        ref = ref.permute(0, 2, 3, 1).numpy()
        assert out.shape == ref.shape == (1, 4, 4, 4)
        np.testing.assert_allclose(np.array(out), ref, atol=1e-5)

    def test_upsample_nearest(self):
        from mas_tpu.models.layers import Upsample
        x = jnp.arange(4.0).reshape(1, 2, 2, 1)
        mod = Upsample()
        params = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(params, x)
        assert out.shape == (1, 4, 4, 1)


def test_vqvae_bce_alternative_loss():
    from mas_tpu.losses.seg import vqvae_bce_loss
    from mas_tpu.utils.config import SegLossConfig

    cfg = SegLossConfig(image_channels=8, face_channel_start=2,
                        face_channel_end=4)
    logits = jnp.zeros((1, 4, 4, 8))
    targets = jnp.zeros((1, 4, 4, 8))
    val = float(vqvae_bce_loss(jnp.float32(0.0), targets, logits, cfg))
    # sigmoid(0)=0.5 -> mse 0.25; bce = ln 2
    assert abs(val - (0.25 + 0.6931)) < 1e-3


def test_dropout_active_in_training():
    """cfg.dropout > 0 must actually drop during train steps (reference
    applies training-mode dropout; previously the knob was inert)."""
    import jax

    from mas_tpu.models.vqvae import VQModel
    from mas_tpu.train.state import create_vq_train_state, make_adam
    from mas_tpu.train.steps import make_seg_train_step
    from mas_tpu.utils.config import (CodebookConfig, OptimizerConfig,
                                      SegLossConfig, VQModelConfig)

    cfg = VQModelConfig(
        in_channels=8, out_channels=8, resolution=16, channels=(32, 32),
        num_res_blocks=1, attn_resolutions=(), z_channels=32, embed_dim=32,
        dropout=0.5,
        codebook=CodebookConfig(codebook_size=8, codebook_dim=32,
                                init_steps=100, reservoir_size=16))
    model = VQModel(cfg)
    tx = make_adam(OptimizerConfig(lr=0.0))   # lr 0: isolate dropout effect
    state = create_vq_train_state(model, cfg, tx, jax.random.PRNGKey(0))
    step = make_seg_train_step(
        model, tx, SegLossConfig(image_channels=8, face_channel_start=2,
                                 face_channel_end=4), vq_impl="jnp",
        donate=False)
    seg = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(1), (2, 16, 16), 0, 8), 8)
    _, m1 = step(state, seg, jax.random.PRNGKey(10))
    _, m2 = step(state, seg, jax.random.PRNGKey(20))
    # different dropout masks -> different losses at identical params
    assert float(m1["loss"]) != float(m2["loss"])


def test_reconstruct_passthrough_skips_codebook():
    """VQModel.reconstruct(quantize=False) = the bootstrap-window train
    forward (latents skip the codebook); quantize=True matches __call__.
    Logging uses this so early grids aren't collapsed onto the untrained
    random codebook (reference logs the train-forward recon)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mas_tpu.models.vqvae import VQModel
    from mas_tpu.utils.config import CodebookConfig, VQModelConfig

    cfg = VQModelConfig(in_channels=3, out_channels=3, channels=(32, 32),
                        num_res_blocks=1, attn_resolutions=(),
                        resolution=16, z_channels=32, embed_dim=32,
                        codebook=CodebookConfig(codebook_size=8,
                                                codebook_dim=32))
    model = VQModel(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(1), x)
    r_q = model.apply(variables, x, method=VQModel.reconstruct)
    r_pt = model.apply(variables, x, quantize=False,
                       method=VQModel.reconstruct)
    full, _ = model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(r_q), np.asarray(full), atol=1e-6)
    assert np.abs(np.asarray(r_pt) - np.asarray(r_q)).max() > 1e-4


def test_make_adam_lr_rescale_stage_semantics():
    """rescale_lr=False (seg/transformer loops) must step ~accum x larger
    than rescale_lr=True (image loop) — the reference divides lr only in
    pretrain_image (train.py:61-66)."""
    import jax.numpy as jnp
    import optax
    import pytest

    from mas_tpu.train.state import make_adam
    from mas_tpu.utils.config import OptimizerConfig

    cfg = OptimizerConfig(lr=1e-3, accumulate_grad=4)
    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.ones((4,))}

    def delta(tx):
        st = tx.init(params)
        p = params
        for _ in range(4):   # one full accumulation cycle
            up, st = tx.update(grads, st, p)
            p = optax.apply_updates(p, up)
        return float(jnp.abs(p["w"] - params["w"]).mean())

    ratio = delta(make_adam(cfg, rescale_lr=False)) / delta(
        make_adam(cfg, rescale_lr=True))
    assert ratio == pytest.approx(4.0, rel=0.05)
