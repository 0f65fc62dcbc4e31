"""Full three-stage pipeline, tiny-fied (SURVEY §7.7): raw images ->
annotate+repack -> web dataset -> VQ-SEG train -> VQ-IMG (GAN) train ->
tokenize -> transformer train -> CFG sampling -> RGB images.

This is the complete workflow a reference user runs across
preprocess_dataset / pretrain_segmentation / pretrain_image /
train_transformer plus the sampling script the reference never shipped —
exercised end-to-end through the real module APIs on the CPU mesh.
"""

import io
import os
import tarfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

RES = 32            # image resolution (tiny)
LATENT = 16         # 2x reduction with 3-entry channel list


def _tiny_vq_cfg(in_ch, out_ch, codebook_size=16):
    from mas_tpu.utils.config import CodebookConfig, VQModelConfig

    return VQModelConfig(
        in_channels=in_ch, out_channels=out_ch, resolution=RES,
        channels=(32, 32, 64), num_res_blocks=1, attn_resolutions=(),
        z_channels=32, embed_dim=32,
        codebook=CodebookConfig(codebook_size=codebook_size,
                                codebook_dim=32, init_steps=1,
                                reservoir_size=64, samples_per_image=2))


def _write_raw_tar(path, n=4):
    from PIL import Image

    rng = np.random.default_rng(0)
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            key = f"{i:05d}"
            buf = io.BytesIO()
            Image.fromarray((rng.random((RES, RES, 3)) * 255
                             ).astype(np.uint8)).save(buf, "JPEG")
            for name, data in ((f"{key}.jpg", buf.getvalue()),
                               (f"{key}.txt", f"a photo number {i}".encode())):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    from mas_tpu.data.dataset import PreprocessedWebDataset, batch_iterator
    from mas_tpu.data.preprocess import SyntheticAnnotator, preprocess_web
    from mas_tpu.data.tokenizer import HashWordTokenizer
    from mas_tpu.losses.discriminator import PatchDiscriminator
    from mas_tpu.losses.lpips import LPIPS
    from mas_tpu.models.sampler import sample_images
    from mas_tpu.models.transformer import MakeAScene
    from mas_tpu.models.vqvae import VQModel
    from mas_tpu.train.loop import (run_pretrain_segmentation,
                                    tokenize_batches)
    from mas_tpu.train.state import (TransformerTrainState,
                                     create_vq_train_state, make_adam)
    from mas_tpu.train.steps import (make_img_train_step,
                                     make_transformer_train_step)
    from mas_tpu.utils.config import (OptimizerConfig, SegLossConfig,
                                      TrainConfig, TransformerConfig,
                                      VQGANLossConfig)
    from mas_tpu.utils.logging import Logger

    # --- stage 0: offline data factory ----------------------------------
    raw = str(tmp_path / "raw.tar")
    _write_raw_tar(raw)
    anns = {k: SyntheticAnnotator(k) for k in ("panoptic", "human", "face")}
    shards = preprocess_web(raw, str(tmp_path / "processed"), anns)
    ds = PreprocessedWebDataset(shards[0], resolution=RES)
    batch = next(batch_iterator(ds, 4, max_boxes=2))
    assert batch["mask"].shape == (4, RES, RES, 159)

    # --- stage 1: VQ-SEG -------------------------------------------------
    seg_cfg = _tiny_vq_cfg(159, 159)
    train_cfg = TrainConfig(
        mode="pretrain_segmentation", total_steps=2, batch_size=4,
        log_period=1, save_period=100, allow_replicated_batch=True,
        checkpoint_dir=str(tmp_path / "ckpt_seg"),
        optimizer=OptimizerConfig(lr=1e-3))
    seg_state = run_pretrain_segmentation(
        train_cfg, seg_cfg, iter([batch, batch]),
        SegLossConfig(),
        logger=Logger(str(tmp_path / "logs"), use_tensorboard=False))
    vq_seg = VQModel(seg_cfg)
    seg_vars = {"params": seg_state.params,
                "batch_stats": seg_state.batch_stats}

    # --- stage 2: VQ-IMG (GAN) -------------------------------------------
    img_cfg = _tiny_vq_cfg(3, 3)
    vq_img = VQModel(img_cfg)
    disc = PatchDiscriminator(n_layers=2)
    lpips = LPIPS()
    tx, dtx = (make_adam(OptimizerConfig(lr=1e-3)) for _ in range(2))
    img_state = create_vq_train_state(vq_img, img_cfg, tx,
                                      jax.random.PRNGKey(0),
                                      disc_model=disc, disc_tx=dtx)
    lvars = lpips.init(jax.random.PRNGKey(1),
                       jnp.zeros((1, RES, RES, 3)), jnp.zeros((1, RES, RES, 3)))
    step = make_img_train_step(vq_img, disc, tx, dtx,
                               VQGANLossConfig(disc_start=1, face_loss=False),
                               lpips, vq_impl="jnp")
    img_batch = dict(image=jnp.asarray(batch["image"]),
                     bbox_obj=jnp.asarray(batch["bbox_obj"]),
                     bbox_face=jnp.asarray(batch["bbox_face"]))
    for i in range(2):
        img_state, metrics = step(img_state, img_batch, {"lpips": lvars},
                                  jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["loss"]))
    img_vars = {"params": img_state.params,
                "batch_stats": img_state.batch_stats}

    # --- stage 3: tokenize + transformer ---------------------------------
    tok = HashWordTokenizer(vocab_size=64, text_length=8)
    token_batches = list(tokenize_batches(
        iter([batch]), vq_seg, seg_vars, vq_img, img_vars, tok))
    tb = token_batches[0]
    n_tok = LATENT * LATENT
    assert tb["seg"].shape == (4, n_tok) and tb["image"].shape == (4, n_tok)

    tcfg = TransformerConfig(
        num_layers=1, hidden_dim=64, num_attn_heads=4,
        image_vocab_size=16, seg_vocab_size=16, text_vocab_size=64 + 8,
        image_tokens_per_dim=LATENT, seg_tokens_per_dim=LATENT,
        text_length=8)
    model = MakeAScene(tcfg)
    variables = model.init(jax.random.PRNGKey(2),
                           jnp.asarray(tb["text"]), jnp.asarray(tb["seg"]),
                           jnp.asarray(tb["image"]))
    ttx = make_adam(OptimizerConfig(lr=1e-3))
    tstate = TransformerTrainState(step=jnp.zeros((), jnp.int32),
                                   params=variables["params"],
                                   opt_state=ttx.init(variables["params"]))
    tstep = make_transformer_train_step(model, ttx)
    tstate, tm = tstep(tstate, jnp.asarray(tb["text"]),
                       jnp.asarray(tb["seg"]), jnp.asarray(tb["image"]),
                       jax.random.PRNGKey(3))
    assert np.isfinite(float(tm["loss"]))

    # --- stage 4: CFG sampling -> pixels ---------------------------------
    images = sample_images(
        model, {"params": tstate.params}, vq_img, img_vars,
        jnp.asarray(tb["text"][:2]), jnp.asarray(tb["seg"][:2]),
        jax.random.PRNGKey(4), guidance_scale=2.0, top_k=8)
    assert images.shape == (2, RES, RES, 3)
    assert np.isfinite(np.asarray(images)).all()
