"""Evaluation harness: recon metrics, codebook stats, FID machinery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mas_tpu.eval import (FIDAccumulator, codebook_stats, fid_from_features,
                          recon_metrics)


def test_recon_metrics_identity_and_noise():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    m = recon_metrics(x, x)
    assert float(m["l1"]) == 0.0
    assert float(m["psnr"]) > 100
    noisy = x + 0.1
    m2 = recon_metrics(x, noisy)
    assert abs(float(m2["l1"]) - 0.1) < 1e-5
    assert abs(float(m2["psnr"]) - 20.0) < 0.1     # mse = 0.01


def test_recon_metrics_lpips_branch():
    """recon_metrics includes 'lpips' iff a callable is supplied
    (the RGB-model eval path, cli._run_eval)."""
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    lpips = lambda a, b: jnp.mean(jnp.abs(a - b), axis=(1, 2, 3))
    m = recon_metrics(x, x + 0.1, lpips_apply=lpips)
    assert abs(float(m["lpips"]) - 0.1) < 1e-5
    assert "lpips" not in recon_metrics(x, x)


def test_codebook_stats():
    # uniform usage over 8 codes
    idx = jnp.tile(jnp.arange(8), 10)
    s = codebook_stats(idx, 16)
    assert abs(float(s["perplexity"]) - 8.0) < 1e-3
    assert float(s["used_fraction"]) == 0.5
    # collapsed codebook
    s2 = codebook_stats(jnp.zeros(100, jnp.int32), 16)
    assert abs(float(s2["perplexity"]) - 1.0) < 1e-3
    assert float(s2["max_usage"]) == 1.0


def test_fid_zero_for_same_distribution():
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((500, 8))
    mu, cov = feats.mean(0), np.cov(feats, rowvar=False)
    assert fid_from_features(mu, cov, mu, cov) < 1e-6
    # shifted distribution has positive distance ~ ||shift||^2
    d = fid_from_features(mu + 2.0, cov, mu, cov)
    assert abs(d - 4.0 * 8) < 1.0


def test_fid_accumulator_streaming():
    rng = np.random.default_rng(1)
    feature_fn = lambda imgs: np.asarray(imgs).reshape(len(imgs), -1)
    a = FIDAccumulator(feature_fn)
    b = FIDAccumulator(feature_fn)
    data = rng.standard_normal((64, 2, 2, 1))
    for i in range(0, 64, 16):
        a.update(data[i:i + 16])
        b.update(data[i:i + 16] + 1.0)
    assert a.fid(a) < 1e-6
    assert a.fid(b) > 1.0


def test_evaluate_vq_model_smoke():
    from mas_tpu.data.dataset import SyntheticImgBatches
    from mas_tpu.eval import evaluate_vq_model
    from mas_tpu.models.vqvae import VQModel
    from mas_tpu.utils.config import CodebookConfig, VQModelConfig

    cfg = VQModelConfig(in_channels=3, out_channels=3, resolution=32,
                        channels=(32, 32), num_res_blocks=1,
                        attn_resolutions=(), z_channels=32, embed_dim=32,
                        codebook=CodebookConfig(codebook_size=16,
                                                codebook_dim=32))
    model = VQModel(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)))
    metrics = evaluate_vq_model(
        model, variables, iter(SyntheticImgBatches(2, resolution=32)),
        n_batches=2)
    for key in ("l1", "psnr", "perplexity", "used_fraction"):
        assert key in metrics and np.isfinite(metrics[key])
