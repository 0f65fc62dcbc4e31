"""Reconstruction-quality evaluation harness.

The reference publishes no benchmarks and has no eval scripts (SURVEY §6);
BASELINE.md sets recon quality (LPIPS / FID-style distributional metrics)
as self-generated targets.  This module supplies the measurement tooling:

  * ``recon_metrics`` — per-batch L1 / MSE / PSNR + LPIPS (given an LPIPS
    apply fn; random-init LPIPS still ranks models consistently, converted
    torch weights give the canonical value),
  * ``codebook_stats`` — usage entropy / perplexity / dead-code fraction of
    a token histogram (the health metric for the k-means bootstrap),
  * ``fid_from_features`` / ``FIDAccumulator`` — Fréchet distance over any
    feature extractor (InceptionV3 weights are not bundled in this
    zero-egress image; the VGG16 LPIPS trunk or a converted torch Inception
    both plug in via ``feature_fn``).

Everything is jit-friendly; accumulators live on host numpy.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def recon_metrics(images: jax.Array, recon: jax.Array,
                  lpips_apply: Optional[Callable] = None) -> Dict[str, jax.Array]:
    """images/recon [B, H, W, C] in [0, 1] -> scalar metric dict."""
    x = images.astype(jnp.float32)
    y = recon.astype(jnp.float32)
    l1 = jnp.mean(jnp.abs(x - y))
    mse = jnp.mean(jnp.square(x - y))
    psnr = -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
    out = dict(l1=l1, mse=mse, psnr=psnr)
    if lpips_apply is not None:
        out["lpips"] = jnp.mean(lpips_apply(x, y))
    return out


def codebook_stats(indices: jax.Array, codebook_size: int) -> Dict[str, jax.Array]:
    """Token indices [...] -> usage histogram health metrics."""
    flat = indices.reshape(-1)
    counts = jnp.bincount(flat, length=codebook_size)
    p = counts / jnp.maximum(jnp.sum(counts), 1)
    entropy = -jnp.sum(jnp.where(p > 0, p * jnp.log(p), 0.0))
    return dict(
        perplexity=jnp.exp(entropy),
        entropy=entropy,
        used_fraction=jnp.mean((counts > 0).astype(jnp.float32)),
        max_usage=jnp.max(p),
    )


def fid_from_features(mu1, sigma1, mu2, sigma2) -> float:
    """Fréchet distance between two feature Gaussians (host numpy;
    the matrix sqrt via ``scipy.linalg.sqrtm`` on the covariance
    product, real part taken against numerical imaginary leakage)."""
    import scipy.linalg as _sl  # scipy ships with the image

    mu1, mu2 = np.asarray(mu1), np.asarray(mu2)
    sigma1, sigma2 = np.asarray(sigma1), np.asarray(sigma2)
    diff = mu1 - mu2
    covmean, _ = _sl.sqrtm(sigma1 @ sigma2, disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


class FIDAccumulator:
    """Streaming mean/covariance of feature vectors for FID.

    ``feature_fn(images [B,H,W,C]) -> [B, D]``; call ``update`` per batch
    on both the real and generated streams, then ``fid(other)``.
    """

    def __init__(self, feature_fn: Callable):
        self.feature_fn = feature_fn
        self.n = 0
        self.sum: Optional[np.ndarray] = None
        self.outer: Optional[np.ndarray] = None

    def update(self, images) -> None:
        f = np.asarray(self.feature_fn(images), np.float64)
        if self.sum is None:
            d = f.shape[1]
            self.sum = np.zeros((d,))
            self.outer = np.zeros((d, d))
        self.n += f.shape[0]
        self.sum += f.sum(axis=0)
        self.outer += f.T @ f

    def stats(self):
        assert self.n > 1, "need >1 samples"
        mu = self.sum / self.n
        cov = (self.outer - self.n * np.outer(mu, mu)) / (self.n - 1)
        return mu, cov

    def fid(self, other: "FIDAccumulator") -> float:
        mu1, s1 = self.stats()
        mu2, s2 = other.stats()
        return fid_from_features(mu1, s1, mu2, s2)


def lpips_feature_fn(lpips_model, lpips_vars) -> Callable:
    """Spatially-pooled VGG16 tap features as a generic FID feature fn
    (stand-in for InceptionV3 pool3 in this zero-egress build; converted
    torch weights drop in the same way)."""
    from .losses.lpips import VGG16Features

    vgg_params = {"params": lpips_vars["params"]["vgg"]}
    trunk = VGG16Features()

    @jax.jit
    def features(images):
        taps = trunk.apply(vgg_params, images.astype(jnp.float32))
        pooled = [jnp.mean(t, axis=(1, 2)) for t in taps]
        return jnp.concatenate(pooled, axis=-1)

    return lambda images: features(jnp.asarray(images))


def evaluate_vq_model(model, variables, batches, n_batches: int = 8,
                      lpips_apply: Optional[Callable] = None) -> Dict[str, float]:
    """Run the eval loop: reconstruct ``n_batches`` and aggregate metrics
    + codebook stats (the eval the reference never shipped)."""
    from .models.vqvae import VQModel

    @jax.jit
    def step(images):
        recon, _ = model.apply(variables, images)
        toks = model.apply(variables, images, method=VQModel.encode_tokens)
        return recon, toks

    agg: Dict[str, list] = {}
    for i, batch in enumerate(batches):
        if i >= n_batches:
            break
        images = jnp.asarray(batch["image"] if "image" in batch
                             else batch["mask"])
        recon, toks = step(images)
        m = recon_metrics(images, recon, lpips_apply)
        m.update(codebook_stats(toks, model.cfg.codebook.codebook_size))
        for k, v in m.items():
            agg.setdefault(k, []).append(float(v))
    return {k: float(np.mean(v)) for k, v in agg.items()}
