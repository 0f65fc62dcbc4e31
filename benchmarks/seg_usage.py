"""Codebook-usage sample-size curve for the trained VQ-SEG checkpoint.

``codebook_used_fraction`` is a sample-size-dependent statistic: the
round-4 seg stage saw 703/1024 codes (68.7%) over 64 held-out scenes
(65k token draws) at perplexity 289 — more scenes surface more of the
tail.  This script restores the saved seg checkpoint (no retraining) and
reports distinct-code counts at 64..2048 scenes, appending a
``seg_usage_curve`` row to results/recon_quality.json.  The 1024/2048
points extend the curve to its plateau (VERDICT r4 #6: the >=80% round-2
bar is answered by the asymptote, not a fixed eval size).

Run: python benchmarks/seg_usage.py  (real TPU, ~6 min; needs
/tmp/recon_q/seg from a completed seg stage)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import benchmarks.recon_quality as rq


def main():
    from mas_tpu.data.segmap import one_hot_seg_packed
    from mas_tpu.eval import codebook_stats
    from mas_tpu.models.vqvae import VQModel

    mcfg = rq.seg_model_cfg()
    model, variables = rq.restore_vq("seg", mcfg)

    @jax.jit
    def enc(packed):
        return model.apply(variables, one_hot_seg_packed(packed),
                           method=VQModel.encode_tokens)

    counts = np.zeros(mcfg.codebook.codebook_size, np.int64)
    metrics, scenes = {}, 0
    checkpoints = (64, 128, 256, 512, 1024, 2048)
    # the eval stream's scene pool must be at least as deep as the curve's
    # last point, or the tail "new scenes" would be reshuffled repeats
    rq.TRAIN_CACHE = max(rq.TRAIN_CACHE, checkpoints[-1])
    for i, batch in enumerate(rq.seg_batches(seed=999)):
        toks = np.asarray(enc(jnp.asarray(batch["seg_packed"]))).ravel()
        counts += np.bincount(toks, minlength=len(counts))
        scenes += rq.BATCH
        if scenes in checkpoints:
            cb = codebook_stats(
                jnp.asarray(np.repeat(np.arange(len(counts)), counts)),
                len(counts))
            used = int((counts > 0).sum())
            metrics[f"used_at_{scenes}_scenes"] = used / len(counts)
            metrics[f"perplexity_at_{scenes}_scenes"] = float(
                cb["perplexity"])
            print(f"{scenes:4d} scenes: {used}/{len(counts)} codes "
                  f"({used / len(counts):.1%}), perplexity "
                  f"{float(cb['perplexity']):.1f}", flush=True)
        if scenes >= checkpoints[-1]:
            break
    rq.record("seg_usage_curve", metrics)


if __name__ == "__main__":
    main()
