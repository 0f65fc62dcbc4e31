"""Smoke-test the recon-quality benchmark plumbing (tiny CPU geometry).

benchmarks/recon_quality.py is the script that produces BASELINE.md's
measured quality numbers on the real chip; this pins its three stages
end-to-end (train -> eval -> metrics json -> grids) so the on-chip run
never dies late.
"""

import json
import os

import numpy as np
import pytest

import benchmarks.recon_quality as rq
from mas_tpu.utils.config import (CodebookConfig, TransformerConfig,
                                  vq_img_config, vq_seg_config)

# the three tiny stages are compile-dominated (~12 min on the 8-fake-device
# CPU mesh) — opt-in so the default suite stays fast; run before touching
# benchmarks/recon_quality.py with MAS_SLOW_TESTS=1
pytestmark = pytest.mark.skipif(not os.environ.get("MAS_SLOW_TESTS"),
                                reason="slow 3-stage smoke; set "
                                       "MAS_SLOW_TESTS=1")


TINY_CB = CodebookConfig(codebook_size=16, codebook_dim=16, init_steps=2,
                         reservoir_size=512, samples_per_image=4,
                         kmeans_iters=2)


@pytest.fixture()
def tiny(tmp_path, monkeypatch):
    monkeypatch.setattr(rq, "RES", 32)
    # keep the seg pipeline at the test resolution (the real script pins
    # SEG_RES=256 at every --res; 32 keeps sub_seg the identity and the
    # seg checkpoint inside tmp_path)
    monkeypatch.setattr(rq, "SEG_RES", 32)
    monkeypatch.setattr(rq, "BATCH", 8)
    monkeypatch.setattr(rq, "AR_BATCH", 8)
    monkeypatch.setattr(rq, "CKPT", str(tmp_path / "ckpt"))
    monkeypatch.setattr(rq, "RESULTS", str(tmp_path / "results"))
    chans = (32, 32, 32, 32, 32, 32)
    monkeypatch.setattr(rq, "seg_model_cfg", lambda: vq_seg_config(
        resolution=32, attn_resolutions=(2,), channels=chans,
        z_channels=16, embed_dim=16,
        codebook=TINY_CB.replace(codebook_size=16)))
    monkeypatch.setattr(rq, "img_model_cfg", lambda: vq_img_config(
        resolution=32, attn_resolutions=(2,), channels=chans,
        z_channels=16, embed_dim=16, codebook=TINY_CB))
    monkeypatch.setattr(rq, "ar_cfg", lambda: TransformerConfig(
        num_layers=2, hidden_dim=32, num_attn_heads=4,
        image_vocab_size=16, seg_vocab_size=16,
        text_vocab_size=64 + rq.TEXT_LEN, image_tokens_per_dim=2,
        seg_tokens_per_dim=2, text_length=rq.TEXT_LEN))
    return tmp_path


def test_all_stages_produce_metrics_and_grids(tiny, monkeypatch):
    rq.stage_seg(steps=8)
    rq.stage_img(steps=8, disc_start=4)
    rq.stage_ar(steps=4)
    with open(os.path.join(rq.RESULTS, "recon_quality.json")) as f:
        data = json.load(f)
    sfx = "" if rq.RES == 256 else f"_{rq.RES}"   # record() suffixes keys
    assert 0.0 <= data[f"seg{sfx}"]["argmax_accuracy"] <= 1.0
    assert data[f"img{sfx}"]["psnr"] > 0
    assert np.isfinite(data[f"img{sfx}"]["recon_fid_vgg"])
    for kv in ("int8", "int4"):
        assert 0.0 <= data[f"ar{sfx}"][f"{kv}_token_agreement"] <= 1.0
        assert data[f"ar{sfx}"][f"{kv}_sample_l1_delta"] >= 0.0
    # grids carry the same per-resolution suffix as the metric keys
    assert os.path.exists(
        os.path.join(rq.RESULTS, f"vqimg_recon_grid{sfx}.png"))
    assert os.path.exists(
        os.path.join(rq.RESULTS, f"ar_samples_grid{sfx}.png"))

    # GQA quality row (--ar-kv-heads): trains/records under ar_kv{N}
    # without touching the MHA row or checkpoint
    monkeypatch.setattr(rq, "AR_KV_HEADS", 2)
    monkeypatch.setattr(rq, "ar_cfg", lambda: TransformerConfig(
        num_layers=2, hidden_dim=32, num_attn_heads=4, num_kv_heads=2,
        image_vocab_size=16, seg_vocab_size=16,
        text_vocab_size=64 + rq.TEXT_LEN, image_tokens_per_dim=2,
        seg_tokens_per_dim=2, text_length=rq.TEXT_LEN))
    rq.stage_ar(steps=4)
    with open(os.path.join(rq.RESULTS, "recon_quality.json")) as f:
        data = json.load(f)
    assert f"ar_kv2{sfx}" in data and f"ar{sfx}" in data
    assert np.isfinite(data[f"ar_kv2{sfx}"]["compute_sample_fid_vgg"])
    assert os.path.exists(
        os.path.join(rq.RESULTS, f"ar_kv2_samples_grid{sfx}.png"))
