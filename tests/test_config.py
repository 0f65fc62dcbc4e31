import pytest

from mas_tpu.utils.config import (CodebookConfig, ConfigError, MeshConfig,
                                  TrainConfig, TransformerConfig,
                                  VQModelConfig)
from mas_tpu.utils.config import vq_seg_config, vq_img_config


def test_unknown_keys_rejected():
    # the reference silently swallows taming-style keys (SURVEY §2.4 pitfall)
    with pytest.raises(ConfigError):
        VQModelConfig.from_dict({"ch": 128, "ch_mult": [1, 1, 2, 2, 4]})
    with pytest.raises(ConfigError):
        TrainConfig.from_dict({"mode": "pretrain_segmentation",
                               "bogus_key": 1})


def test_seg_config_channels():
    cfg = vq_seg_config()
    assert cfg.in_channels == 159
    assert cfg.out_channels == 159          # the reference bug would give 3
    assert cfg.latent_resolution == 16      # 256 / 16
    assert cfg.codebook.codebook_size == 1024


def test_img_config_geometry():
    cfg = vq_img_config()
    assert cfg.latent_resolution == 32      # 512 / 16
    assert cfg.codebook.codebook_size == 8192
    assert cfg.spatial_reduction == 16


def test_codebook_phases():
    cb = CodebookConfig(init_steps=2000)
    assert cb.q_start_collect == 2000
    assert cb.q_init == 6000
    assert cb.q_re_end == 60000
    assert cb.q_re_step == 1000


def test_transformer_lengths():
    cfg = TransformerConfig()
    assert cfg.total_length == 128 + 256 + 1024
    assert cfg.prefix_length == 384


def test_mesh_shape():
    assert MeshConfig(data=-1, model=2).shape(8) == (4, 2)
    with pytest.raises(ConfigError):
        MeshConfig(data=3, model=2).shape(8)


def test_reservoir_must_cover_codebook():
    # k-means bootstrap draws codebook_size centroids from the reservoir
    # (ops/kmeans.py top_k) — undersized reservoirs must fail at config
    # time, not at trace time inside the train step
    with pytest.raises(ConfigError):
        CodebookConfig(codebook_size=8192, reservoir_size=4096)
    CodebookConfig(codebook_size=8192, reservoir_size=8192)  # boundary ok
