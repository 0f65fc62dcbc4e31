"""Packed aliased KV-cache (ops/decode_cache.py) — the round-3 decode
write path.  Parity chain: pallas_interpret write == jnp DUS write ==
lane-layout quantized cache; packed attention == exact attention over the
dequantized values; sampler end-to-end with kv_cache_layout='packed'
matches the lane path token-for-token (same per-position quantization
scheme, identical rng).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mas_tpu.ops.decode_cache import (PackedQuantCache,
                                      decode_attention_packed,
                                      pack_quantize, seed_packed_cache,
                                      update_packed_cache)


def _rand_kv(seed=0, b=2, h=2, t=128, d=64):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, h, 1, d))
    k = jax.random.normal(ks[1], (b, h, t, d))
    v = jax.random.normal(ks[2], (b, h, t, d))
    return q, k, v


class TestPackQuantize:
    @pytest.mark.parametrize("dtype", [jnp.int8, jnp.int4])
    def test_roundtrip_error_bound(self, dtype):
        _, k, v = _rand_kv()
        c = pack_quantize(k, v, dtype=dtype)
        d = k.shape[-1]
        assert c.kv.shape == (*k.shape[:3], 2 * d)
        assert c.scale.shape == (2, *k.shape[:3])
        deq_k = np.asarray(c.kv[..., :d], np.float32) * np.asarray(
            c.scale[0])[..., None]
        qmax = 7.0 if dtype == jnp.int4 else 127.0
        err = np.max(np.abs(deq_k - np.asarray(k)))
        assert err <= float(jnp.max(jnp.abs(k))) / (2 * qmax) + 1e-6

    def test_seed_packed_cache_prefix(self):
        _, k, v = _rand_kv(t=40)
        c = seed_packed_cache(k, v, total=128)
        ref = pack_quantize(k, v)
        assert c.kv.shape[2] == 128 and c.scale.shape[-1] == 128
        np.testing.assert_array_equal(np.asarray(c.kv[:, :, :40]),
                                      np.asarray(ref.kv))
        np.testing.assert_array_equal(np.asarray(c.scale[..., :40]),
                                      np.asarray(ref.scale))
        assert not np.asarray(c.kv[:, :, 40:]).any()
        np.testing.assert_array_equal(np.asarray(c.scale[..., 40:]), 1.0)


class TestAliasedWrite:
    @pytest.mark.parametrize("dtype", [jnp.int8, jnp.int4])
    @pytest.mark.parametrize("index", [0, 5, 63, 127])
    def test_interpret_matches_jnp(self, dtype, index):
        _, k, v = _rand_kv()
        cache = pack_quantize(k, v, dtype=dtype)
        k_new = jnp.full((2, 2, 1, 64), 1.5)
        v_new = jnp.full((2, 2, 1, 64), -0.75)
        a = update_packed_cache(cache, k_new, v_new, jnp.int32(index),
                                impl="pallas_interpret")
        b = update_packed_cache(cache, k_new, v_new, jnp.int32(index),
                                impl="jnp")
        np.testing.assert_array_equal(np.asarray(a.kv.astype(jnp.int8)),
                                      np.asarray(b.kv.astype(jnp.int8)))
        np.testing.assert_array_equal(np.asarray(a.scale),
                                      np.asarray(b.scale))

    def test_jnp_write_only_touches_index(self):
        _, k, v = _rand_kv()
        cache = pack_quantize(k, v)
        k_new = jnp.full((2, 2, 1, 64), 2.0)
        v_new = jnp.full((2, 2, 1, 64), 3.0)
        out = update_packed_cache(cache, k_new, v_new, jnp.int32(7),
                                  impl="jnp")
        d = 64
        deq_k7 = (np.asarray(out.kv[:, :, 7, :d], np.float32)
                  * np.asarray(out.scale[0, :, :, 7])[..., None])
        np.testing.assert_allclose(deq_k7, 2.0, rtol=1e-2)
        deq_v7 = (np.asarray(out.kv[:, :, 7, d:], np.float32)
                  * np.asarray(out.scale[1, :, :, 7])[..., None])
        np.testing.assert_allclose(deq_v7, 3.0, rtol=1e-2)
        mask = np.arange(128) != 7
        np.testing.assert_array_equal(np.asarray(out.kv)[:, :, mask],
                                      np.asarray(cache.kv)[:, :, mask])


class TestPackedAttention:
    def test_matches_dequantized_exact(self):
        from mas_tpu.ops.decode_attention import decode_attention_jnp
        from mas_tpu.ops.quant import QuantCache, dequantize_kv

        q, k, v = _rand_kv(seed=3)
        cache = pack_quantize(k, v)
        idx = jnp.int32(100)
        out = decode_attention_packed(q, cache, idx)
        d = 64
        # identical values through the lane-layout [B,H,d,T] machinery
        kq = QuantCache(cache.kv[..., :d].transpose(0, 1, 3, 2),
                        cache.scale[0][:, :, None, :])
        vq = QuantCache(cache.kv[..., d:].transpose(0, 1, 3, 2),
                        cache.scale[1][:, :, None, :])
        ref = decode_attention_jnp(q, dequantize_kv(kq), dequantize_kv(vq),
                                   idx)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)
        full = decode_attention_jnp(q, k.transpose(0, 1, 3, 2),
                                    v.transpose(0, 1, 3, 2), idx)
        assert np.max(np.abs(np.asarray(out) - np.asarray(full))) < 0.05


_BASE = dict(num_layers=2, hidden_dim=64, num_attn_heads=8,
             image_vocab_size=128, seg_vocab_size=128,
             text_vocab_size=128 + 48, image_tokens_per_dim=8,
             seg_tokens_per_dim=4, text_length=48)   # total = 128


class TestSamplerPacked:
    @pytest.mark.parametrize("qdt", ["int8", "int4"])
    def test_matches_lane_layout_tokens(self, qdt):
        from mas_tpu.models.sampler import sample_tokens
        from mas_tpu.models.transformer import MakeAScene
        from mas_tpu.utils.config import TransformerConfig

        cfg_lane = TransformerConfig(**_BASE, kv_cache_dtype=qdt)
        cfg_packed = TransformerConfig(**_BASE, kv_cache_dtype=qdt,
                                       kv_cache_layout="packed")
        assert cfg_packed.total_length == 128
        rng = jax.random.PRNGKey(0)
        text = jax.random.randint(rng, (2, 48), 1, 100)
        seg = jax.random.randint(rng, (2, 16), 0, 128)
        m_lane = MakeAScene(cfg_lane)
        variables = m_lane.init(jax.random.PRNGKey(1), text, seg,
                                jnp.zeros((2, 64), jnp.int32))
        toks_lane = sample_tokens(m_lane, variables, text, seg,
                                  jax.random.PRNGKey(2),
                                  guidance_scale=2.0, top_k=8)
        m_packed = MakeAScene(cfg_packed)
        toks_packed = sample_tokens(m_packed, variables, text, seg,
                                    jax.random.PRNGKey(2),
                                    guidance_scale=2.0, top_k=8)
        assert toks_packed.shape == toks_lane.shape == (2, 64)
        assert int(toks_packed.min()) >= 0
        assert int(toks_packed.max()) < cfg_packed.image_vocab_size
        # same quantization scheme + same rng: identical trajectories up to
        # fp reassociation in the attention contraction order
        agree = float(np.mean(np.asarray(toks_packed)
                              == np.asarray(toks_lane)))
        assert agree > 0.8, agree


class TestConfigGating:
    def test_packed_requires_quantized_dtype(self):
        from mas_tpu.utils.config import ConfigError, TransformerConfig

        with pytest.raises(ConfigError, match="packed"):
            TransformerConfig(**_BASE, kv_cache_layout="packed")

    def test_packed_rejects_ring_tail(self):
        from mas_tpu.utils.config import ConfigError, TransformerConfig

        with pytest.raises(ConfigError, match="pick one"):
            TransformerConfig(**_BASE, kv_cache_dtype="int8",
                              kv_cache_layout="packed",
                              decode_ring_tail=True)

    def test_packed_requires_128_multiple(self):
        from mas_tpu.utils.config import ConfigError, TransformerConfig

        bad = dict(_BASE, text_length=40, text_vocab_size=128 + 40)
        with pytest.raises(ConfigError, match="128"):
            TransformerConfig(**bad, kv_cache_dtype="int8",
                              kv_cache_layout="packed")


class TestLaneAliased:
    """lane_aliased: same lane-layout QuantCache pair and read path as
    'lane', only the write becomes the aliased 128-lane-block RMW kernel
    (ops/decode_cache.py::update_quant_caches_aliased)."""

    @pytest.mark.parametrize("dtype", [jnp.int8, jnp.int4])
    @pytest.mark.parametrize("index", [0, 5, 128, 255])
    def test_interpret_matches_jnp(self, dtype, index):
        from mas_tpu.ops.decode_cache import update_quant_caches_aliased
        from mas_tpu.ops.quant import quantize_kv

        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        kc = quantize_kv(jax.random.normal(ks[0], (4, 2, 64, 256)),
                         dtype=dtype)
        vc = quantize_kv(jax.random.normal(ks[1], (4, 2, 64, 256)),
                         dtype=dtype)
        kn = jax.random.normal(ks[2], (4, 2, 64, 1))
        vn = jax.random.normal(ks[3], (4, 2, 64, 1))
        a = update_quant_caches_aliased(kc, vc, kn, vn, jnp.int32(index),
                                        impl="pallas_interpret")
        b = update_quant_caches_aliased(kc, vc, kn, vn, jnp.int32(index),
                                        impl="jnp")
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(
                np.asarray(x.astype(jnp.float32)),
                np.asarray(y.astype(jnp.float32)))

    def test_jnp_write_matches_plain_lane_updates(self):
        from mas_tpu.ops.decode_cache import update_quant_caches_aliased
        from mas_tpu.ops.quant import quantize_kv, update_quant_cache

        ks = jax.random.split(jax.random.PRNGKey(1), 4)
        kc = quantize_kv(jax.random.normal(ks[0], (2, 2, 64, 128)))
        vc = quantize_kv(jax.random.normal(ks[1], (2, 2, 64, 128)))
        kn = jax.random.normal(ks[2], (2, 2, 64, 1))
        vn = jax.random.normal(ks[3], (2, 2, 64, 1))
        a_k, a_v = update_quant_caches_aliased(kc, vc, kn, vn,
                                               jnp.int32(9), impl="jnp")
        b_k = update_quant_cache(kc, kn, jnp.int32(9))
        b_v = update_quant_cache(vc, vn, jnp.int32(9))
        for x, y in zip(jax.tree.leaves((a_k, a_v)),
                        jax.tree.leaves((b_k, b_v))):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    @pytest.mark.parametrize("dtype", [jnp.int8, jnp.int4])
    @pytest.mark.parametrize("index", [0, 130, 255])
    def test_interpret_matches_jnp_gqa_shapes(self, dtype, index):
        """Grouped-query caches ([B, kv_heads, d, T], kv_heads < H) go
        through the same kernel — the GQA write-path lever (BASELINE r4:
        XLA stops in-placing grouped DUS carries, so on TPU the aliased
        RMW replaces a 10.5 MB whole-cache copy per cache per token)."""
        from mas_tpu.ops.decode_cache import update_quant_caches_aliased
        from mas_tpu.ops.quant import quantize_kv

        ks = jax.random.split(jax.random.PRNGKey(3), 4)
        kc = quantize_kv(jax.random.normal(ks[0], (4, 2, 64, 256)),
                         dtype=dtype)   # 2 kv heads serving 8 q heads
        vc = quantize_kv(jax.random.normal(ks[1], (4, 2, 64, 256)),
                         dtype=dtype)
        kn = jax.random.normal(ks[2], (4, 2, 64, 1))
        vn = jax.random.normal(ks[3], (4, 2, 64, 1))
        a = update_quant_caches_aliased(kc, vc, kn, vn, jnp.int32(index),
                                        impl="pallas_interpret")
        b = update_quant_caches_aliased(kc, vc, kn, vn, jnp.int32(index),
                                        impl="jnp")
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(
                np.asarray(x.astype(jnp.float32)),
                np.asarray(y.astype(jnp.float32)))

    def test_interpret_matches_jnp_bf16_scales(self):
        """The kernel is scale-dtype generic (scratch/new dtypes follow
        the cache); the quantization must also happen against the ROUNDED
        stored scale on both impls."""
        from mas_tpu.ops.decode_cache import update_quant_caches_aliased
        from mas_tpu.ops.quant import quantize_kv

        ks = jax.random.split(jax.random.PRNGKey(4), 4)
        kc = quantize_kv(jax.random.normal(ks[0], (2, 2, 64, 128)),
                         scale_dtype=jnp.bfloat16)
        vc = quantize_kv(jax.random.normal(ks[1], (2, 2, 64, 128)),
                         scale_dtype=jnp.bfloat16)
        kn = jax.random.normal(ks[2], (2, 2, 64, 1))
        vn = jax.random.normal(ks[3], (2, 2, 64, 1))
        a = update_quant_caches_aliased(kc, vc, kn, vn, jnp.int32(65),
                                        impl="pallas_interpret")
        b = update_quant_caches_aliased(kc, vc, kn, vn, jnp.int32(65),
                                        impl="jnp")
        assert a[0].scale.dtype == jnp.bfloat16
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(
                np.asarray(x.astype(jnp.float32)),
                np.asarray(y.astype(jnp.float32)))

    def test_sampler_identical_tokens_gqa_vs_lane(self):
        """GQA + lane_aliased (now permitted by config) must produce the
        exact token trajectory of GQA + 'lane' on the jnp write path."""
        from mas_tpu.models.sampler import sample_tokens
        from mas_tpu.models.transformer import MakeAScene
        from mas_tpu.utils.config import TransformerConfig

        cfg_lane = TransformerConfig(**_BASE, kv_cache_dtype="int8",
                                     num_kv_heads=2)
        cfg_al = TransformerConfig(**_BASE, kv_cache_dtype="int8",
                                   num_kv_heads=2,
                                   kv_cache_layout="lane_aliased")
        rng = jax.random.PRNGKey(0)
        text = jax.random.randint(rng, (2, 48), 1, 100)
        seg = jax.random.randint(rng, (2, 16), 0, 128)
        m = MakeAScene(cfg_lane)
        variables = m.init(jax.random.PRNGKey(1), text, seg,
                           jnp.zeros((2, 64), jnp.int32))
        toks_lane = sample_tokens(m, variables, text, seg,
                                  jax.random.PRNGKey(2),
                                  guidance_scale=2.0, top_k=8)
        m_al = MakeAScene(cfg_al)
        toks_al = sample_tokens(m_al, variables, text, seg,
                                jax.random.PRNGKey(2),
                                guidance_scale=2.0, top_k=8)
        np.testing.assert_array_equal(np.asarray(toks_al),
                                      np.asarray(toks_lane))

    def test_sampler_identical_tokens_vs_lane(self):
        """On the jnp write path the math is IDENTICAL to 'lane' — token
        trajectories must match exactly."""
        from mas_tpu.models.sampler import sample_tokens
        from mas_tpu.models.transformer import MakeAScene
        from mas_tpu.utils.config import TransformerConfig

        cfg_lane = TransformerConfig(**_BASE, kv_cache_dtype="int8")
        cfg_al = TransformerConfig(**_BASE, kv_cache_dtype="int8",
                                   kv_cache_layout="lane_aliased")
        rng = jax.random.PRNGKey(0)
        text = jax.random.randint(rng, (2, 48), 1, 100)
        seg = jax.random.randint(rng, (2, 16), 0, 128)
        m = MakeAScene(cfg_lane)
        variables = m.init(jax.random.PRNGKey(1), text, seg,
                           jnp.zeros((2, 64), jnp.int32))
        toks_lane = sample_tokens(m, variables, text, seg,
                                  jax.random.PRNGKey(2),
                                  guidance_scale=2.0, top_k=8)
        m_al = MakeAScene(cfg_al)
        toks_al = sample_tokens(m_al, variables, text, seg,
                                jax.random.PRNGKey(2),
                                guidance_scale=2.0, top_k=8)
        np.testing.assert_array_equal(np.asarray(toks_al),
                                      np.asarray(toks_lane))


class TestDecodeQRows:
    """Query-row padding (decode_q_rows, BASELINE round 4): zero rows are
    numerically inert — the sampler's token trajectory must be identical
    to the unpadded path for quantized AND float caches, MHA and GQA."""

    def _sample(self, cfg_kw, seed=0):
        from mas_tpu.models.sampler import sample_tokens
        from mas_tpu.models.transformer import MakeAScene
        from mas_tpu.utils.config import TransformerConfig

        cfg = TransformerConfig(**_BASE, **cfg_kw)
        rng = jax.random.PRNGKey(seed)
        text = jax.random.randint(rng, (2, 48), 1, 100)
        seg = jax.random.randint(rng, (2, 16), 0, 128)
        m = MakeAScene(cfg)
        variables = m.init(jax.random.PRNGKey(1), text, seg,
                           jnp.zeros((2, 64), jnp.int32))
        return sample_tokens(m, variables, text, seg, jax.random.PRNGKey(2),
                             guidance_scale=2.0, top_k=8)

    @pytest.mark.parametrize("cache", ["compute", "int8", "int4"])
    @pytest.mark.parametrize("rows", [4, 8])
    def test_identical_tokens(self, cache, rows):
        base = self._sample(dict(kv_cache_dtype=cache))
        padded = self._sample(dict(kv_cache_dtype=cache,
                                   decode_q_rows=rows))
        np.testing.assert_array_equal(np.asarray(padded), np.asarray(base))

    def test_identical_tokens_gqa(self):
        base = self._sample(dict(kv_cache_dtype="int8", num_kv_heads=2))
        padded = self._sample(dict(kv_cache_dtype="int8", num_kv_heads=2,
                                   decode_q_rows=8))
        np.testing.assert_array_equal(np.asarray(padded), np.asarray(base))

    def test_config_gating(self):
        from mas_tpu.utils.config import ConfigError, TransformerConfig

        with pytest.raises(ConfigError, match="decode_q_rows"):
            TransformerConfig(**_BASE, decode_q_rows=0)
        with pytest.raises(ConfigError, match="jnp read path"):
            TransformerConfig(**_BASE, decode_q_rows=4,
                              decode_attention_impl="pallas")
        with pytest.raises(ConfigError, match="lane"):
            TransformerConfig(**_BASE, kv_cache_dtype="int8",
                              kv_cache_layout="packed", decode_q_rows=4)


class TestLengthBuckets:
    """Length-bucketed decode reads (VERDICT r3: skip the dead cache tail
    without splitting the scan carry)."""

    def test_bucket_bound_construction(self):
        from mas_tpu.models.transformer import _length_buckets

        # prefix excludes useless bounds; last is always t
        assert _length_buckets(640, 4, prefix=384) == (512, 640)
        assert _length_buckets(1408, 8, prefix=384) == (
            512, 640, 768, 896, 1024, 1152, 1280, 1408)
        # thinning keeps t and stays ascending
        got = _length_buckets(1408, 4, prefix=384)
        assert got[-1] == 1408 and list(got) == sorted(set(got))
        assert len(got) <= 4
        # degenerate: n=1, or no 128-multiple beyond the prefix
        assert _length_buckets(1408, 1, prefix=0) == ()
        assert _length_buckets(128, 4, prefix=64) == ()

    @pytest.mark.parametrize("index", [70, 200, 310])
    def test_op_parity_vs_full_read(self, index):
        from mas_tpu.ops.quant import decode_attention_int8, quantize_kv

        q, k, v = _rand_kv(seed=3, t=320)
        kc = quantize_kv(k.transpose(0, 1, 3, 2))
        vc = quantize_kv(v.transpose(0, 1, 3, 2))
        idx = jnp.int32(index)
        full = decode_attention_int8(q, kc, vc, idx)
        bucketed = decode_attention_int8(q, kc, vc, idx,
                                         bucket_bounds=(128, 256, 320))
        np.testing.assert_allclose(np.asarray(bucketed), np.asarray(full),
                                   atol=1e-6)

    def test_sampler_identical_tokens(self):
        from mas_tpu.models.sampler import sample_tokens
        from mas_tpu.models.transformer import MakeAScene
        from mas_tpu.utils.config import TransformerConfig

        base = dict(_BASE, image_tokens_per_dim=16)       # total 320
        cfg1 = TransformerConfig(**base, kv_cache_dtype="int4")
        cfgb = TransformerConfig(**base, kv_cache_dtype="int4",
                                 decode_length_buckets=3)
        rng = jax.random.PRNGKey(0)
        text = jax.random.randint(rng, (2, 48), 1, 100)
        seg = jax.random.randint(rng, (2, 16), 0, 128)
        m = MakeAScene(cfg1)
        variables = m.init(jax.random.PRNGKey(1), text, seg,
                           jnp.zeros((2, 256), jnp.int32))
        toks1 = sample_tokens(m, variables, text, seg, jax.random.PRNGKey(2),
                              guidance_scale=2.0, top_k=8)
        toksb = sample_tokens(MakeAScene(cfgb), variables, text, seg,
                              jax.random.PRNGKey(2),
                              guidance_scale=2.0, top_k=8)
        np.testing.assert_array_equal(np.asarray(toksb), np.asarray(toks1))

    def test_config_rejects_ring_tail_combo(self):
        from mas_tpu.utils.config import ConfigError, TransformerConfig

        with pytest.raises(ConfigError):
            TransformerConfig(**_BASE, kv_cache_dtype="int8",
                              decode_length_buckets=2, decode_ring_tail=True)
