"""Flash attention kernel vs jnp reference: forward, gradients, mask
semantics, and the transformer integration (SURVEY §4(f) strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mas_tpu.ops.attention import (flash_attention,
                                   prefix_causal_attention,
                                   prefix_causal_attention_jnp)


def _rand(b=1, h=2, t=256, d=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    mk = lambda k: jax.random.normal(k, (b, h, t, d), jnp.float32)
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


@pytest.mark.parametrize("prefix", [0, 100, 128, 200, 256])
def test_forward_matches_jnp(prefix):
    q, k, v = _rand()
    ref = prefix_causal_attention_jnp(q, k, v, prefix)
    out = flash_attention(q, k, v, prefix, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_block_skipping_tail_rows():
    """Rows far past the prefix only see causal keys; first row sees only
    itself (plus prefix when prefix>0)."""
    q, k, v = _rand(t=256)
    out0 = flash_attention(q, k, v, 0, interpret=True)
    # row 0 with no prefix attends only to key 0 -> output == v[...,0,:]
    np.testing.assert_allclose(np.asarray(out0[:, :, 0]),
                               np.asarray(v[:, :, 0]), atol=1e-5)


def test_prefix_bidirectional():
    """Inside the prefix, position 0 must see position prefix-1 (future)."""
    prefix = 128
    q, k, v = _rand(t=256)
    out = flash_attention(q, k, v, prefix, interpret=True)
    # causal-only output differs at row 0 (it can't see keys 1..127)
    causal = flash_attention(q, k, v, 0, interpret=True)
    assert not np.allclose(np.asarray(out[:, :, 0]),
                           np.asarray(causal[:, :, 0]), atol=1e-4)


@pytest.mark.parametrize("prefix", [0, 100, 128])
def test_gradients_match_jnp(prefix):
    q, k, v = _rand(t=256, h=1)

    def loss_ref(q, k, v):
        return jnp.sum(prefix_causal_attention_jnp(q, k, v, prefix) ** 2)

    def loss_fa(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, prefix, 128, 128, True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fa, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4,
                                   err_msg=f"d{name}")


def test_dispatch_jnp_fallback():
    q, k, v = _rand(t=96)       # not block-divisible -> jnp on any backend
    out = prefix_causal_attention(q, k, v, 32, impl="auto")
    ref = prefix_causal_attention_jnp(q, k, v, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_transformer_uses_flash_equivalently():
    """MakeAScene forward with attention_impl='pallas_interpret' must match
    the jnp path (same logits)."""
    from mas_tpu.models.transformer import MakeAScene
    from mas_tpu.utils.config import TransformerConfig

    base = dict(num_layers=2, hidden_dim=128, num_attn_heads=2,
                image_vocab_size=64, seg_vocab_size=32,
                text_vocab_size=128 + 64, image_tokens_per_dim=16,
                seg_tokens_per_dim=8, text_length=64)
    # total = 64 + 64 + 256 = 384 tokens = 3 x 128 blocks
    cfg_jnp = TransformerConfig(**base, attention_impl="jnp")
    cfg_fa = TransformerConfig(**base, attention_impl="pallas_interpret")
    rng = jax.random.PRNGKey(0)
    text = jax.random.randint(rng, (2, 64), 1, 128)
    seg = jax.random.randint(rng, (2, 64), 0, 32)
    img = jax.random.randint(rng, (2, 256), 0, 64)

    m_jnp = MakeAScene(cfg_jnp)
    variables = m_jnp.init(jax.random.PRNGKey(1), text, seg, img)
    out_jnp = m_jnp.apply(variables, text, seg, img)
    m_fa = MakeAScene(cfg_fa)
    out_fa = m_fa.apply(variables, text, seg, img)
    np.testing.assert_allclose(np.asarray(out_fa), np.asarray(out_jnp),
                               atol=2e-4, rtol=2e-4)


class TestDecodeAttention:
    """HBM-resident single-token decode kernel vs the full-cache jnp path."""

    def _setup(self, t=256, b=2, h=2, d=64, seed=0):
        # caches in the transposed decode layout [B, H, d, T]
        ks = jax.random.split(jax.random.PRNGKey(seed), 3)
        q = jax.random.normal(ks[0], (b, h, 1, d), jnp.float32)
        k = jax.random.normal(ks[1], (b, h, d, t), jnp.float32)
        v = jax.random.normal(ks[2], (b, h, d, t), jnp.float32)
        return q, k, v

    @pytest.mark.parametrize("index", [0, 1, 127, 128, 200, 255])
    def test_matches_jnp(self, index):
        from mas_tpu.ops.decode_attention import (decode_attention,
                                                  decode_attention_jnp)

        q, k, v = self._setup()
        ref = decode_attention_jnp(q, k, v, jnp.int32(index))
        out = decode_attention(q, k, v, jnp.int32(index),
                               impl="pallas_interpret")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_ignores_tail_garbage(self):
        """Cache positions past index must not affect the output."""
        from mas_tpu.ops.decode_attention import decode_attention

        q, k, v = self._setup()
        idx = jnp.int32(100)
        out1 = decode_attention(q, k, v, idx, impl="pallas_interpret")
        k2 = k.at[:, :, :, 101:].set(1e6)
        v2 = v.at[:, :, :, 101:].set(-1e6)
        out2 = decode_attention(q, k2, v2, idx, impl="pallas_interpret")
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   atol=1e-6)

    def test_bf16_cache(self):
        from mas_tpu.ops.decode_attention import (decode_attention,
                                                  decode_attention_jnp)

        q, k, v = self._setup()
        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
        ref = decode_attention_jnp(qb, kb, vb, jnp.int32(77))
        out = decode_attention(qb, kb, vb, jnp.int32(77),
                               impl="pallas_interpret")
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=2e-2)


class TestInt8KVCache:
    def test_quantize_roundtrip_error_bound(self):
        from mas_tpu.ops.quant import dequantize_kv, quantize_kv

        kv = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 64, 32))
        qc = quantize_kv(kv)
        assert qc.q.dtype == jnp.int8
        err = np.max(np.abs(np.asarray(dequantize_kv(qc)) - np.asarray(kv)))
        # symmetric int8: error <= scale/2 = max|kv| / 254 per position
        assert err <= float(jnp.max(jnp.abs(kv))) / 254 + 1e-6

    def test_int8_decode_matches_dequantized_exact(self):
        from mas_tpu.ops.decode_attention import decode_attention_jnp
        from mas_tpu.ops.quant import (decode_attention_int8, quantize_kv,
                                       update_quant_cache)

        ks = jax.random.split(jax.random.PRNGKey(1), 3)
        q = jax.random.normal(ks[0], (2, 2, 1, 64))
        k_t = jax.random.normal(ks[1], (2, 2, 64, 128))
        v_t = jax.random.normal(ks[2], (2, 2, 64, 128))
        kq, vq = quantize_kv(k_t), quantize_kv(v_t)
        idx = jnp.int32(100)
        out8 = decode_attention_int8(q, kq, vq, idx)
        # exact attention over the SAME dequantized values must match
        from mas_tpu.ops.quant import dequantize_kv
        ref = decode_attention_jnp(q, dequantize_kv(kq), dequantize_kv(vq),
                                   idx)
        np.testing.assert_allclose(np.asarray(out8), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)
        # and stay close to the unquantized attention
        full = decode_attention_jnp(q, k_t, v_t, idx)
        assert np.max(np.abs(np.asarray(out8) - np.asarray(full))) < 0.05

    def test_int8_fused_pallas_matches_jnp(self):
        """The fused int8 decode kernel (block-skipping + scales + softmax
        in one pass) must match the XLA int8 path bit-for-bit-ish."""
        from mas_tpu.ops.quant import decode_attention_int8, quantize_kv

        ks = jax.random.split(jax.random.PRNGKey(4), 3)
        q = jax.random.normal(ks[0], (2, 4, 1, 64))
        k_t = jax.random.normal(ks[1], (2, 4, 64, 256))
        v_t = jax.random.normal(ks[2], (2, 4, 64, 256))
        kq, vq = quantize_kv(k_t), quantize_kv(v_t)
        for idx in (0, 100, 255):
            ref = decode_attention_int8(q, kq, vq, jnp.int32(idx))
            out = decode_attention_int8(q, kq, vq, jnp.int32(idx),
                                        impl="pallas_interpret")
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=1e-5, rtol=1e-4)

    def test_bf16_scale_quantize_roundtrip(self):
        """kv_scale_dtype=bfloat16: the int grid is built against the
        ROUNDED stored scale, so the extra error stays within one bf16
        ulp of the scale (~0.4%) on top of the int rounding."""
        from mas_tpu.ops.quant import dequantize_kv, quantize_kv

        kv = jax.random.normal(jax.random.PRNGKey(7), (2, 2, 64, 32))
        qc = quantize_kv(kv, scale_dtype=jnp.bfloat16)
        assert qc.scale.dtype == jnp.bfloat16
        err = np.max(np.abs(np.asarray(dequantize_kv(qc)) - np.asarray(kv)))
        amax = float(jnp.max(jnp.abs(kv)))
        assert err <= amax / 254 * 1.01 + 1e-6

    def test_bf16_scale_decode_matches_dequantized_exact(self):
        from mas_tpu.ops.decode_attention import decode_attention_jnp
        from mas_tpu.ops.quant import (decode_attention_int8, dequantize_kv,
                                       quantize_kv, update_quant_cache)

        ks = jax.random.split(jax.random.PRNGKey(8), 3)
        q = jax.random.normal(ks[0], (2, 2, 1, 64))
        k_t = jax.random.normal(ks[1], (2, 2, 64, 128))
        v_t = jax.random.normal(ks[2], (2, 2, 64, 128))
        kq = quantize_kv(k_t, scale_dtype=jnp.bfloat16)
        vq = quantize_kv(v_t, scale_dtype=jnp.bfloat16)
        idx = jnp.int32(100)
        out = decode_attention_int8(q, kq, vq, idx)
        ref = decode_attention_jnp(q, dequantize_kv(kq), dequantize_kv(vq),
                                   idx)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)
        # cache writes preserve the stored scale dtype
        upd = update_quant_cache(kq, jnp.ones((2, 2, 64, 1)), jnp.int32(3))
        assert upd.scale.dtype == jnp.bfloat16

    def test_update_quant_cache_write(self):
        from mas_tpu.ops.quant import (dequantize_kv, quantize_kv,
                                       update_quant_cache)

        k_t = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 8, 16))
        qc = quantize_kv(k_t)
        new = jnp.full((1, 2, 8, 1), 3.0)
        qc2 = update_quant_cache(qc, new, jnp.int32(5))
        deq = np.asarray(dequantize_kv(qc2))
        np.testing.assert_allclose(deq[0, :, :, 5], 3.0, rtol=1e-2)
        # other positions untouched
        np.testing.assert_allclose(deq[0, :, :, 4],
                                   np.asarray(dequantize_kv(qc))[0, :, :, 4])

    def test_sampler_with_int8_cache(self):
        """End-to-end sampling with the int8 cache: valid tokens, and (at
        tiny scale) mostly identical samples to the fp path."""
        from mas_tpu.models.sampler import sample_tokens
        from mas_tpu.models.transformer import MakeAScene
        from mas_tpu.utils.config import TransformerConfig

        base = dict(num_layers=2, hidden_dim=64, num_attn_heads=8,
                    image_vocab_size=128, seg_vocab_size=128,
                    text_vocab_size=128 + 16, image_tokens_per_dim=4,
                    seg_tokens_per_dim=2, text_length=16)
        cfg_fp = TransformerConfig(**base)
        cfg_q = TransformerConfig(**base, kv_cache_dtype="int8")
        rng = jax.random.PRNGKey(0)
        text = jax.random.randint(rng, (2, 16), 1, 100)
        seg = jax.random.randint(rng, (2, 4), 0, 128)
        m_fp = MakeAScene(cfg_fp)
        variables = m_fp.init(jax.random.PRNGKey(1), text, seg,
                              jnp.zeros((2, 16), jnp.int32))
        toks_fp = sample_tokens(m_fp, variables, text, seg,
                                jax.random.PRNGKey(2), guidance_scale=2.0,
                                top_k=8)
        m_q = MakeAScene(cfg_q)
        toks_q = sample_tokens(m_q, variables, text, seg,
                               jax.random.PRNGKey(2), guidance_scale=2.0,
                               top_k=8)
        assert toks_q.shape == toks_fp.shape
        assert int(toks_q.max()) < cfg_q.image_vocab_size
        # same rng + near-identical logits -> overwhelmingly equal samples
        agree = float(np.mean(np.asarray(toks_q) == np.asarray(toks_fp)))
        assert agree > 0.8, agree

    def test_sampler_with_bf16_scales(self):
        """kv_scale_dtype=bfloat16 end-to-end: the sampler seeds/writes
        bf16 scales and the samples stay close to the fp32-scale path."""
        from mas_tpu.models.sampler import sample_tokens
        from mas_tpu.models.transformer import MakeAScene
        from mas_tpu.utils.config import ConfigError, TransformerConfig

        base = dict(num_layers=2, hidden_dim=64, num_attn_heads=8,
                    image_vocab_size=128, seg_vocab_size=128,
                    text_vocab_size=128 + 16, image_tokens_per_dim=4,
                    seg_tokens_per_dim=2, text_length=16)
        rng = jax.random.PRNGKey(0)
        text = jax.random.randint(rng, (2, 16), 1, 100)
        seg = jax.random.randint(rng, (2, 4), 0, 128)
        m32 = MakeAScene(TransformerConfig(**base, kv_cache_dtype="int4"))
        variables = m32.init(jax.random.PRNGKey(1), text, seg,
                             jnp.zeros((2, 16), jnp.int32))
        toks32 = sample_tokens(m32, variables, text, seg,
                               jax.random.PRNGKey(2), guidance_scale=2.0,
                               top_k=8)
        m16 = MakeAScene(TransformerConfig(
            **base, kv_cache_dtype="int4", kv_scale_dtype="bfloat16"))
        toks16 = sample_tokens(m16, variables, text, seg,
                               jax.random.PRNGKey(2), guidance_scale=2.0,
                               top_k=8)
        agree = float(np.mean(np.asarray(toks16) == np.asarray(toks32)))
        assert agree > 0.8, agree
        # bf16 scales require the quantized 'lane' decode path
        with pytest.raises(ConfigError):
            TransformerConfig(**base, kv_scale_dtype="bfloat16")
        with pytest.raises(ConfigError):
            TransformerConfig(**base, kv_cache_dtype="int8",
                              kv_cache_layout="lane_aliased",
                              kv_scale_dtype="bfloat16")


def test_auto_blocks_rules():
    from mas_tpu.ops.attention import auto_blocks

    # flagship geometries: single-pass (blk_k = T) regime
    assert auto_blocks(1408) == (128, 1408)
    assert auto_blocks(640) == (128, 640)
    # huge T: score tile would blow the VMEM budget -> block the k axis
    assert auto_blocks(128 * 128) == (128, 128)
    # non-128-multiple: whole-array fallback blocks
    q, k = auto_blocks(96)
    assert q == 96 and k == 96


class TestRudalleFused:
    """rudalle_relax via the flash kernel: the sigma/midpoint variant
    reduces to softmax(q.k/(sqrt(d) sigma^2)) (see
    transformer.rudalle_relax_attention_fused), so the fused path must
    match the literal jnp port exactly (up to fp reassociation)."""

    def _mask(self, t, prefix):
        pos = jnp.arange(t)
        from mas_tpu.models.transformer import prefix_causal_mask
        return prefix_causal_mask(pos, pos, prefix)

    @pytest.mark.parametrize("prefix", [0, 128])
    def test_forward_matches_literal(self, prefix):
        from mas_tpu.models.transformer import (
            rudalle_relax_attention, rudalle_relax_attention_fused)

        q, k, v = _rand(b=2, h=2, t=256, d=64, seed=7)
        ref = rudalle_relax_attention(q, k, v, self._mask(256, prefix))
        out = rudalle_relax_attention_fused(q, k, v, prefix,
                                            impl="pallas_interpret")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5, rtol=3e-5)

    def test_gradients_match_literal(self):
        from mas_tpu.models.transformer import (
            rudalle_relax_attention, rudalle_relax_attention_fused)

        q, k, v = _rand(b=1, h=2, t=128, d=64, seed=8)
        mask = self._mask(128, 64)
        f_ref = lambda q, k, v: jnp.sum(
            rudalle_relax_attention(q, k, v, mask) ** 2)
        f_out = lambda q, k, v: jnp.sum(
            rudalle_relax_attention_fused(q, k, v, 64,
                                          impl="pallas_interpret") ** 2)
        g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        g_out = jax.grad(f_out, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_out, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=5e-4)

    def test_transformer_rudalle_pallas_config_accepted(self):
        from mas_tpu.utils.config import TransformerConfig

        cfg = TransformerConfig(num_layers=1, hidden_dim=64,
                                num_attn_heads=2, rudalle_relax=True,
                                attention_impl="pallas")
        assert cfg.rudalle_relax


class TestBandSplit:
    """Band-split single-pass path (static per-band k-extents,
    index-map windows): engages when blk_k == t and prefix % blk_q == 0."""

    def test_band_plan(self):
        from mas_tpu.ops import attention as A

        assert A.band_plan(1408, 128, 384) == (
            [(0, 384, 384)]
            + [(s, 128, s + 128) for s in range(384, 1408, 128)])
        assert not A._band_ok(1408, 128, 1408, 384)  # opt-in: default off
        old = A.BAND_SPLIT
        A.BAND_SPLIT = True
        try:
            assert A._band_ok(1408, 128, 1408, 384)
            assert not A._band_ok(1408, 128, 128, 384)   # multi-block
            assert not A._band_ok(1408, 128, 1408, 100)  # unaligned prefix
            assert not A._band_ok(1408, 128, 1408, 0)    # no prefix
            assert not A._band_ok(640, 128, 640, 384)    # below the t gate
        finally:
            A.BAND_SPLIT = old

    @pytest.mark.parametrize("prefix", [128, 256])
    def test_forward_matches_jnp(self, prefix):
        from mas_tpu.ops.attention import _flash_fwd_banded

        q, k, v = _rand(t=384)
        ref = prefix_causal_attention_jnp(q, k, v, prefix)
        out, lse = _flash_fwd_banded(q, k, v, prefix, 128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
        assert np.all(np.isfinite(np.asarray(lse)))

    @pytest.mark.parametrize("prefix", [128, 256])
    def test_backward_matches_jnp(self, prefix):
        from mas_tpu.ops.attention import (_flash_bwd_banded,
                                           _flash_fwd_banded)

        q, k, v = _rand(t=384, h=1)

        def loss_ref(q, k, v):
            return jnp.sum(prefix_causal_attention_jnp(q, k, v, prefix) ** 2)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        out, lse = _flash_fwd_banded(q, k, v, prefix, 128, interpret=True)
        g_banded = _flash_bwd_banded(q, k, v, out, lse, 2.0 * out, prefix,
                                     128, interpret=True)
        for a, b, name in zip(g_banded, g_ref, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=1e-4,
                                       err_msg=f"d{name}")
