import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mas_tpu.models.transformer import (MakeAScene, pb_relax_attention,
                                        prefix_causal_mask)
from mas_tpu.utils.config import TransformerConfig

TINY = TransformerConfig(
    num_layers=2, hidden_dim=64, num_attn_heads=8,
    image_vocab_size=128, seg_vocab_size=128, text_vocab_size=128 + 16,
    image_tokens_per_dim=4, seg_tokens_per_dim=2, text_length=16)
# lengths: text 16, seg 4, image 16 => total 36, prefix 20


def make_inputs(key, cfg=TINY, batch=2):
    k1, k2, k3 = jax.random.split(key, 3)
    text = jax.random.randint(k1, (batch, cfg.text_length), 0,
                              cfg.text_vocab_size - cfg.text_length)
    seg = jax.random.randint(k2, (batch, cfg.seg_length), 0,
                             cfg.seg_vocab_size)
    img = jax.random.randint(k3, (batch, cfg.image_length), 0,
                             cfg.image_vocab_size)
    return text, seg, img


def test_forward_shape():
    model = MakeAScene(TINY)
    text, seg, img = make_inputs(jax.random.PRNGKey(0))
    variables = model.init(jax.random.PRNGKey(1), text, seg, img)
    logits = model.apply(variables, text, seg, img)
    # matches the reference smoke assert (transformer.py:403)
    assert logits.shape == (2, TINY.image_length, TINY.image_vocab_size)


def test_mask_semantics():
    mask = prefix_causal_mask(jnp.arange(6), jnp.arange(6), 3)
    m = np.array(mask)
    # prefix block fully bidirectional
    assert m[:3, :3].all()
    # image part strictly causal
    assert m[3, 4] == False  # noqa: E712
    assert m[4, 3] == True   # noqa: E712
    assert m[5, 5] == True   # noqa: E712


def test_causality():
    """changing a later image token must not affect earlier logits; changing
    text must affect everything (bidirectional prefix)."""
    model = MakeAScene(TINY)
    text, seg, img = make_inputs(jax.random.PRNGKey(0))
    variables = model.init(jax.random.PRNGKey(1), text, seg, img)
    base = model.apply(variables, text, seg, img)

    img2 = img.at[:, -1].set((img[:, -1] + 1) % TINY.image_vocab_size)
    pert = model.apply(variables, text, seg, img2)
    # logits[t] predicts token t from tokens < t; last token feeds only
    # nothing (it's never input to any kept position)
    np.testing.assert_allclose(np.array(base), np.array(pert), atol=1e-5)

    img3 = img.at[:, 0].set((img[:, 0] + 1) % TINY.image_vocab_size)
    pert3 = model.apply(variables, text, seg, img3)
    # position 0 is input for logits[1:] but not logits[0]
    np.testing.assert_allclose(np.array(base[:, 0]), np.array(pert3[:, 0]),
                               atol=1e-5)
    assert np.abs(np.array(base[:, 1:]) - np.array(pert3[:, 1:])).max() > 1e-4


def test_text_pad_remap():
    """pad token 0 at different positions embeds differently (remapped to a
    per-position vocab slot, reference transformer.py:350-353)."""
    model = MakeAScene(TINY)
    text, seg, img = make_inputs(jax.random.PRNGKey(0))
    variables = model.init(jax.random.PRNGKey(1), text, seg, img)
    zeros = jnp.zeros_like(text)
    emb = model.apply(variables, zeros, method=MakeAScene.embed_text)
    # all-pad text still gets distinct embeddings across positions
    diffs = np.abs(np.array(emb[:, 0]) - np.array(emb[:, 1])).max()
    assert diffs > 1e-4


def test_pb_relax_is_softmax_invariant():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (1, 2, 8, 16))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 16))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 8, 16))
    mask = jnp.tril(jnp.ones((8, 8), bool))
    out_relax = pb_relax_attention(q, k, v, mask, pb_relax=True)
    out_plain = pb_relax_attention(q, k, v, mask, pb_relax=False)
    np.testing.assert_allclose(np.array(out_relax), np.array(out_plain),
                               atol=1e-5)


class TestDecode:
    def test_prefill_matches_full_forward(self):
        model = MakeAScene(TINY)
        text, seg, img = make_inputs(jax.random.PRNGKey(0))
        variables = model.init(jax.random.PRNGKey(1), text, seg, img)
        full = model.apply(variables, text, seg, img)
        logits0, caches = model.apply(variables, text, seg,
                                      method=MakeAScene.prefill)
        # full logits[:, 0] is the prediction for image token 0 — computed
        # from the last prefix position; prefill returns exactly that
        np.testing.assert_allclose(np.array(logits0), np.array(full[:, 0]),
                                   atol=1e-4)
        assert len(caches) == TINY.num_layers
        assert caches[0][0].shape == (2, TINY.num_attn_heads,
                                      TINY.prefix_length, TINY.head_dim)

    def test_decode_steps_match_full_forward(self):
        """KV-cache decode logits == training forward logits (reference
        inference path equivalence, SURVEY §4(e))."""
        cfg = TINY
        model = MakeAScene(cfg)
        text, seg, img = make_inputs(jax.random.PRNGKey(0))
        variables = model.init(jax.random.PRNGKey(1), text, seg, img)
        full = model.apply(variables, text, seg, img)  # [B, T_img, V]

        logits0, caches = model.apply(variables, text, seg,
                                      method=MakeAScene.prefill)
        # decode caches use the TRANSPOSED [B, H, hd, total] layout
        from mas_tpu.ops.decode_attention import transpose_cache
        total = cfg.total_length
        full_buf = jnp.zeros((2, cfg.num_attn_heads, cfg.head_dim, total),
                             caches[0][0].dtype)
        caches = tuple(
            (jax.lax.dynamic_update_slice(full_buf, transpose_cache(k),
                                          (0, 0, 0, 0)),
             jax.lax.dynamic_update_slice(full_buf, transpose_cache(v),
                                          (0, 0, 0, 0)))
            for k, v in caches)

        got = [logits0]
        for step in range(cfg.image_length - 1):
            tok = img[:, step:step + 1]   # teacher-force the real tokens
            logits, caches = model.apply(
                variables, tok, step, caches,
                method=MakeAScene.decode_step)
            got.append(logits)
        got = jnp.stack(got, axis=1)      # [B, T_img, V]
        np.testing.assert_allclose(np.array(got), np.array(full), atol=2e-4)


def test_sampler_runs():
    from mas_tpu.models.sampler import sample_tokens
    model = MakeAScene(TINY)
    text, seg, img = make_inputs(jax.random.PRNGKey(0))
    variables = model.init(jax.random.PRNGKey(1), text, seg, img)
    toks = sample_tokens(model, variables, text, seg, jax.random.PRNGKey(2),
                         guidance_scale=2.0, temperature=1.0, top_k=32)
    assert toks.shape == (2, TINY.image_length)
    assert toks.dtype == jnp.int32
    assert int(toks.max()) < TINY.image_vocab_size
    assert int(toks.min()) >= 0


def test_bfloat16_compute_close_to_fp32():
    """bf16 compute dtype: fp32 params, bf16 activations, fp32 logits out;
    values stay close to the fp32 path."""
    import numpy as np

    from mas_tpu.models.transformer import MakeAScene
    from mas_tpu.utils.config import TransformerConfig

    base = dict(num_layers=2, hidden_dim=64, num_attn_heads=4,
                image_vocab_size=32, seg_vocab_size=16, text_vocab_size=64,
                image_tokens_per_dim=2, seg_tokens_per_dim=2, text_length=4)
    t = jnp.zeros((2, 4), jnp.int32)
    s = jnp.zeros((2, 4), jnp.int32)
    i = jnp.zeros((2, 4), jnp.int32)
    m32 = MakeAScene(TransformerConfig(**base))
    v = m32.init(jax.random.PRNGKey(0), t, s, i)
    out32 = m32.apply(v, t, s, i)
    m16 = MakeAScene(TransformerConfig(**base, compute_dtype="bfloat16"))
    out16 = m16.apply(v, t, s, i)
    assert out16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               atol=0.05, rtol=0.1)


def test_remat_matches_plain():
    """remat=True must be numerically identical (it only changes the
    backward-pass memory/compute tradeoff)."""
    cfg_plain = TINY
    cfg_remat = TINY.replace(remat=True)
    text, seg, img = make_inputs(jax.random.PRNGKey(0))
    m0 = MakeAScene(cfg_plain)
    variables = m0.init(jax.random.PRNGKey(1), text, seg, img)
    m1 = MakeAScene(cfg_remat)
    np.testing.assert_allclose(
        np.asarray(m0.apply(variables, text, seg, img)),
        np.asarray(m1.apply(variables, text, seg, img)), atol=1e-6)
    g0 = jax.grad(lambda p: jnp.mean(
        m0.apply({"params": p}, text, seg, img) ** 2))(variables["params"])
    g1 = jax.grad(lambda p: jnp.mean(
        m1.apply({"params": p}, text, seg, img) ** 2))(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sample_images_chunked_decode():
    """sample_images decodes pixels in lax.map chunks when the batch
    divides; output matches the unchunked path."""
    from mas_tpu.models.sampler import sample_images
    from mas_tpu.models.vqvae import VQModel
    from mas_tpu.utils.config import CodebookConfig, VQModelConfig

    model = MakeAScene(TINY)
    text, seg, img = make_inputs(jax.random.PRNGKey(0), batch=4)
    variables = model.init(jax.random.PRNGKey(1), text, seg, img)
    vq_cfg = VQModelConfig(
        in_channels=3, out_channels=3,
        resolution=TINY.image_tokens_per_dim * 2, channels=(32, 32, 32),
        num_res_blocks=1, attn_resolutions=(), z_channels=32, embed_dim=32,
        codebook=CodebookConfig(codebook_size=TINY.image_vocab_size,
                                codebook_dim=32))
    vq = VQModel(vq_cfg)
    vvars = vq.init(jax.random.PRNGKey(2),
                    jnp.zeros((1, vq_cfg.resolution, vq_cfg.resolution, 3)))
    out_chunked = sample_images(model, variables, vq, vvars, text, seg,
                                jax.random.PRNGKey(3), guidance_scale=2.0,
                                top_k=8, decode_chunk=2)
    out_full = sample_images(model, variables, vq, vvars, text, seg,
                             jax.random.PRNGKey(3), guidance_scale=2.0,
                             top_k=8, decode_chunk=0)
    assert out_chunked.shape == (4, vq_cfg.resolution, vq_cfg.resolution, 3)
    np.testing.assert_allclose(np.asarray(out_chunked),
                               np.asarray(out_full), atol=1e-5)


def test_sample_logits_topk_distribution():
    """The select-k-then-categorical head samples the SAME distribution as
    masking the vocab to the top-k (ids outside top-k never drawn; inside,
    softmax-proportional)."""
    from mas_tpu.models.sampler import _sample_logits

    logits = jnp.array([[0.0, 1.0, 2.0, 3.0, -1.0, 0.5]])
    keys = jax.random.split(jax.random.PRNGKey(0), 4000)
    toks = jax.vmap(
        lambda k: _sample_logits(logits, k, 1.0, 3, approx=False))(keys)
    counts = np.bincount(np.asarray(toks).ravel(), minlength=6)
    assert counts[0] == counts[4] == counts[5] == 0
    probs = np.exp(np.array([1.0, 2.0, 3.0]))
    probs /= probs.sum()
    emp = counts[[1, 2, 3]] / counts.sum()
    np.testing.assert_allclose(emp, probs, atol=0.03)


def test_sample_logits_approx_head_within_topk():
    """The serving default (approx=True, lax.approx_max_k) must stay
    inside a clearly separated true top-k set and hit every member."""
    from mas_tpu.models.sampler import _sample_logits

    # top-3 separated from the rest by a wide margin
    logits = jnp.array([[9.0, -50.0, 10.0, -50.0, 8.5, -50.0]])
    keys = jax.random.split(jax.random.PRNGKey(1), 2000)
    toks = np.asarray(jax.vmap(
        lambda k: _sample_logits(logits, k, 1.0, 3, approx=True))(keys))
    counts = np.bincount(toks.ravel(), minlength=6)
    assert counts[1] == counts[3] == counts[5] == 0
    assert (counts[[0, 2, 4]] > 0).all()


# ---------------------------------------------------------------------------
# grouped-query attention (no reference analog; serving-architecture option)
# ---------------------------------------------------------------------------

GQA = TINY.replace(num_kv_heads=2)   # 8 query heads, 2 kv heads, group 4


class TestGroupedQueryAttention:
    def test_cache_shapes_shrink(self):
        model = MakeAScene(GQA)
        text, seg, img = make_inputs(jax.random.PRNGKey(0), GQA)
        variables = model.init(jax.random.PRNGKey(1), text, seg, img)
        _, caches = model.apply(variables, text, seg,
                                method=MakeAScene.prefill)
        # the cache (and thus decode's dominant HBM stream) carries only
        # kv_heads heads — a 4x reduction at this group size
        assert caches[0][0].shape == (2, 2, GQA.prefix_length, GQA.head_dim)

    def test_decode_matches_full_forward(self):
        """The grouped single-pass cached read must equal the full forward
        (same equivalence contract as the MHA TestDecode)."""
        cfg = GQA
        model = MakeAScene(cfg)
        text, seg, img = make_inputs(jax.random.PRNGKey(0), cfg)
        variables = model.init(jax.random.PRNGKey(1), text, seg, img)
        full = model.apply(variables, text, seg, img)

        logits0, caches = model.apply(variables, text, seg,
                                      method=MakeAScene.prefill)
        from mas_tpu.ops.decode_attention import transpose_cache
        buf = jnp.zeros((2, cfg.kv_heads, cfg.head_dim, cfg.total_length),
                        caches[0][0].dtype)
        caches = tuple(
            (jax.lax.dynamic_update_slice(buf, transpose_cache(k),
                                          (0, 0, 0, 0)),
             jax.lax.dynamic_update_slice(buf, transpose_cache(v),
                                          (0, 0, 0, 0)))
            for k, v in caches)
        got = [logits0]
        for step in range(cfg.image_length - 1):
            logits, caches = model.apply(
                variables, img[:, step:step + 1], step, caches,
                method=MakeAScene.decode_step)
            got.append(logits)
        got = jnp.stack(got, axis=1)
        np.testing.assert_allclose(np.array(got), np.array(full), atol=2e-4)

    @pytest.mark.parametrize("kv_dtype", ["compute", "int8", "int4"])
    def test_sampler_runs_quantized(self, kv_dtype):
        from mas_tpu.models.sampler import sample_tokens
        cfg = GQA.replace(kv_cache_dtype=kv_dtype)
        model = MakeAScene(cfg)
        text, seg, img = make_inputs(jax.random.PRNGKey(0), cfg)
        variables = model.init(jax.random.PRNGKey(1), text, seg, img)
        toks = sample_tokens(model, variables, text, seg,
                             jax.random.PRNGKey(2), guidance_scale=2.0,
                             top_k=16)
        assert toks.shape == (2, cfg.image_length)
        assert int(toks.max()) < cfg.image_vocab_size

    def test_trains_under_grad(self):
        """The kv-head repeat must be differentiable (gradient segment-sums
        back onto the shared kv projections)."""
        model = MakeAScene(GQA)
        text, seg, img = make_inputs(jax.random.PRNGKey(0), GQA)
        variables = model.init(jax.random.PRNGKey(1), text, seg, img)

        def loss_fn(params):
            logits = model.apply({"params": params}, text, seg, img)
            onehot = jax.nn.one_hot(img, GQA.image_vocab_size)
            return -(jax.nn.log_softmax(logits) * onehot).sum(-1).mean()

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        assert np.isfinite(float(loss))
        g = grads["layer_0"]["attn"]["qkv"]["kernel"]
        kv_dim = GQA.kv_heads * GQA.head_dim
        assert g.shape == (GQA.hidden_dim, GQA.hidden_dim + 2 * kv_dim)
        assert float(jnp.abs(g).max()) > 0

    def test_mha_param_layout_unchanged(self):
        """num_kv_heads=0 (default) must keep the exact reference fused
        3*hidden qkv projection — checkpoint compatibility."""
        model = MakeAScene(TINY)
        text, seg, img = make_inputs(jax.random.PRNGKey(0))
        variables = model.init(jax.random.PRNGKey(1), text, seg, img)
        k = variables["params"]["layer_0"]["attn"]["qkv"]["kernel"]
        assert k.shape == (TINY.hidden_dim, 3 * TINY.hidden_dim)

    def test_config_validation(self):
        from mas_tpu.utils.config import ConfigError
        with pytest.raises(ConfigError, match="positive divisor"):
            TINY.replace(num_kv_heads=3)
        with pytest.raises(ConfigError, match="positive divisor"):
            TINY.replace(num_kv_heads=-4)
        with pytest.raises(ConfigError, match="lane"):
            TINY.replace(num_kv_heads=2, kv_cache_dtype="int8",
                         kv_cache_layout="packed",
                         text_length=108)  # total 128-multiple
        with pytest.raises(ConfigError, match="rudalle"):
            TINY.replace(num_kv_heads=2, rudalle_relax=True)
        # explicit pallas decode reads would be silently jnp under GQA —
        # reject at config time so bench A/Bs can't mislabel themselves
        with pytest.raises(ConfigError, match="jnp read"):
            TINY.replace(num_kv_heads=2, decode_attention_impl="pallas")


def test_layernorm_impl_flag_preserves_forward():
    # layernorm_impl='pallas' must not change params or (off-TPU, via the
    # jnp fallback) the forward values
    text, seg, img = make_inputs(jax.random.PRNGKey(0))
    ref_model = MakeAScene(TINY)
    variables = ref_model.init(jax.random.PRNGKey(1), text, seg, img)
    ref = ref_model.apply(variables, text, seg, img)
    cfg = TINY.replace(layernorm_impl="pallas")
    got = MakeAScene(cfg).apply(variables, text, seg, img)
    np.testing.assert_allclose(np.array(got), np.array(ref), atol=1e-6)
