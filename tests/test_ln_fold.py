"""LN->matmul fold parity (cfg.ln_matmul_fold, ops.norms.folded_ln_dense).

The fold is an algebraic restructuring of Dense(LayerNorm(x)) — same
parameter tree, same math up to bf16 reassociation — so a folded model
must reproduce the unfolded model's logits and gradients from the SAME
variables, and checkpoints must be interchangeable both ways.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from mas_tpu.models.transformer import MakeAScene
from mas_tpu.ops.norms import folded_ln_dense, layer_norm
from mas_tpu.utils.config import TransformerConfig

TINY = dict(
    num_layers=2, hidden_dim=64, num_attn_heads=8,
    image_vocab_size=128, seg_vocab_size=128, text_vocab_size=128 + 16,
    image_tokens_per_dim=4, seg_tokens_per_dim=2, text_length=16)


def _inputs(key, cfg, batch=2):
    k1, k2, k3 = jax.random.split(key, 3)
    text = jax.random.randint(k1, (batch, cfg.text_length), 0,
                              cfg.text_vocab_size - cfg.text_length)
    seg = jax.random.randint(k2, (batch, cfg.seg_length), 0,
                             cfg.seg_vocab_size)
    img = jax.random.randint(k3, (batch, cfg.image_length), 0,
                             cfg.image_vocab_size)
    return text, seg, img


def test_folded_ln_dense_matches_unfused():
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 5)
    x = jax.random.normal(ks[0], (3, 7, 32)) * 3.0 + 0.5
    g = jax.random.normal(ks[1], (32,)) * 0.2 + 1.0
    b = jax.random.normal(ks[2], (32,)) * 0.1
    w = jax.random.normal(ks[3], (32, 48)) * 0.05
    db = jax.random.normal(ks[4], (48,)) * 0.1
    ref = layer_norm(x, g, b) @ w + db
    out = folded_ln_dense(x, g, b, w, db)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dtype,tol", [("float32", 2e-4),
                                       ("bfloat16", 6e-2)])
def test_fold_forward_parity_same_variables(dtype, tol):
    cfg_off = TransformerConfig(**TINY, compute_dtype=dtype)
    cfg_on = TransformerConfig(**TINY, compute_dtype=dtype,
                               ln_matmul_fold=True)
    m_off, m_on = MakeAScene(cfg_off), MakeAScene(cfg_on)
    text, seg, img = _inputs(jax.random.PRNGKey(0), cfg_off)
    variables = m_off.init(jax.random.PRNGKey(1), text, seg, img)
    # checkpoint interchangeability: the folded model consumes the
    # unfolded model's variables verbatim (identical param tree)
    lo = np.asarray(m_off.apply(variables, text, seg, img), np.float32)
    lf = np.asarray(m_on.apply(variables, text, seg, img), np.float32)
    scale = np.abs(lo).max()
    np.testing.assert_allclose(lf, lo, atol=tol * scale, rtol=0)


def test_fold_param_tree_identical():
    cfg_off = TransformerConfig(**TINY)
    cfg_on = TransformerConfig(**TINY, ln_matmul_fold=True)
    text, seg, img = _inputs(jax.random.PRNGKey(0), cfg_off)
    v_off = MakeAScene(cfg_off).init(jax.random.PRNGKey(1), text, seg, img)
    v_on = MakeAScene(cfg_on).init(jax.random.PRNGKey(1), text, seg, img)
    p_off = jax.tree_util.tree_structure(v_off)
    p_on = jax.tree_util.tree_structure(v_on)
    assert p_off == p_on
    shapes_off = jax.tree.map(lambda a: a.shape, v_off)
    shapes_on = jax.tree.map(lambda a: a.shape, v_on)
    assert shapes_off == shapes_on


def test_fold_gradient_parity():
    cfg_off = TransformerConfig(**TINY)
    cfg_on = TransformerConfig(**TINY, ln_matmul_fold=True)
    m_off, m_on = MakeAScene(cfg_off), MakeAScene(cfg_on)
    text, seg, img = _inputs(jax.random.PRNGKey(0), cfg_off)
    variables = m_off.init(jax.random.PRNGKey(1), text, seg, img)

    def loss(model):
        def f(params):
            logits = model.apply({"params": params}, text, seg, img)
            lse = jax.nn.logsumexp(logits, axis=-1)
            tgt = jnp.take_along_axis(logits, img[..., None],
                                      axis=-1)[..., 0]
            return jnp.mean(lse - tgt)
        return f

    g_off = jax.grad(loss(m_off))(variables["params"])
    g_on = jax.grad(loss(m_on))(variables["params"])
    flat_off, _ = jax.flatten_util.ravel_pytree(g_off)
    flat_on, _ = jax.flatten_util.ravel_pytree(g_on)
    np.testing.assert_allclose(np.asarray(flat_on), np.asarray(flat_off),
                               rtol=0, atol=2e-4 * float(
                                   jnp.abs(flat_off).max()))


def test_fold_with_prescale_and_sandwich():
    """cogview prescale + sandwich LNs interact with the folded path
    (prescale feeds the fold's stats; sandwiches stay unfolded)."""
    base = dict(TINY, cogview_layernorm_prescale=True,
                cogview_sandwich_layernorm=True)
    cfg_off = TransformerConfig(**base)
    cfg_on = TransformerConfig(**base, ln_matmul_fold=True)
    m_off, m_on = MakeAScene(cfg_off), MakeAScene(cfg_on)
    text, seg, img = _inputs(jax.random.PRNGKey(2), cfg_off)
    variables = m_off.init(jax.random.PRNGKey(3), text, seg, img)
    lo = np.asarray(m_off.apply(variables, text, seg, img), np.float32)
    lf = np.asarray(m_on.apply(variables, text, seg, img), np.float32)
    np.testing.assert_allclose(lf, lo, atol=2e-4 * np.abs(lo).max(), rtol=0)
