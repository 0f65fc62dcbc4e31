"""cfg.scan_layers: stacked-layer lax.scan sweep for the training path.

The scanned stack must be a pure re-expression of the unrolled layer
loop: identical logits and gradients given converted params, lossless
param-tree round-trip, composing with remat and the fold/sandwich
variants.  Serving stays unrolled by design (the per-layer cache
aliasing is load-bearing — BASELINE round 3), so prefill under
scan_layers must fail loudly, not subtly.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mas_tpu.models.transformer import (MakeAScene, stack_layer_params,
                                        unstack_layer_params)
from mas_tpu.utils.config import TransformerConfig

TINY = TransformerConfig(
    num_layers=3, hidden_dim=64, num_attn_heads=8,
    image_vocab_size=128, seg_vocab_size=128, text_vocab_size=128 + 16,
    image_tokens_per_dim=4, seg_tokens_per_dim=2, text_length=16)


def make_inputs(key, cfg=TINY, batch=2):
    k1, k2, k3 = jax.random.split(key, 3)
    text = jax.random.randint(k1, (batch, cfg.text_length), 0,
                              cfg.text_vocab_size - cfg.text_length)
    seg = jax.random.randint(k2, (batch, cfg.seg_length), 0,
                             cfg.seg_vocab_size)
    img = jax.random.randint(k3, (batch, cfg.image_length), 0,
                             cfg.image_vocab_size)
    return text, seg, img


def _init_pair(cfg, key=1):
    """(unrolled variables, scan model, stacked variables) with the SAME
    weights: init unrolled, convert."""
    model = MakeAScene(cfg)
    scan_cfg = dataclasses.replace(cfg, scan_layers=True)
    scan_model = MakeAScene(scan_cfg)
    text, seg, img = make_inputs(jax.random.PRNGKey(0), cfg)
    variables = model.init(jax.random.PRNGKey(key), text, seg, img)
    stacked = {"params": stack_layer_params(variables["params"],
                                            cfg.num_layers)}
    return model, variables, scan_model, stacked, (text, seg, img)


def test_param_tree_shapes():
    _, variables, scan_model, stacked, (text, seg, img) = _init_pair(TINY)
    p = stacked["params"]
    assert "layer_0" not in p and "layers" in p
    ker = p["layers"]["layer"]["attn"]["qkv"]["kernel"]
    assert ker.shape[0] == TINY.num_layers
    # a fresh scan-side init produces the same tree (shape-wise)
    fresh = scan_model.init(jax.random.PRNGKey(2), text, seg, img)
    assert (jax.tree_util.tree_structure(fresh["params"])
            == jax.tree_util.tree_structure(p))
    assert all(
        a.shape == b.shape for a, b in zip(
            jax.tree_util.tree_leaves(fresh["params"]),
            jax.tree_util.tree_leaves(p)))


def test_roundtrip_lossless():
    _, variables, _, stacked, _ = _init_pair(TINY)
    back = unstack_layer_params(stacked["params"], TINY.num_layers)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.array(a),
                                                   np.array(b)),
        variables["params"], back)


@pytest.mark.parametrize("variant", ["plain", "sandwich_fold", "gqa"])
def test_forward_parity(variant):
    cfg = TINY
    if variant == "sandwich_fold":
        cfg = dataclasses.replace(
            TINY, cogview_sandwich_layernorm=True,
            cogview_layernorm_prescale=True, ln_matmul_fold=True)
    elif variant == "gqa":
        cfg = dataclasses.replace(TINY, num_kv_heads=2)
    model, variables, scan_model, stacked, (text, seg, img) = \
        _init_pair(cfg)
    ref = model.apply(variables, text, seg, img)
    out = scan_model.apply(stacked, text, seg, img)
    # same per-layer math in the same order -> tight tolerance (fp32 CPU;
    # scan vs unrolled may still fuse reductions differently)
    np.testing.assert_allclose(np.array(ref), np.array(out),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("remat_policy", ["nothing", "dots", "mlp"])
def test_grad_parity_with_remat(remat_policy):
    cfg = dataclasses.replace(TINY, remat=True, remat_policy=remat_policy)
    model, variables, scan_model, stacked, (text, seg, img) = \
        _init_pair(cfg)

    def loss(params, m):
        logits = m.apply({"params": params}, text, seg, img)
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    ref_l, ref_g = jax.value_and_grad(loss)(variables["params"], model)
    out_l, out_g = jax.value_and_grad(loss)(stacked["params"], scan_model)
    np.testing.assert_allclose(float(ref_l), float(out_l), rtol=1e-6)
    ref_g = stack_layer_params(ref_g, cfg.num_layers)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.array(a), np.array(b), atol=1e-5, rtol=1e-4),
        ref_g, out_g)


def test_prefill_raises():
    cfg = dataclasses.replace(TINY, scan_layers=True)
    model = MakeAScene(cfg)
    text, seg, img = make_inputs(jax.random.PRNGKey(0))
    variables = model.init(jax.random.PRNGKey(1), text, seg, img)
    with pytest.raises(ValueError, match="unrolled"):
        model.apply(variables, text, seg, method=MakeAScene.prefill)


def test_jit_under_scan():
    cfg = dataclasses.replace(TINY, scan_layers=True)
    model = MakeAScene(cfg)
    text, seg, img = make_inputs(jax.random.PRNGKey(0))
    variables = model.init(jax.random.PRNGKey(1), text, seg, img)
    out = jax.jit(lambda v: model.apply(v, text, seg, img))(variables)
    assert out.shape == (2, cfg.image_length, cfg.image_vocab_size)
    assert np.isfinite(np.array(out)).all()


def test_scan_under_tensor_parallel():
    """Stacked [L, ...] params shift the Megatron specs right by one
    (stack axis unsharded — the scan sweeps it); TP x DP forward must
    match the unsharded run."""
    from jax.sharding import PartitionSpec as P

    from mas_tpu.parallel.mesh import MeshConfig, make_mesh
    from mas_tpu.parallel.sharding import transformer_param_shardings

    model, variables, scan_model, stacked, (text, seg, img) = \
        _init_pair(TINY)
    ref = np.asarray(model.apply(variables, text, seg, img))

    mesh = make_mesh(MeshConfig(data=4, model=2))
    specs = transformer_param_shardings(mesh, stacked["params"])
    qkv = specs["layers"]["layer"]["attn"]["qkv"]["kernel"].spec
    assert qkv == P(None, None, "model")
    out_proj = specs["layers"]["layer"]["attn"]["out_proj"]["kernel"].spec
    assert out_proj == P(None, "model", None)
    params = jax.tree.map(
        lambda x, s: jax.device_put(x, s), stacked["params"], specs)
    # batch stays replicated (2 doesn't tile the 4-way data axis); the DP
    # input path is covered by test_parallel.py on the unrolled model
    out = jax.jit(
        lambda p, t, s, i: scan_model.apply({"params": p}, t, s, i))(
        params, text, seg, img)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)
