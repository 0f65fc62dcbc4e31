"""Flax -> PyTorch-reference checkpoint export (torch_export.py).

The return leg of the migration story: weights trained by this framework
hand back to the reference's torch modules (``/root/reference/models/
vqvae.py:8-39``, ``models/transformer.py:275-378``).  Proven two ways:
  * round-trip — ``convert_*_state(export_*_state(v))`` is bitwise,
  * strict torch load — the exported VQBASE state_dict loads into the
    faithful reference replica from ``test_torch_import`` with
    ``strict=True`` and reproduces latents + token indices.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mas_tpu.models.vqvae import VQModel  # noqa: E402
from mas_tpu.utils.config import (CodebookConfig, TransformerConfig,  # noqa: E402
                                  VQModelConfig)
from mas_tpu.utils.torch_export import (export_transformer_state,  # noqa: E402
                                        export_vqbase_state,
                                        save_torch_checkpoint)
from mas_tpu.utils.torch_import import (convert_transformer_state,  # noqa: E402
                                        convert_vqbase_state,
                                        load_torch_checkpoint)


def _tree_equal(a, b):
    assert (jax.tree_util.tree_structure(a)
            == jax.tree_util.tree_structure(b))
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.fixture(scope="module")
def vq_setup():
    cfg = VQModelConfig(
        in_channels=3, out_channels=3, resolution=32,
        channels=(32, 32, 64), num_res_blocks=1, attn_resolutions=(16,),
        z_channels=32, embed_dim=32,
        codebook=CodebookConfig(codebook_size=64, codebook_dim=32))
    jmodel = VQModel(cfg)
    variables = jmodel.init(jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)))
    # non-trivial BN running stats to prove the stats export too
    rng = np.random.default_rng(5)
    variables = jax.tree.map(lambda x: x, variables)  # unfreeze-safe copy
    stats = {"quant_bn": {
        "mean": jnp.asarray(rng.normal(0, 0.1, (32,)).astype(np.float32)),
        "var": jnp.asarray(rng.uniform(0.5, 1.5, (32,)).astype(np.float32))}}
    variables = {"params": variables["params"], "batch_stats": stats}
    return cfg, jmodel, variables


def test_vqbase_export_import_roundtrip(vq_setup):
    cfg, _, variables = vq_setup
    back = convert_vqbase_state(export_vqbase_state(variables, cfg), cfg)
    _tree_equal(variables["params"], back["params"])
    _tree_equal(variables["batch_stats"], back["batch_stats"])


def test_vqbase_export_strict_torch_load_and_parity(vq_setup):
    """Exported state_dict strict-loads into the reference replica and the
    torch model reproduces the flax model's latents and token indices."""
    import test_torch_import as tim

    cfg, jmodel, variables = vq_setup
    state = export_vqbase_state(variables, cfg)
    tmodel = tim.TVQBase(cfg).eval()
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in state.items()},
        strict=True)
    assert not missing and not unexpected

    x = np.random.default_rng(11).random((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        tz = tmodel.quant_conv(tmodel.encoder(tx))
        tz_np = tz.permute(0, 2, 3, 1).numpy()
        emb = tmodel.quantize.embedding.weight
        flat = tz.permute(0, 2, 3, 1).reshape(-1, emb.shape[1])
        d = (flat.pow(2).sum(1, keepdim=True)
             + emb.pow(2).sum(1) - 2 * flat @ emb.t())
        t_idx = d.argmin(1).numpy()

    jz = jmodel.apply(variables, jnp.asarray(x),
                      method=VQModel.encode_latent)
    np.testing.assert_allclose(np.asarray(jz), tz_np, atol=2e-4, rtol=1e-3)
    _, j_idx = jmodel.apply(variables, jnp.asarray(x), method=VQModel.encode)
    np.testing.assert_array_equal(np.asarray(j_idx).reshape(-1), t_idx)


def test_vqbase_export_pt_file_roundtrip(vq_setup, tmp_path):
    cfg, _, variables = vq_setup
    path = str(tmp_path / "exported.pt")
    save_torch_checkpoint(path, export_vqbase_state(variables, cfg))
    back = convert_vqbase_state(load_torch_checkpoint(path), cfg)
    _tree_equal(variables["params"], back["params"])
    _tree_equal(variables["batch_stats"], back["batch_stats"])


def _tiny_tf_cfg(**overrides):
    return TransformerConfig(
        num_layers=2, hidden_dim=64, num_attn_heads=4,
        image_vocab_size=32, seg_vocab_size=16, text_vocab_size=64,
        image_tokens_per_dim=2, seg_tokens_per_dim=2, text_length=4,
        **overrides)


@pytest.mark.parametrize("flags", [{}, {"cogview_sandwich_layernorm": False}])
def test_transformer_export_import_roundtrip(flags):
    from mas_tpu.models.transformer import MakeAScene

    cfg = _tiny_tf_cfg(**flags)
    model = MakeAScene(cfg)
    tok = jnp.zeros((1, 4), jnp.int32)
    variables = model.init(jax.random.PRNGKey(1), tok, tok, tok)
    state = export_transformer_state(variables, cfg)
    # reference naming surface (transformer.py:296-318)
    assert "transformer.layers.0.attn.qkv.weight" in state
    assert "to_logits.1.weight" in state
    assert state["transformer.layers.0.attn.qkv.weight"].shape == (192, 64)
    back = convert_transformer_state(state, cfg)
    _tree_equal(variables["params"], back["params"])
    # the round-tripped tree runs
    out = model.apply(back, tok, tok, tok)
    assert out.shape == (1, 4, 32)


def test_transformer_export_rejects_gqa():
    cfg = _tiny_tf_cfg(num_kv_heads=2)
    with pytest.raises(ValueError, match="GQA"):
        export_transformer_state({"params": {}}, cfg)


def test_transformer_export_rejects_stacked_tree():
    from mas_tpu.models.transformer import MakeAScene, stack_layer_params

    cfg = _tiny_tf_cfg()
    model = MakeAScene(cfg)
    tok = jnp.zeros((1, 4), jnp.int32)
    variables = model.init(jax.random.PRNGKey(1), tok, tok, tok)
    stacked = stack_layer_params(dict(variables["params"]), cfg.num_layers)
    with pytest.raises(ValueError, match="unstack_layer_params"):
        export_transformer_state({"params": stacked}, cfg)
