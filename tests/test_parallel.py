import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mas_tpu.parallel.mesh import make_mesh, batch_sharding, shard_batch
from mas_tpu.utils.config import MeshConfig


def test_graft_entry_dryrun_8dev():
    import __graft_entry__ as g
    g.dryrun_multichip(8)   # asserts internally


def test_graft_entry_forward_shape():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.eval_shape(jax.jit(fn), *args)
    assert out.shape == (2, 256, 8192)


def test_seg_train_step_sharded():
    """VQ-SEG train step with the batch sharded over 8 devices: the global
    jnp.mean in BatchNorm/loss spans replicas (DDP equivalence)."""
    from mas_tpu.models import VQModel
    from mas_tpu.train import create_vq_train_state
    from mas_tpu.train.state import make_adam
    from mas_tpu.train.steps import make_seg_train_step
    from mas_tpu.utils.config import (CodebookConfig, OptimizerConfig,
                                      VQModelConfig)

    cfg = VQModelConfig(
        in_channels=8, out_channels=8, channels=(32, 32, 64),
        num_res_blocks=1, attn_resolutions=(8,), resolution=32,
        z_channels=32, embed_dim=32,
        codebook=CodebookConfig(codebook_size=32, codebook_dim=32,
                                init_steps=2, reservoir_size=128,
                                kmeans_iters=2))
    model = VQModel(cfg)
    tx = make_adam(OptimizerConfig(lr=1e-3))
    state = create_vq_train_state(model, cfg, tx, jax.random.PRNGKey(0))
    step = make_seg_train_step(model, tx,
                               loss_cfg=__import__(
                                   "mas_tpu.utils.config",
                                   fromlist=["SegLossConfig"]
                               ).SegLossConfig(image_channels=8,
                                               face_channel_start=4,
                                               face_channel_end=6))
    mesh = make_mesh(MeshConfig(data=8, model=1))
    seg = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(1), (8, 32, 32), 0, 8), 8)
    seg = jax.device_put(seg, batch_sharding(mesh))
    state, metrics = step(state, seg, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    # second step with different shard content still fine
    state, metrics = step(state, seg, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))


def test_gqa_forward_under_tensor_parallel():
    """GQA's qkv kernel has a non-3*hidden output dim (hidden + 2*kv_dim);
    the Megatron column-parallel sharding must still tile it and produce
    the same logits as the unsharded run."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mas_tpu.models.transformer import MakeAScene
    from mas_tpu.parallel.sharding import transformer_param_shardings
    from mas_tpu.utils.config import TransformerConfig

    cfg = TransformerConfig(
        num_layers=2, hidden_dim=64, num_attn_heads=8, num_kv_heads=2,
        image_vocab_size=64, seg_vocab_size=32, text_vocab_size=32 + 8,
        image_tokens_per_dim=4, seg_tokens_per_dim=2, text_length=8)
    model = MakeAScene(cfg)
    rng = jax.random.PRNGKey(0)
    text = jax.random.randint(rng, (4, 8), 0, 24)
    seg = jax.random.randint(rng, (4, 4), 0, 32)
    img = jax.random.randint(rng, (4, 16), 0, 64)
    variables = model.init(jax.random.PRNGKey(1), text, seg, img)
    ref = np.asarray(model.apply(variables, text, seg, img))

    mesh = make_mesh(MeshConfig(data=4, model=2))
    # qkv output dim = 64 + 2*2*8 = 96, divisible by the 2-way model axis
    specs = transformer_param_shardings(mesh, variables["params"])
    params = jax.tree.map(
        lambda x, s: jax.device_put(x, s), variables["params"], specs)
    data_sh = NamedSharding(mesh, P("data"))
    out = jax.jit(lambda p, t, s, i: model.apply({"params": p}, t, s, i))(
        params, jax.device_put(text, data_sh),
        jax.device_put(seg, data_sh), jax.device_put(img, data_sh))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_distributed_bootstrap_single_process():
    from mas_tpu.parallel.distributed import initialize, is_primary

    info = initialize()
    assert info["process_count"] == 1
    assert info["global_devices"] == 8     # fake CPU mesh from conftest
    assert is_primary()
