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


def test_img_gan_step_sharded_matches_unsharded():
    """VQ-IMG dual-optimizer GAN step under an 8-device data mesh — the
    reference's only production setup (8-GPU DDP + SyncBatchNorm,
    ``/root/reference/train.py:60-134``).  Exercises under sharding: the
    SyncBatchNorm batch stats (global jnp.mean spans replicas), the
    adaptive d_weight double-grad, the discriminator hinge update, and the
    codebook reservoir write-back — and checks DDP equivalence: the
    sharded step must reproduce the unsharded global-batch step."""
    from mas_tpu.losses.discriminator import PatchDiscriminator
    from mas_tpu.losses.lpips import LPIPS
    from mas_tpu.models.vqvae import VQModel
    from mas_tpu.train.state import create_vq_train_state, make_adam
    from mas_tpu.train.steps import make_img_train_step
    from mas_tpu.utils.config import (CodebookConfig, OptimizerConfig,
                                      VQGANLossConfig, VQModelConfig)

    cfg = VQModelConfig(
        in_channels=3, out_channels=3, resolution=32,
        channels=(32, 32, 64), attn_resolutions=(8,),
        z_channels=32, embed_dim=32,
        codebook=CodebookConfig(codebook_size=16, codebook_dim=32,
                                init_steps=2, reservoir_size=64,
                                samples_per_image=4))
    model = VQModel(cfg)
    disc = PatchDiscriminator(n_layers=2)
    lpips = LPIPS()
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(jax.random.PRNGKey(7), (8, 32, 32, 3))
    lpips_vars = lpips.init(jax.random.PRNGKey(1), x[:1], x[:1])
    frozen = {"lpips": lpips_vars}
    batch = dict(
        image=x,
        bbox_obj=jnp.tile(jnp.array([[[4, 4, 20, 20]]], jnp.float32),
                          (8, 1, 1)),
        bbox_face=jnp.zeros((8, 1, 4), jnp.float32))
    # disc_start=1: step 0 runs pre-GAN, step 1 exercises the adaptive
    # d_weight double-grad + hinge update under sharding
    loss_cfg = VQGANLossConfig(disc_start=1, face_loss=False)

    def run(shard: bool):
        tx, disc_tx = make_adam(OptimizerConfig(lr=1e-3)), make_adam(
            OptimizerConfig(lr=1e-3))
        state = create_vq_train_state(model, cfg, tx, jax.random.PRNGKey(0),
                                      disc_model=disc, disc_tx=disc_tx)
        step = make_img_train_step(model, disc, tx, disc_tx, loss_cfg,
                                   lpips, face_model=None, vq_impl="jnp")
        b = batch
        if shard:
            mesh = make_mesh(MeshConfig(data=8, model=1))
            b = shard_batch(mesh, batch)
        losses = []
        for i in range(2):
            state, metrics = step(state, b, frozen, jax.random.PRNGKey(3))
            losses.append((float(metrics["loss"]),
                           float(metrics["d_loss"]),
                           float(metrics["d_weight"])))
        return losses, state

    ref_losses, ref_state = run(shard=False)
    sh_losses, sh_state = run(shard=True)
    # step 0 is the strict DDP-equivalence claim: identical state, same
    # global batch, sharded vs not — only all-reduce ordering differs.
    np.testing.assert_allclose(sh_losses[0], ref_losses[0], rtol=1e-4)
    # step 1 runs from slightly-diverged params: Adam amplifies the
    # reduction-order float noise, and d_weight (a ratio of grad norms of
    # a near-untrained net) is chaotic in it — loose bound only.
    np.testing.assert_allclose(sh_losses[1], ref_losses[1], rtol=5e-2)
    np.testing.assert_allclose(
        np.asarray(sh_state.params["decoder"]["conv_out"]["kernel"]),
        np.asarray(ref_state.params["decoder"]["conv_out"]["kernel"]),
        atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(sh_state.batch_stats)[0]),
        np.asarray(jax.tree.leaves(ref_state.batch_stats)[0]),
        atol=2e-3)


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
