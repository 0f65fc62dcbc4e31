"""Checkpoint/resume: orbax roundtrip carries params, optimizer state, step
and the codebook phase counter/reservoir (SURVEY §5 checkpoint semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from mas_tpu.models.vqvae import VQModel
from mas_tpu.train.state import create_vq_train_state, make_adam
from mas_tpu.train.steps import make_seg_train_step
from mas_tpu.utils.checkpoint import (latest_step, restore_checkpoint,
                                      save_checkpoint)
from mas_tpu.utils.config import (CodebookConfig, OptimizerConfig,
                                  VQModelConfig)


def _tiny():
    cfg = VQModelConfig(
        in_channels=8, out_channels=8, resolution=16,
        channels=(32, 32), num_res_blocks=1, attn_resolutions=(),
        z_channels=32, embed_dim=32,
        codebook=CodebookConfig(codebook_size=16, codebook_dim=32,
                                init_steps=1, reservoir_size=32,
                                samples_per_image=2))
    model = VQModel(cfg)
    tx = make_adam(OptimizerConfig(lr=1e-3))
    state = create_vq_train_state(model, cfg, tx, jax.random.PRNGKey(0))
    return cfg, model, tx, state


def test_checkpoint_roundtrip(tmp_path):
    cfg, model, tx, state = _tiny()
    from mas_tpu.utils.config import SegLossConfig
    step = make_seg_train_step(
        model, tx, SegLossConfig(image_channels=8, face_channel_start=2,
                                 face_channel_end=4), vq_impl="jnp")
    seg = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(1), (2, 16, 16), 0, 8), 8)
    for i in range(3):
        state, _ = step(state, seg, jax.random.PRNGKey(i))

    path = save_checkpoint(str(tmp_path), state, int(state.step))
    assert latest_step(str(tmp_path)) == 3

    fresh = create_vq_train_state(model, cfg, tx, jax.random.PRNGKey(9))
    restored = restore_checkpoint(str(tmp_path), fresh)

    assert int(restored.step) == 3
    # codebook phase machine state survives (the reference restores
    # quantize.q_counter on resume, train.py:76)
    assert int(restored.vq_state.counter) == int(state.vq_state.counter)
    assert int(restored.vq_state.filled) == int(state.vq_state.filled)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # training continues identically from the restored state
    s1, m1 = step(state, seg, jax.random.PRNGKey(42))
    s2, m2 = step(restored, seg, jax.random.PRNGKey(42))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)


def test_logger_and_visualizer(tmp_path):
    from mas_tpu.utils.logging import Logger, Visualizer, make_grid

    log = Logger(str(tmp_path / "logs"), image_period=1)
    img = np.random.default_rng(0).random((2, 16, 16, 3)).astype(np.float32)
    log.log(step=1, img=img, img_rec=img, loss=jnp.asarray(0.5),
            q_loss=np.float32(0.1))
    log.close()

    # non-zero rank is a no-op
    log1 = Logger(str(tmp_path / "logs1"), process_index=1)
    log1.log(step=1, loss=np.float32(1.0))

    grid = make_grid(img, nrow=2)
    assert grid.ndim == 3 and grid.shape[-1] == 3

    viz = Visualizer(str(tmp_path / "results"))
    seg = np.random.default_rng(1).random((1, 16, 16, 159)).astype(np.float32)
    colored = viz.colorize(seg)
    assert set(colored) == {"panoptic", "human", "face", "edge"}
    assert colored["panoptic"].shape == (1, 16, 16, 3)
    logits = np.random.default_rng(2).standard_normal(
        (1, 16, 16, 159)).astype(np.float32)
    path = viz(5, image=np.zeros((1, 16, 16, 3), np.float32), seg=seg,
               seg_rec=logits)
    import os
    assert os.path.exists(path)


def test_eval_only_resume_skips_batch_pull(tmp_path):
    """A resumed state at step >= total_steps returns WITHOUT pulling a
    batch: eval-only recovery of a lost eval must not re-tokenize the
    train pool (round-5 ar512 recovery path)."""
    from mas_tpu.parallel.mesh import make_mesh
    from mas_tpu.train.loop import _loop
    from mas_tpu.utils.config import TrainConfig
    from mas_tpu.utils.logging import Logger

    class Done:
        step = jnp.asarray(5, jnp.int32)

    def poisoned():
        raise AssertionError("batch generator pulled on eval-only resume")
        yield  # pragma: no cover

    cfg = TrainConfig(mode="train_transformer", total_steps=5,
                      checkpoint_dir=str(tmp_path))
    state = _loop(cfg, Done(), step_fn=None, batches=poisoned(),
                  mesh=make_mesh(cfg.mesh), logger=Logger(process_index=1),
                  to_step_args=lambda b: b)
    assert int(state.step) == 5
