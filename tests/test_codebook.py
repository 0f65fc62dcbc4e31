import jax
import jax.numpy as jnp
import numpy as np

from mas_tpu.models.codebook import (CodebookState, codebook_init_embedding,
                                     codebook_init_state, quantize_train)
from mas_tpu.utils.config import CodebookConfig


CFG = CodebookConfig(codebook_size=16, codebook_dim=8, init_steps=4,
                     reservoir_size=64, samples_per_image=5, kmeans_iters=3)
# phases: collect > 4, passthrough until 12, kmeans every 2 in [12, 120)


def run_step(state, emb, z, key, cfg=CFG):
    return quantize_train(z, emb, state, cfg, key, impl="jnp")


def test_passthrough_before_q_init():
    state = codebook_init_state(CFG)
    emb = codebook_init_embedding(jax.random.PRNGKey(0), CFG)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 8))
    z_q, q_loss, idx, state, _, trig = run_step(state, emb, z,
                                                jax.random.PRNGKey(2))
    assert int(state.counter) == 1
    np.testing.assert_array_equal(np.array(z_q), np.array(z))  # passthrough
    assert float(q_loss) == 0.0
    assert not bool(trig)


def test_reservoir_collects_after_start():
    state = codebook_init_state(CFG)
    emb = codebook_init_embedding(jax.random.PRNGKey(0), CFG)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 8))
    for i in range(6):
        _, _, _, state, _, _ = run_step(state, emb, z, jax.random.PRNGKey(i))
    # counters 5 and 6 exceeded q_start_collect=4 => 2 collections x 10 rows
    assert int(state.filled) == 20
    assert np.any(np.array(state.reservoir[:20]) != 0)


def test_quantize_after_q_init():
    state = CodebookState(counter=jnp.asarray(20, jnp.int32),
                          reservoir=jnp.zeros((64, 8)),
                          filled=jnp.asarray(0, jnp.int32))
    emb = codebook_init_embedding(jax.random.PRNGKey(0), CFG)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 8))
    z_q, q_loss, idx, state, _, trig = run_step(state, emb, z,
                                                jax.random.PRNGKey(2))
    # counter 21, odd tick => no kmeans ((21-12) % 2 == 1)
    assert not bool(trig)
    assert float(q_loss) > 0.0
    # straight-through: z_q value equals codebook entry
    flat_q = np.array(z_q).reshape(-1, 8)
    flat_i = np.array(idx).reshape(-1)
    np.testing.assert_allclose(flat_q, np.array(emb)[flat_i], atol=1e-5)


def test_kmeans_trigger_overwrites_embedding():
    reservoir = jax.random.normal(jax.random.PRNGKey(5), (64, 8)) * 10
    state = CodebookState(counter=jnp.asarray(11, jnp.int32),
                          reservoir=reservoir,
                          filled=jnp.asarray(64, jnp.int32))
    emb = codebook_init_embedding(jax.random.PRNGKey(0), CFG)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 8))
    z_q, q_loss, idx, state, emb_wb, trig = run_step(state, emb, z,
                                                     jax.random.PRNGKey(2))
    # counter 12 == q_init => kmeans tick
    assert bool(trig)
    # write-back embedding must differ from the original (kmeans centroids)
    assert np.max(np.abs(np.array(emb_wb) - np.array(emb))) > 0.1


def test_gradients_flow():
    """encoder (z) gets straight-through + commitment grads; embedding gets
    codebook-loss grads."""
    state = CodebookState(counter=jnp.asarray(20, jnp.int32),
                          reservoir=jnp.zeros((64, 8)),
                          filled=jnp.asarray(0, jnp.int32))
    emb = codebook_init_embedding(jax.random.PRNGKey(0), CFG)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2, 8))

    def loss(z_, emb_):
        z_q, q_loss, *_ = quantize_train(z_, emb_, state, CFG,
                                         jax.random.PRNGKey(2), impl="jnp")
        return jnp.sum(z_q ** 2) + q_loss

    gz, gemb = jax.grad(loss, argnums=(0, 1))(z, emb)
    assert np.any(np.array(gz) != 0)
    assert np.any(np.array(gemb) != 0)


def test_counter_checkpoint_semantics():
    """resume restores the phase counter (reference train.py:76)."""
    state = codebook_init_state(CFG)
    restored = state.replace(counter=jnp.asarray(100, jnp.int32))
    assert int(restored.counter) == 100
