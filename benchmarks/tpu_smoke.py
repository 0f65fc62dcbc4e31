"""TPU smoke: drive the library end-to-end on the real chip (~2 min).

The pytest suite forces CPU, so TPU-only failure modes (Mosaic lowering,
pallas autodiff, bf16-pass matmul precision) only surface here.  Runs a
tiny VQ-SEG train loop to convergence-direction, a token round-trip, and a
KV-cache CFG sampling call.  `make verify-tpu` wraps this from a scratch
cwd so it exercises the package boundary.
"""

import sys

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mas_tpu.models import VQModel
from mas_tpu.models.sampler import sample_tokens
from mas_tpu.models.transformer import MakeAScene
from mas_tpu.train import create_vq_train_state
from mas_tpu.train.state import make_adam
from mas_tpu.train.steps import make_seg_train_step
from mas_tpu.utils.config import (CodebookConfig, OptimizerConfig,
                                  TransformerConfig, VQModelConfig)


def main():
    print("backend:", jax.default_backend(), jax.devices())

    cfg = VQModelConfig(
        in_channels=159, out_channels=159, channels=(32, 32, 64),
        num_res_blocks=1, attn_resolutions=(16,), resolution=64,
        z_channels=32, embed_dim=32,
        codebook=CodebookConfig(codebook_size=64, codebook_dim=32,
                                init_steps=3, reservoir_size=512,
                                kmeans_iters=3))
    model = VQModel(cfg)
    tx = make_adam(OptimizerConfig(lr=1e-3))
    state = create_vq_train_state(model, cfg, tx, jax.random.PRNGKey(0))
    step = make_seg_train_step(model, tx)
    rng = jax.random.PRNGKey(42)
    seg = jax.nn.one_hot(jax.random.randint(rng, (4, 64, 64), 0, 159), 159)
    losses = []
    for _ in range(40):
        rng, k = jax.random.split(rng)
        state, m = step(state, seg, k)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    print(f"seg train: {losses[0]:.4f} -> {losses[-1]:.4f}")

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    toks = model.apply(variables, seg, method=VQModel.encode_tokens)
    rec = model.apply(variables, toks, method=VQModel.decode_code)
    assert rec.shape == seg.shape and toks.dtype == jnp.int32
    print("token round-trip:", toks.shape, "->", rec.shape)

    tcfg = TransformerConfig(
        num_layers=2, hidden_dim=128, num_attn_heads=8,
        image_vocab_size=128, seg_vocab_size=64, text_vocab_size=64 + 16,
        image_tokens_per_dim=4, seg_tokens_per_dim=2, text_length=16,
        compute_dtype="bfloat16", kv_cache_dtype="int8")
    tmodel = MakeAScene(tcfg)
    text = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 32)
    seg_t = jax.random.randint(jax.random.PRNGKey(2), (2, 4), 0, 64)
    img_t = jax.random.randint(jax.random.PRNGKey(3), (2, 16), 0, 128)
    tvars = tmodel.init(jax.random.PRNGKey(4), text, seg_t, img_t)
    out = sample_tokens(tmodel, tvars, text, seg_t, jax.random.PRNGKey(5),
                        guidance_scale=2.0, top_k=8)
    out = jax.device_get(out)
    assert out.shape == (2, 16) and (0 <= out).all() and (out < 128).all()
    print("CFG int8-cache sampling:", out.shape, "OK")
    print("tpu smoke: ALL OK")


if __name__ == "__main__":
    main()
