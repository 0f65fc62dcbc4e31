"""PyTorch-reference checkpoint import: numerical parity.

Builds a faithful in-test replica of the reference ``VQBASE`` (flat
``nn.Sequential`` encoder/decoder, ``/root/reference/models/modules.py:
199-240,337-369``, ``models/vqvae.py:8-39``), random-inits it, converts its
state_dict with ``convert_vqbase_state``, and checks that the flax model
reproduces latents, token indices (bitwise) and reconstructions (fp32
tolerance) — BASELINE.md's "token indices vs reference checkpoints" target.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mas_tpu.models.vqvae import VQModel  # noqa: E402
from mas_tpu.utils.config import CodebookConfig, VQModelConfig  # noqa: E402
from mas_tpu.utils.torch_import import (convert_transformer_state,  # noqa: E402
                                        convert_vqbase_state)


def _swish(x):
    return x * torch.sigmoid(x)


class Swish(nn.Module):
    def forward(self, x):
        return _swish(x)


def Normalize(c):
    return nn.GroupNorm(32, c, eps=1e-6, affine=True)


class TResnetBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.in_channels, self.out_channels = cin, cout
        self.norm1 = Normalize(cin)
        self.conv1 = nn.Conv2d(cin, cout, 3, 1, 1)
        self.norm2 = Normalize(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1)
        if cin != cout:
            self.nin_shortcut = nn.Conv2d(cin, cout, 1, 1, 0)

    def forward(self, x):
        h = self.conv1(_swish(self.norm1(x)))
        h = self.conv2(_swish(self.norm2(h)))
        if self.in_channels != self.out_channels:
            x = self.nin_shortcut(x)
        return x + h


class TAttnBlock(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = Normalize(c)
        self.q = nn.Conv2d(c, c, 1)
        self.k = nn.Conv2d(c, c, 1)
        self.v = nn.Conv2d(c, c, 1)
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x):
        h_ = self.norm(x)
        q, k, v = self.q(h_), self.k(h_), self.v(h_)
        b, c, h, w = q.shape
        q = q.reshape(b, c, h * w).permute(0, 2, 1)
        k = k.reshape(b, c, h * w)
        w_ = torch.bmm(q, k) * (int(c) ** -0.5)
        w_ = F.softmax(w_, dim=2)
        v = v.reshape(b, c, h * w)
        h_ = torch.bmm(v, w_.permute(0, 2, 1)).reshape(b, c, h, w)
        return x + self.proj_out(h_)


class TDownsample(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, 2, 0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class TUpsample(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, 1, 1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


def t_encoder(cfg):
    chans = cfg.channels
    layers = [nn.Conv2d(cfg.in_channels, chans[0], 3, 1, 1)]
    res = cfg.resolution
    cin = chans[0]
    for i in range(len(chans) - 1):
        cout = chans[i + 1]
        for _ in range(cfg.num_res_blocks):
            layers.append(TResnetBlock(cin, cout))
            cin = cout
            if res in cfg.attn_resolutions:
                layers.append(TAttnBlock(cin))
        if i < len(chans) - 2:
            layers.append(TDownsample(cin))
            res //= 2
    layers += [TResnetBlock(cin, cin), TAttnBlock(cin),
               TResnetBlock(cin, cin), Normalize(cin), Swish(),
               nn.Conv2d(cin, cfg.z_channels, 3, 1, 1)]
    return nn.Sequential(*layers)


def t_decoder(cfg):
    ch_mult = cfg.channels[1:]
    n = len(ch_mult)
    block_in = ch_mult[-1]
    res = cfg.resolution // 2 ** (n - 1)
    layers = [nn.Conv2d(cfg.z_channels, block_in, 3, 1, 1),
              TResnetBlock(block_in, block_in), TAttnBlock(block_in),
              TResnetBlock(block_in, block_in)]
    for i in reversed(range(n)):
        block_out = ch_mult[i]
        for _ in range(cfg.num_res_blocks + 1):
            layers.append(TResnetBlock(block_in, block_out))
            block_in = block_out
            if res in cfg.attn_resolutions:
                layers.append(TAttnBlock(block_in))
        if i > 0:
            layers.append(TUpsample(block_in))
        res *= 2
    layers += [Normalize(block_in), Swish(),
               nn.Conv2d(block_in, cfg.out_channels, 3, 1, 1)]
    return nn.Sequential(*layers)


class _Wrap(nn.Module):
    """Reference Encoder/Decoder hold their Sequential as ``.model``."""

    def __init__(self, seq):
        super().__init__()
        self.model = seq

    def forward(self, x):
        return self.model(x)


class TVQBase(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.encoder = _Wrap(t_encoder(cfg))
        self.decoder = _Wrap(t_decoder(cfg))
        # BatchNorm2d state-dict layout == SyncBatchNorm (vqvae.py:14-17)
        self.quant_conv = nn.Sequential(
            nn.Conv2d(cfg.z_channels, cfg.embed_dim, 1),
            nn.BatchNorm2d(cfg.embed_dim))
        self.post_quant_conv = nn.Conv2d(cfg.embed_dim, cfg.z_channels, 1)
        self.quantize = nn.Module()
        self.quantize.embedding = nn.Embedding(
            cfg.codebook.codebook_size, cfg.codebook.codebook_dim)


@pytest.fixture(scope="module")
def models():
    cfg = VQModelConfig(
        in_channels=3, out_channels=3, resolution=32,
        channels=(32, 32, 64), num_res_blocks=1, attn_resolutions=(16,),
        z_channels=32, embed_dim=32,
        codebook=CodebookConfig(codebook_size=64, codebook_dim=32))
    torch.manual_seed(0)
    tmodel = TVQBase(cfg).eval()
    # non-trivial BN running stats to prove they convert
    with torch.no_grad():
        tmodel.quant_conv[1].running_mean.normal_(0, 0.1)
        tmodel.quant_conv[1].running_var.uniform_(0.5, 1.5)
    variables = convert_vqbase_state(tmodel.state_dict(), cfg)
    jmodel = VQModel(cfg)
    return cfg, tmodel, jmodel, variables


def test_converted_tree_matches_init(models):
    cfg, _, jmodel, variables = models
    ref = jmodel.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 32, 32, 3)))
    assert (jax.tree_util.tree_structure(ref["params"])
            == jax.tree_util.tree_structure(variables["params"]))
    for a, b in zip(jax.tree_util.tree_leaves(ref["params"]),
                    jax.tree_util.tree_leaves(variables["params"])):
        assert a.shape == b.shape


def test_latent_and_token_parity(models):
    cfg, tmodel, jmodel, variables = models
    x = np.random.default_rng(0).random((2, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        tz = tmodel.quant_conv(tmodel.encoder(tx))        # [B, D, h, w]
        tz_np = tz.permute(0, 2, 3, 1).numpy()
        emb = tmodel.quantize.embedding.weight            # [K, D]
        flat = tz.permute(0, 2, 3, 1).reshape(-1, emb.shape[1])
        d = (flat.pow(2).sum(1, keepdim=True)
             + emb.pow(2).sum(1) - 2 * flat @ emb.t())
        t_idx = d.argmin(1).numpy()
        tq = emb[d.argmin(1)].reshape(tz.shape[0], tz.shape[2],
                                      tz.shape[3], -1)
        trec = tmodel.decoder(
            tmodel.post_quant_conv(tq.permute(0, 3, 1, 2)))
        trec_np = trec.permute(0, 2, 3, 1).numpy()

    jz = jmodel.apply({"params": variables["params"],
                       "batch_stats": variables["batch_stats"]},
                      jnp.asarray(x), method=VQModel.encode_latent)
    np.testing.assert_allclose(np.asarray(jz), tz_np, atol=2e-4, rtol=1e-3)

    _, j_idx = jmodel.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), method=VQModel.encode)
    np.testing.assert_array_equal(np.asarray(j_idx).reshape(-1), t_idx)

    jrec = jmodel.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        np.asarray(j_idx), method=VQModel.decode_code)
    np.testing.assert_allclose(np.asarray(jrec), trec_np, atol=5e-4,
                               rtol=1e-3)


def test_vqbase_real_pt_roundtrip(models, tmp_path):
    """torch.save -> load_torch_checkpoint -> convert -> bitwise tokens
    (VERDICT r1 #7: exercise the importer against a saved .pt artifact)."""
    from mas_tpu.utils.torch_import import load_torch_checkpoint

    cfg, tmodel, jmodel, _ = models
    path = tmp_path / "vqbase.pt"
    # reference VQ-IMG checkpoint layout (train.py:108-116): nested dict
    torch.save({"model": tmodel.state_dict(), "step": 123}, path)
    variables = convert_vqbase_state(load_torch_checkpoint(str(path)), cfg)

    x = np.random.default_rng(7).random((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        tz = tmodel.quant_conv(tmodel.encoder(tx))
        emb = tmodel.quantize.embedding.weight
        flat = tz.permute(0, 2, 3, 1).reshape(-1, emb.shape[1])
        d = (flat.pow(2).sum(1, keepdim=True)
             + emb.pow(2).sum(1) - 2 * flat @ emb.t())
        t_idx = d.argmin(1).numpy()
    _, j_idx = jmodel.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), method=VQModel.encode)
    np.testing.assert_array_equal(np.asarray(j_idx).reshape(-1), t_idx)


def test_transformer_converter_shapes():
    """Synthetic reference-layout transformer state_dict converts into the
    flax tree (shape + structure check)."""
    from mas_tpu.models.transformer import MakeAScene
    from mas_tpu.utils.config import TransformerConfig

    cfg = TransformerConfig(num_layers=2, hidden_dim=64, num_attn_heads=4,
                            image_vocab_size=32, seg_vocab_size=16,
                            text_vocab_size=64, image_tokens_per_dim=2,
                            seg_tokens_per_dim=2, text_length=4)
    d = cfg.hidden_dim
    state = {}
    for name, rows in [("image_token_embedding", 32),
                       ("seg_token_embedding", 16),
                       ("text_token_embedding", 64),
                       ("text_pos_embeddings", 4),
                       ("seg_row_embeddings", 2), ("seg_col_embeddings", 2),
                       ("image_row_embeddings", 2),
                       ("image_col_embeddings", 2)]:
        state[f"{name}.weight"] = np.zeros((rows, d), np.float32)
    for i in range(cfg.num_layers):
        t = f"transformer.layers.{i}"
        for ln in ("ln_in", "ln_out",
                   "first_ln_sandwich", "second_ln_sandwich"):
            state[f"{t}.{ln}.weight"] = np.ones((d,), np.float32)
            state[f"{t}.{ln}.bias"] = np.zeros((d,), np.float32)
        state[f"{t}.attn.qkv.weight"] = np.zeros((3 * d, d), np.float32)
        state[f"{t}.attn.qkv.bias"] = np.zeros((3 * d,), np.float32)
        state[f"{t}.attn.out_proj.weight"] = np.zeros((d, d), np.float32)
        state[f"{t}.attn.out_proj.bias"] = np.zeros((d,), np.float32)
        state[f"{t}.mlp.lin1.weight"] = np.zeros((4 * d, d), np.float32)
        state[f"{t}.mlp.lin1.bias"] = np.zeros((4 * d,), np.float32)
        state[f"{t}.mlp.lin2.weight"] = np.zeros((d, 4 * d), np.float32)
        state[f"{t}.mlp.lin2.bias"] = np.zeros((d,), np.float32)
    state["transformer.final_ln.weight"] = np.ones((d,), np.float32)
    state["transformer.final_ln.bias"] = np.zeros((d,), np.float32)
    state["to_logits.0.weight"] = np.ones((d,), np.float32)
    state["to_logits.0.bias"] = np.zeros((d,), np.float32)
    state["to_logits.1.weight"] = np.zeros((32, d), np.float32)
    state["to_logits.1.bias"] = np.zeros((32,), np.float32)

    converted = convert_transformer_state(state, cfg)
    model = MakeAScene(cfg)
    text = jnp.zeros((1, 4), jnp.int32)
    seg = jnp.zeros((1, 4), jnp.int32)
    img = jnp.zeros((1, 4), jnp.int32)
    ref = model.init(jax.random.PRNGKey(0), text, seg, img)
    assert (jax.tree_util.tree_structure(ref["params"])
            == jax.tree_util.tree_structure(converted["params"]))
    for a, b in zip(jax.tree_util.tree_leaves(ref["params"]),
                    jax.tree_util.tree_leaves(converted["params"])):
        assert a.shape == b.shape
    # converted params run
    out = model.apply(converted, text, seg, img)
    assert out.shape == (1, 4, 32)
