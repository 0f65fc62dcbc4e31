"""Direct tests for public surface that was only covered transitively:
shard expansion, packed-seg device expansion, prefetch, tokenizer adapter,
loss primitives (torch oracles), codebook eval helpers, attention dispatch,
compilation cache, and the config-driven preprocessor entry."""

import json
import os
import warnings

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# --- data: shards / crops / packed seg --------------------------------------

def test_expand_shards(tmp_path):
    from mas_tpu.data.tario import expand_shards

    for name in ("b.tar", "a.tar", "notes.txt"):
        (tmp_path / name).write_bytes(b"")
    assert expand_shards(str(tmp_path)) == [str(tmp_path / "a.tar"),
                                            str(tmp_path / "b.tar")]
    assert expand_shards("pipe:cat x.tar") == ["pipe:cat x.tar"]
    assert expand_shards(["s1.tar", "s2.tar"]) == ["s1.tar", "s2.tar"]


def test_center_crop():
    from mas_tpu.data.dataset import center_crop

    img = np.arange(7 * 9 * 3).reshape(7, 9, 3)
    out = center_crop(img, 5)
    assert out.shape == (5, 5, 3)
    np.testing.assert_array_equal(out, img[1:6, 2:7])


def test_one_hot_seg_packed_matches_host_assembly():
    """pack_seg_labels -> one_hot_seg_packed (device) == assemble_seg_map
    (host) — the compact int16 transfer path is semantics-preserving."""
    from mas_tpu.data.segmap import (assemble_seg_map, one_hot_seg_packed,
                                     pack_seg_labels)

    rng = np.random.default_rng(0)
    h = w = 16
    sp = rng.integers(-1, 133, (h, w))
    sh = rng.integers(-1, 20, (h, w))
    sf = rng.integers(0, 6, (h, w))
    edge = rng.integers(0, 3, (h, w))       # summed panoptic+human, may be 2
    packed = pack_seg_labels(sp, edge, sh, sf)
    assert packed.dtype == np.int16 and packed.shape == (h, w, 4)
    host = assemble_seg_map(sp, edge, sh, np.zeros_like(edge), sf)
    dev = np.asarray(one_hot_seg_packed(packed))
    np.testing.assert_array_equal(dev, host)


def test_warn_and_continue_policy():
    from mas_tpu.data.tario import warn_and_continue

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert warn_and_continue(ValueError("bad sample")) is True
    assert any("bad sample" in str(x.message) for x in w)


def test_prefetch_iterator_order_and_error():
    from mas_tpu.data.prefetch import PrefetchIterator

    assert list(PrefetchIterator(iter(range(10)), size=3)) == list(range(10))

    def boom():
        yield 1
        yield 2
        raise RuntimeError("producer died")

    it = PrefetchIterator(boom(), size=1)
    assert next(it) == 1 and next(it) == 2
    with pytest.raises(RuntimeError, match="producer died"):
        next(it)


def test_hf_tokenizer_adapter_shift_truncate_pad():
    from mas_tpu.data.tokenizer import HFTokenizerAdapter

    class StubTok:
        def encode(self, text, add_special_tokens=False):
            assert not add_special_tokens
            return [len(w) for w in text.split()]

    tok = HFTokenizerAdapter(StubTok(), text_length=4)
    out = tok(["a bb ccc", "dddd eeeee ffffff ggggggg hhh"])
    assert out.shape == (2, 4) and out.dtype == np.int32
    # ids shifted +1 so 0 stays pad; over-length truncates
    np.testing.assert_array_equal(out[0], [2, 3, 4, 0])
    np.testing.assert_array_equal(out[1], [5, 6, 7, 8])


# --- losses: torch oracles ----------------------------------------------------

def test_weighted_bce_matches_torch_oracle():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from mas_tpu.losses.seg import weighted_bce_with_logits

    rng = np.random.default_rng(1)
    logits = rng.normal(0, 3, (4, 8, 8, 5)).astype(np.float32)
    targets = (rng.random((4, 8, 8, 5)) < 0.3).astype(np.float32)
    pos_w = np.array([1.0, 20.0, 0.5, 7.0, 1.0], np.float32)
    ours = float(weighted_bce_with_logits(jnp.asarray(logits),
                                          jnp.asarray(targets),
                                          jnp.asarray(pos_w)))
    theirs = float(F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets),
        pos_weight=torch.from_numpy(pos_w)))
    assert abs(ours - theirs) < 1e-5, (ours, theirs)


def test_vanilla_d_loss_values():
    from mas_tpu.losses.discriminator import vanilla_d_loss

    z = jnp.zeros((4, 2))
    np.testing.assert_allclose(float(vanilla_d_loss(z, z)), np.log(2.0),
                               rtol=1e-6)
    # confident correct discriminator -> lower loss than confident wrong
    good = float(vanilla_d_loss(jnp.full((4,), 5.0), jnp.full((4,), -5.0)))
    bad = float(vanilla_d_loss(jnp.full((4,), -5.0), jnp.full((4,), 5.0)))
    assert good < 0.05 < bad


def test_load_lpips_params_from_torch_file(tmp_path):
    torch = pytest.importorskip("torch")

    from mas_tpu.losses.lpips import (_TORCH_CONV_IDX, _VGG_PLAN,
                                      load_lpips_params_from_torch)

    state = {}
    in_ch = 3
    chans = []
    for ch, n in _VGG_PLAN:
        chans += [ch] * n
    for tidx, out_ch in zip(_TORCH_CONV_IDX, chans):
        state[f"features.{tidx}.weight"] = torch.zeros(out_ch, in_ch, 3, 3)
        state[f"features.{tidx}.bias"] = torch.zeros(out_ch)
        in_ch = out_ch
    for i, c in enumerate((64, 128, 256, 512, 512)):
        state[f"lin{i}.model.1.weight"] = torch.ones(1, c, 1, 1)
    path = str(tmp_path / "vgg.pth")
    torch.save({"state_dict": state}, path)
    params = load_lpips_params_from_torch(path)
    assert params["vgg"]["conv0_0"]["kernel"].shape == (3, 3, 3, 64)
    assert params["lin4"].shape == (512, 1)


# --- models / train helpers ---------------------------------------------------

def test_quantize_eval_and_lookup_roundtrip():
    from mas_tpu.models.codebook import lookup, quantize_eval

    emb = jnp.asarray(np.random.default_rng(2).normal(0, 1, (16, 8))
                      .astype(np.float32))
    idx = jnp.asarray([3, 7, 0, 15])
    z = lookup(idx, emb)
    assert z.shape == (4, 8)
    z_q, back = quantize_eval(z, emb)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(idx))
    np.testing.assert_allclose(np.asarray(z_q), np.asarray(z), atol=1e-6)


def test_make_seg_eval_step():
    from mas_tpu.models.vqvae import VQModel
    from mas_tpu.train.steps import make_seg_eval_step
    from mas_tpu.utils.config import CodebookConfig, VQModelConfig

    cfg = VQModelConfig(
        in_channels=159, out_channels=159, resolution=16,
        channels=(32, 32), num_res_blocks=1, attn_resolutions=(),
        z_channels=32, embed_dim=32,
        codebook=CodebookConfig(codebook_size=8, codebook_dim=32))
    model = VQModel(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 16, 159)))
    step = make_seg_eval_step(model)
    seg = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(1), (2, 16, 16), 0, 159), 159)
    recon, q_loss = step(variables["params"],
                         variables.get("batch_stats", {}), seg)
    assert recon.shape == (2, 16, 16, 159)
    assert np.isfinite(float(q_loss))


def test_resolve_attention_impl_dispatch():
    from mas_tpu.models.transformer import (DEFAULT_BLOCK_K, DEFAULT_BLOCK_Q,
                                            resolve_attention_impl)
    from mas_tpu.utils.config import TransformerConfig

    cfg = TransformerConfig()
    # explicit override always wins
    for impl in ("jnp", "pallas"):
        assert resolve_attention_impl(
            cfg.replace(attention_impl=impl), 999) == impl
    # auto on the CPU backend (this suite forces cpu) -> jnp everywhere
    aligned = max(DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K) * 2
    assert jax.default_backend() == "cpu"
    assert resolve_attention_impl(cfg, aligned) == "jnp"
    assert resolve_attention_impl(cfg, aligned + 1) == "jnp"


def test_enable_compilation_cache(tmp_path, monkeypatch):
    from mas_tpu.utils.compile_cache import enable_compilation_cache

    target = str(tmp_path / "xla_cache")
    assert enable_compilation_cache(target) == target
    assert os.path.isdir(target)
    assert jax.config.jax_compilation_cache_dir == target
    monkeypatch.setenv("MAS_COMPILATION_CACHE", "off")
    assert enable_compilation_cache() is None


def test_lpips_feature_fn_for_fid():
    """Pooled VGG taps as the FID feature function: shape = sum of tap
    channels, and FID(features, same features) ~ 0."""
    from mas_tpu.eval import FIDAccumulator, lpips_feature_fn
    from mas_tpu.losses.lpips import LPIPS

    lp = LPIPS()
    x = jnp.zeros((2, 32, 32, 3))
    variables = lp.init(jax.random.PRNGKey(0), x, x)
    fn = lpips_feature_fn(lp, variables)
    imgs = np.random.default_rng(3).random((8, 32, 32, 3)).astype(np.float32)
    feats = np.asarray(fn(imgs))
    assert feats.shape == (8, 64 + 128 + 256 + 512 + 512)
    acc_a, acc_b = FIDAccumulator(fn), FIDAccumulator(fn)
    acc_a.update(imgs)
    acc_b.update(imgs)
    assert abs(acc_a.fid(acc_b)) < 1e-4


def test_replicated_shardings_tree():
    from jax.sharding import PartitionSpec as P

    from mas_tpu.parallel.mesh import make_mesh
    from mas_tpu.parallel.sharding import replicated_shardings

    mesh = make_mesh()
    tree = {"a": jnp.zeros((2, 2)), "b": {"c": jnp.zeros((3,))}}
    shardings = replicated_shardings(mesh, tree)
    assert shardings["b"]["c"].spec == P()
    x = jax.device_put(tree["a"], shardings["a"])
    np.testing.assert_array_equal(np.asarray(x), np.zeros((2, 2)))


# --- preprocessor config entry --------------------------------------------

def test_run_preprocessor_local_config(tmp_path):
    from PIL import Image

    from mas_tpu.data.preprocess import run_preprocessor

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(2):
        Image.fromarray((np.random.default_rng(i).random((16, 16, 3)) * 255
                         ).astype(np.uint8)).save(img_dir / f"im{i}.jpg")
    out = tmp_path / "pre"
    run_preprocessor({
        "mode": "local",
        "images": [str(img_dir / f"im{i}.jpg") for i in range(2)],
        "out_dir": str(out),
        "annotators": {"panoptic": {"type": "synthetic", "seed": 3}},
    })
    files = sorted(os.listdir(out))
    assert len(files) == 6           # 2 images x 3 annotator kinds
    assert "im0_panoptic.npz" in files and "im1_face.npz" in files


def test_torchscript_annotator(tmp_path):
    torch = pytest.importorskip("torch")

    from mas_tpu.data.preprocess import TorchScriptAnnotator

    class Ann(torch.nn.Module):
        def forward(self, x):
            # x: [1, 3, H, W] float
            seg = torch.zeros(x.shape[2], x.shape[3], dtype=torch.long)
            boxes = torch.zeros(0, 4)
            return {"seg_panoptic": seg, "box_things": boxes}

    path = str(tmp_path / "ann.pt")
    # trace (not script): scripting parses live source through inspect,
    # which is order-fragile under the full suite; strict=False permits
    # the dict output
    ex = torch.zeros(1, 3, 16, 16)
    torch.jit.trace(Ann(), ex, strict=False).save(path)
    ann = TorchScriptAnnotator("panoptic", path)
    out = ann(np.zeros((16, 16, 3), np.uint8))
    assert out["seg_panoptic"].shape == (16, 16)
    assert out["box_things"].shape == (0, 4)
