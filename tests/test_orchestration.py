"""Orchestration: training loops end-to-end on tiny configs, preprocessor
fan-out + repack, CLI dispatch (SURVEY §2.4, §3.4 parity)."""

import io
import json
import os
import tarfile

import numpy as np
import pytest

from mas_tpu.data.preprocess import (SyntheticAnnotator, preprocess_local,
                                     preprocess_web)
from mas_tpu.utils.config import (CodebookConfig, OptimizerConfig,
                                  SegLossConfig, TrainConfig, VQModelConfig)


def _tiny_seg_cfg(tmp):
    train = TrainConfig(mode="pretrain_segmentation", total_steps=3,
                        batch_size=2, log_period=1, save_period=3,
                        allow_replicated_batch=True,
                        checkpoint_dir=str(tmp / "ckpt"),
                        optimizer=OptimizerConfig(lr=1e-3))
    model = VQModelConfig(
        in_channels=159, out_channels=159, resolution=32,
        channels=(32, 32), num_res_blocks=1, attn_resolutions=(),
        z_channels=32, embed_dim=32,
        codebook=CodebookConfig(codebook_size=16, codebook_dim=32,
                                init_steps=1, reservoir_size=64,
                                samples_per_image=2))
    return train, model


def test_run_pretrain_segmentation_loop(tmp_path):
    from mas_tpu.data.dataset import SyntheticSegBatches
    from mas_tpu.train.loop import run_pretrain_segmentation
    from mas_tpu.utils.checkpoint import latest_step
    from mas_tpu.utils.logging import Logger

    train, model = _tiny_seg_cfg(tmp_path)
    batches = iter(SyntheticSegBatches(2, resolution=32))
    logger = Logger(str(tmp_path / "logs"), use_tensorboard=False)
    state = run_pretrain_segmentation(train, model, batches, logger=logger)
    assert int(state.step) == 3
    assert latest_step(str(tmp_path / "ckpt")) == 3
    # resume continues from the checkpoint
    train2 = train.replace(resume=True, total_steps=5)
    state2 = run_pretrain_segmentation(train2, model, batches, logger=logger)
    assert int(state2.step) == 5


def test_run_transformer_loop(tmp_path):
    from mas_tpu.data.dataset import SyntheticTokenBatches
    from mas_tpu.train.loop import run_train_transformer
    from mas_tpu.utils.config import TransformerConfig
    from mas_tpu.utils.logging import Logger

    tcfg = TransformerConfig(num_layers=1, hidden_dim=64, num_attn_heads=4,
                             image_vocab_size=32, seg_vocab_size=16,
                             text_vocab_size=64, image_tokens_per_dim=2,
                             seg_tokens_per_dim=2, text_length=4)
    train = TrainConfig(mode="train_transformer", total_steps=2,
                        batch_size=2, log_period=1, save_period=10,
                        allow_replicated_batch=True,
                        checkpoint_dir=str(tmp_path / "ckpt"),
                        optimizer=OptimizerConfig(lr=1e-3))
    state = run_train_transformer(
        train, tcfg, iter(SyntheticTokenBatches(2, tcfg)),
        logger=Logger(str(tmp_path / "logs"), use_tensorboard=False))
    assert int(state.step) == 2


def _write_raw_tar(path, n=2, res=32):
    from PIL import Image

    with tarfile.open(path, "w") as tf:
        for i in range(n):
            key = f"{i:05d}"
            buf = io.BytesIO()
            Image.fromarray(
                (np.random.default_rng(i).random((res, res, 3)) * 255
                 ).astype(np.uint8)).save(buf, "JPEG")
            for name, data in ((f"{key}.jpg", buf.getvalue()),
                               (f"{key}.txt", f"cap {i}".encode())):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))


def test_preprocess_web_and_consume(tmp_path):
    """Raw tar -> annotate -> repack -> PreprocessedWebDataset round trip:
    the full data factory path (SURVEY §3.4)."""
    raw = str(tmp_path / "raw.tar")
    _write_raw_tar(raw)
    anns = {k: SyntheticAnnotator(k) for k in ("panoptic", "human", "face")}
    outs = preprocess_web(raw, str(tmp_path / "out"), anns)
    assert len(outs) == 1 and os.path.exists(outs[0])

    from mas_tpu.data.dataset import PreprocessedWebDataset
    samples = list(PreprocessedWebDataset(outs[0], resolution=32))
    assert len(samples) == 2
    assert samples[0]["mask"].shape == (32, 32, 159)
    assert samples[0]["caption"].startswith("cap")
    # info.state progress file written
    assert os.path.exists(tmp_path / "out" / "info.state")


def test_preprocess_local(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(3):
        Image.fromarray((np.random.default_rng(i).random((16, 16, 3)) * 255
                         ).astype(np.uint8)).save(img_dir / f"im{i}.jpg")
    out = tmp_path / "pre"
    anns = {k: SyntheticAnnotator(k) for k in ("panoptic", "human", "face")}
    preprocess_local([str(img_dir / f"im{i}.jpg") for i in range(3)],
                     str(out), anns, workers_per_annotator=2)
    files = sorted(os.listdir(out))
    assert len(files) == 9            # 3 images x 3 annotators
    z = np.load(out / "im0_panoptic.npz")
    assert "seg_panoptic" in z and "box_things" in z


def test_cli_seg_smoke(tmp_path):
    from mas_tpu.cli import main

    cfg = {
        "train": {"mode": "pretrain_segmentation", "total_steps": 1,
                  "batch_size": 2, "log_period": 1, "save_period": 1, "allow_replicated_batch": True,
                  "checkpoint_dir": str(tmp_path / "ckpt"),
                  "optimizer": {"lr": 1e-3}},
        "model": {"in_channels": 159, "out_channels": 159, "resolution": 32,
                  "channels": [32, 32], "num_res_blocks": 1,
                  "attn_resolutions": [],
                  "z_channels": 32, "embed_dim": 32,
                  "codebook": {"codebook_size": 16, "codebook_dim": 32,
                               "init_steps": 1, "reservoir_size": 64}},
        "loss": {"image_channels": 159},
        "data": {"kind": "synthetic", "resolution": 32},
    }
    path = tmp_path / "cfg.json"
    path.write_text(json.dumps(cfg))
    assert main(["--config", str(path)]) == 0
    assert os.path.exists(tmp_path / "ckpt" / "latest")


def test_cli_eval_mode(tmp_path, capsys):
    """--mode eval: train a tiny VQ-SEG via the CLI, then evaluate the
    checkpoint — prints a JSON metric dict (recon + codebook stats)."""
    from mas_tpu.cli import main

    cfg = {
        "train": {"mode": "pretrain_segmentation", "total_steps": 2,
                  "batch_size": 2, "log_period": 1, "save_period": 2,
                  "allow_replicated_batch": True,
                  "checkpoint_dir": str(tmp_path / "ckpt"),
                  "optimizer": {"lr": 1e-3}},
        "model": {"in_channels": 159, "out_channels": 159, "resolution": 32,
                  "channels": [32, 32], "num_res_blocks": 1,
                  "attn_resolutions": [],
                  "z_channels": 32, "embed_dim": 32,
                  "codebook": {"codebook_size": 16, "codebook_dim": 32,
                               "init_steps": 1, "reservoir_size": 64}},
        "loss": {"image_channels": 159},
        "data": {"kind": "synthetic", "resolution": 32},
        "n_eval_batches": 2,
    }
    path = tmp_path / "cfg.json"
    path.write_text(json.dumps(cfg))
    assert main(["--config", str(path)]) == 0
    cfg["train"]["resume"] = True
    path.write_text(json.dumps(cfg))
    capsys.readouterr()
    assert main(["--config", str(path), "--mode", "eval"]) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    metrics = json.loads(out)
    assert metrics["psnr"] > 0 and 0 < metrics["used_fraction"] <= 1
    assert "lpips" not in metrics    # 159-channel model: no VGG metric


def test_cli_eval_mode_rgb_includes_lpips(tmp_path, capsys):
    """--mode eval on an RGB model wires up LPIPS (random-init VGG trunk
    when no torch weights are given — ranks consistently, cli._run_eval)."""
    from mas_tpu.cli import main

    cfg = {
        "train": {"mode": "pretrain_image", "batch_size": 2},
        "model": {"in_channels": 3, "out_channels": 3, "resolution": 32,
                  "channels": [32, 32], "num_res_blocks": 1,
                  "attn_resolutions": [],
                  "z_channels": 32, "embed_dim": 32,
                  "codebook": {"codebook_size": 16, "codebook_dim": 32,
                               "init_steps": 1, "reservoir_size": 64}},
        "data": {"kind": "synthetic", "resolution": 32},
        "n_eval_batches": 1,
    }
    path = tmp_path / "cfg.json"
    path.write_text(json.dumps(cfg))
    capsys.readouterr()
    assert main(["--config", str(path), "--mode", "eval"]) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    metrics = json.loads(out)
    assert np.isfinite(metrics["lpips"]) and metrics["lpips"] >= 0
    assert metrics["mse"] > 0    # random init reconstructs poorly


def test_loop_raises_on_untiled_batch(tmp_path):
    """A global batch that doesn't tile the data axis must raise (not
    silently replicate) unless allow_replicated_batch is set."""
    from mas_tpu.data.dataset import SyntheticSegBatches
    from mas_tpu.train.loop import run_pretrain_segmentation
    from mas_tpu.utils.logging import Logger

    train, model = _tiny_seg_cfg(tmp_path)
    train = train.replace(allow_replicated_batch=False)   # batch 2, 8 devices
    with pytest.raises(ValueError, match="does not tile the data axis"):
        run_pretrain_segmentation(
            train, model, iter(SyntheticSegBatches(2, resolution=32)),
            logger=Logger(str(tmp_path / "logs"), use_tensorboard=False))


def test_cli_calls_distributed_initialize(tmp_path, monkeypatch):
    """cli.main must run the multi-host rendezvous before training
    (reference train.py:20-34 orders init_process_group first)."""
    import mas_tpu.parallel.distributed as dist
    from mas_tpu.cli import main
    from mas_tpu.utils.config import ConfigError

    calls = []
    real = dist.initialize

    def spy(*a, **k):
        calls.append(True)
        return real(*a, **k)

    monkeypatch.setattr(dist, "initialize", spy)
    cfg = {"train": {"mode": "definitely_invalid"}}
    path = tmp_path / "cfg.json"
    path.write_text(json.dumps(cfg))
    with pytest.raises(ConfigError):
        main(["--config", str(path)])
    assert calls, "initialize() was not called from cli.main"


def test_cli_rejects_unknown_keys(tmp_path):
    from mas_tpu.cli import main
    from mas_tpu.utils.config import ConfigError

    cfg = {"train": {"mode": "pretrain_segmentation", "bogus_key": 1}}
    path = tmp_path / "cfg.json"
    path.write_text(json.dumps(cfg))
    with pytest.raises(ConfigError):
        main(["--config", str(path)])


def test_shipped_configs_parse():
    import glob

    from mas_tpu.utils.config import (TrainConfig, TransformerConfig,
                                      VQModelConfig)

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    found = sorted(glob.glob(os.path.join(root, "*.json")))
    assert found, "configs/ must ship run configs"
    train_modes = ("pretrain_segmentation", "pretrain_image",
                   "train_transformer")
    for p in found:
        with open(p) as f:
            raw = json.load(f)
        train_raw = dict(raw.get("train", {}))
        # eval/sample/preprocess modes reuse the generic fields (the CLI
        # performs the same remap)
        if train_raw.get("mode") not in train_modes:
            train_raw["mode"] = train_modes[0]
        TrainConfig.from_dict(train_raw)
        if "model" in raw:
            VQModelConfig.from_dict(raw["model"])
        if "transformer" in raw:
            TransformerConfig.from_dict(raw["transformer"])


def test_tokenize_batches_and_tokenizer(tmp_path):
    """Pixels+captions -> (text, seg, image) tokens via the two frozen VQ
    encoders + the hash tokenizer (the stage-2 glue the reference lacks,
    SURVEY §3.3)."""
    import jax
    import jax.numpy as jnp

    from mas_tpu.data.tokenizer import HashWordTokenizer
    from mas_tpu.models.vqvae import VQModel
    from mas_tpu.train.loop import tokenize_batches
    from mas_tpu.utils.config import CodebookConfig, VQModelConfig

    seg_cfg = VQModelConfig(
        in_channels=159, out_channels=159, resolution=32, channels=(32, 32),
        num_res_blocks=1, attn_resolutions=(), z_channels=32, embed_dim=32,
        codebook=CodebookConfig(codebook_size=16, codebook_dim=32))
    img_cfg = seg_cfg.replace(in_channels=3, out_channels=3)
    vq_seg, vq_img = VQModel(seg_cfg), VQModel(img_cfg)
    seg_vars = vq_seg.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 159)))
    img_vars = vq_img.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))

    pixel_batches = [dict(
        image=np.random.default_rng(0).random((2, 32, 32, 3)).astype(
            np.float32),
        mask=np.random.default_rng(1).random((2, 32, 32, 159)).astype(
            np.float32),
        caption=["a cat", "a dog on a mat"])]
    tok = HashWordTokenizer(vocab_size=64, text_length=8)
    batches = list(tokenize_batches(iter(pixel_batches), vq_seg, seg_vars,
                                    vq_img, img_vars, tok))
    assert len(batches) == 1
    b = batches[0]
    assert b["text"].shape == (2, 8) and b["text"].dtype == np.int32
    n_tok = seg_cfg.latent_resolution ** 2
    assert b["seg"].shape == (2, n_tok)
    assert b["image"].shape == b["seg"].shape
    assert b["image"].max() < 16
    # tokenizer determinism + pad
    t2 = tok(["a cat", "a dog on a mat"])
    np.testing.assert_array_equal(b["text"], t2)
    assert t2[0, 2:].sum() == 0 and t2[0, 0] > 0


def test_run_show_saves_grids(tmp_path):
    from mas_tpu.data.dataset import SyntheticSegBatches
    from mas_tpu.train.loop import run_pretrain_segmentation, run_show
    from mas_tpu.utils.logging import Logger

    train, model = _tiny_seg_cfg(tmp_path)
    batches = iter(SyntheticSegBatches(2, resolution=32))
    run_pretrain_segmentation(
        train, model, batches,
        logger=Logger(str(tmp_path / "logs"), use_tensorboard=False))
    paths = run_show(train, model, iter(SyntheticSegBatches(2, 32)),
                     n_samples=4, out_dir=str(tmp_path / "results"))
    assert len(paths) == 2
    assert all(os.path.exists(p) for p in paths)


def test_cli_sample_with_captions(tmp_path):
    """--mode sample: captions tokenize into the conditional stream (the
    inference script the reference never shipped), image saved."""
    from mas_tpu.cli import main

    cfg = {
        "train": {"mode": "sample", "batch_size": 2, "seed": 0},
        "transformer": {
            "num_layers": 1, "hidden_dim": 64, "num_attn_heads": 4,
            "image_vocab_size": 16, "seg_vocab_size": 16,
            "text_vocab_size": 64 + 8, "image_tokens_per_dim": 4,
            "seg_tokens_per_dim": 2, "text_length": 8},
        "model": {"in_channels": 3, "out_channels": 3, "resolution": 8,
                  "channels": [32, 32], "num_res_blocks": 1,
                  "attn_resolutions": [], "z_channels": 32, "embed_dim": 32,
                  "codebook": {"codebook_size": 16, "codebook_dim": 32}},
        "captions": ["a cat", "a dog"],
        "guidance_scale": 2.0,
        "top_k": 4,
        "output": str(tmp_path / "out.jpg"),
    }
    path = tmp_path / "cfg.json"
    path.write_text(json.dumps(cfg))
    assert main(["--config", str(path)]) == 0
    assert os.path.exists(tmp_path / "out.jpg")


def test_python_dash_m_package_entry():
    """``python -m mas_tpu --help`` works (alias for ``-m mas_tpu.cli``);
    argparse --help exits before any backend init, so this stays CPU-free."""
    import subprocess
    import sys

    r = subprocess.run([sys.executable, "-m", "mas_tpu", "--help"],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0
    assert "--mode" in r.stdout


def test_cli_export_mode_vq(tmp_path, capsys):
    """--mode export: train a tiny VQ-SEG, export the checkpoint to a
    reference-layout torch .pt, convert it back — the CLI return leg of
    MIGRATION.md §3."""
    from mas_tpu.cli import main
    from mas_tpu.utils.config import VQModelConfig
    from mas_tpu.utils.torch_import import (convert_vqbase_state,
                                            load_torch_checkpoint)

    model = {"in_channels": 159, "out_channels": 159, "resolution": 32,
             "channels": [32, 32], "num_res_blocks": 1,
             "attn_resolutions": [],
             "z_channels": 32, "embed_dim": 32,
             "codebook": {"codebook_size": 16, "codebook_dim": 32,
                          "init_steps": 1, "reservoir_size": 64}}
    cfg = {
        "train": {"mode": "pretrain_segmentation", "total_steps": 1,
                  "batch_size": 2, "log_period": 1, "save_period": 1,
                  "allow_replicated_batch": True,
                  "checkpoint_dir": str(tmp_path / "ckpt"),
                  "optimizer": {"lr": 1e-3}},
        "model": model,
        "loss": {"image_channels": 159},
        "data": {"kind": "synthetic", "resolution": 32},
    }
    path = tmp_path / "cfg.json"
    path.write_text(json.dumps(cfg))
    assert main(["--config", str(path)]) == 0

    out_pt = str(tmp_path / "vq_seg.pt")
    export_cfg = {"train": {"mode": "pretrain_segmentation"},
                  "model": model,
                  "checkpoint": str(tmp_path / "ckpt"),
                  "output": out_pt}
    path.write_text(json.dumps(export_cfg))
    capsys.readouterr()
    assert main(["--config", str(path), "--mode", "export"]) == 0
    assert capsys.readouterr().out.strip().endswith("vq_seg.pt")
    state = load_torch_checkpoint(out_pt)
    assert "quantize.embedding.weight" in state
    assert "encoder.model.0.weight" in state
    back = convert_vqbase_state(state, VQModelConfig.from_dict(model))
    assert back["params"]["codebook_embedding"].shape == (16, 32)


def test_cli_eval_and_export_from_accumulate_grad_checkpoint(tmp_path,
                                                             capsys):
    """Checkpoints trained with accumulate_grad > 1 carry an
    optax.MultiSteps opt_state; eval/sample/export restore params-only
    (restore_variables) so they must load regardless of the training
    optimizer's structure (the shipped seg_256/img_512 configs both use
    accumulation — a template-based restore broke on them)."""
    from mas_tpu.cli import main

    model = {"in_channels": 159, "out_channels": 159, "resolution": 32,
             "channels": [32, 32], "num_res_blocks": 1,
             "attn_resolutions": [],
             "z_channels": 32, "embed_dim": 32,
             "codebook": {"codebook_size": 16, "codebook_dim": 32,
                          "init_steps": 1, "reservoir_size": 64}}
    cfg = {
        "train": {"mode": "pretrain_segmentation", "total_steps": 2,
                  "batch_size": 2, "log_period": 1, "save_period": 2,
                  "allow_replicated_batch": True,
                  "checkpoint_dir": str(tmp_path / "ckpt"),
                  "optimizer": {"lr": 1e-3, "accumulate_grad": 2}},
        "model": model,
        "loss": {"image_channels": 159},
        "data": {"kind": "synthetic", "resolution": 32},
        "n_eval_batches": 2,
    }
    path = tmp_path / "cfg.json"
    path.write_text(json.dumps(cfg))
    assert main(["--config", str(path)]) == 0

    cfg["train"]["resume"] = True
    path.write_text(json.dumps(cfg))
    capsys.readouterr()
    assert main(["--config", str(path), "--mode", "eval"]) == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["psnr"] > 0

    out_pt = str(tmp_path / "vq.pt")
    export_cfg = {"train": {"mode": "pretrain_segmentation"},
                  "model": model,
                  "checkpoint": str(tmp_path / "ckpt"),
                  "output": out_pt}
    path.write_text(json.dumps(export_cfg))
    assert main(["--config", str(path), "--mode", "export"]) == 0
    assert os.path.exists(out_pt)


def test_cli_export_mode_transformer(tmp_path, capsys):
    """--mode export on a transformer section (random-init layout smoke):
    emits the reference MakeAScene state_dict naming."""
    from mas_tpu.cli import main
    from mas_tpu.utils.torch_import import load_torch_checkpoint

    out_pt = str(tmp_path / "ar.pt")
    cfg = {
        "train": {"mode": "train_transformer"},
        "transformer": {
            "num_layers": 1, "hidden_dim": 64, "num_attn_heads": 4,
            "image_vocab_size": 16, "seg_vocab_size": 16,
            "text_vocab_size": 64 + 8, "image_tokens_per_dim": 4,
            "seg_tokens_per_dim": 2, "text_length": 8},
        "output": out_pt,
    }
    path = tmp_path / "cfg.json"
    path.write_text(json.dumps(cfg))
    assert main(["--config", str(path), "--mode", "export"]) == 0
    state = load_torch_checkpoint(out_pt)
    assert "transformer.layers.0.attn.qkv.weight" in state
    assert state["to_logits.1.weight"].shape == (16, 64)


def test_cli_sample_from_scan_layers_checkpoint(tmp_path):
    """A scan_layers training run saves the STACKED param tree; --mode
    sample must restore it into a stacked template and unstack for the
    unrolled serving graph (prefill rejects scan configs by design)."""
    from mas_tpu.cli import main

    transformer = {
        "num_layers": 2, "hidden_dim": 64, "num_attn_heads": 4,
        "image_vocab_size": 16, "seg_vocab_size": 16,
        "text_vocab_size": 64 + 8, "image_tokens_per_dim": 4,
        "seg_tokens_per_dim": 2, "text_length": 8, "scan_layers": True}
    cfg = {
        "train": {"mode": "train_transformer", "total_steps": 2,
                  "batch_size": 2, "log_period": 1, "save_period": 2,
                  "allow_replicated_batch": True,
                  "checkpoint_dir": str(tmp_path / "ckpt"),
                  "optimizer": {"lr": 1e-3}},
        "transformer": transformer,
        "data": {"kind": "synthetic"},
    }
    path = tmp_path / "cfg.json"
    path.write_text(json.dumps(cfg))
    assert main(["--config", str(path)]) == 0
    assert os.path.exists(tmp_path / "ckpt" / "latest")

    sample_cfg = {
        "train": {"mode": "sample", "batch_size": 2, "seed": 0},
        "transformer": transformer,
        "transformer_checkpoint": str(tmp_path / "ckpt"),
        "model": {"in_channels": 3, "out_channels": 3, "resolution": 8,
                  "channels": [32, 32], "num_res_blocks": 1,
                  "attn_resolutions": [], "z_channels": 32, "embed_dim": 32,
                  "codebook": {"codebook_size": 16, "codebook_dim": 32}},
        "captions": ["a house", "a tree"],
        "top_k": 4,
        "output": str(tmp_path / "scan_sample.jpg"),
    }
    path.write_text(json.dumps(sample_cfg))
    assert main(["--config", str(path)]) == 0
    assert os.path.exists(tmp_path / "scan_sample.jpg")

    # the same stacked checkpoint exports to the reference layout
    from mas_tpu.utils.torch_import import load_torch_checkpoint

    out_pt = str(tmp_path / "scan_ar.pt")
    export_cfg = {"train": {"mode": "train_transformer"},
                  "transformer": transformer,
                  "transformer_checkpoint": str(tmp_path / "ckpt"),
                  "output": out_pt}
    path.write_text(json.dumps(export_cfg))
    assert main(["--config", str(path), "--mode", "export"]) == 0
    state = load_torch_checkpoint(out_pt)
    assert "transformer.layers.1.mlp.lin2.weight" in state


def test_run_pretrain_segmentation_packed_labels(tmp_path):
    """Packed int16 label batches expand to the one-hot in-graph and train
    to the same machinery (the 80x-less-transfer input path)."""
    import numpy as np

    from mas_tpu.data.dataset import StructuredSceneBatches
    from mas_tpu.train.loop import run_pretrain_segmentation
    from mas_tpu.utils.logging import Logger

    train, model = _tiny_seg_cfg(tmp_path)
    src = iter(StructuredSceneBatches(2, resolution=32, seed=5,
                                      cache_scenes=4, compact=True))
    batches = ({"seg_packed": b["seg_packed"]} for b in src)
    logger = Logger(str(tmp_path / "logs"), use_tensorboard=False)
    state = run_pretrain_segmentation(train, model, batches, logger=logger)
    assert int(state.step) == 3
    assert np.isfinite(float(state.step))


def test_preprocess_web_pipe_sink(tmp_path):
    """Remote-sink parity (preprocessor_web.py:240-243): output tars stream
    through a ``pipe:`` command template instead of landing in out_dir."""
    raw = str(tmp_path / "raw.tar")
    _write_raw_tar(raw)
    sink_dir = tmp_path / "remote"
    sink_dir.mkdir()
    anns = {k: SyntheticAnnotator(k) for k in ("panoptic", "human", "face")}
    outs = preprocess_web(
        raw, str(tmp_path / "out"), anns,
        out_url=f"pipe:cat > {sink_dir}/{{name}}")
    assert outs == [f"pipe:cat > {sink_dir}/raw.tar"]
    # nothing written locally; the piped tar is a valid processed shard
    assert not os.path.exists(tmp_path / "out" / "raw.tar")
    from mas_tpu.data.dataset import PreprocessedWebDataset
    samples = list(PreprocessedWebDataset(str(sink_dir / "raw.tar"),
                                          resolution=32))
    assert len(samples) == 2 and samples[0]["mask"].shape == (32, 32, 159)


def test_repack_pipe_sink_failure_raises(tmp_path):
    from mas_tpu.data.preprocess import repack_single_tar

    raw = str(tmp_path / "raw.tar")
    _write_raw_tar(raw, n=1)
    with pytest.raises(RuntimeError, match="repack sink"):
        repack_single_tar(raw, str(tmp_path), "pipe:exit 3", ("panoptic",))


def test_preprocess_web_surfaces_repack_child_failure(tmp_path):
    """A failing remote sink inside the repack CHILD process must fail the
    run — otherwise the coordinator reports the shard as written while it
    never reached the sink (the production path of the pipe-sink feature;
    the direct-call test above doesn't cover the mp.Process boundary)."""
    raw = str(tmp_path / "raw.tar")
    _write_raw_tar(raw)
    anns = {k: SyntheticAnnotator(k) for k in ("panoptic", "human", "face")}
    with pytest.raises(RuntimeError, match="repack process"):
        preprocess_web(raw, str(tmp_path / "out"), anns,
                       out_url="pipe:exit 3")
