"""Command-line entry point: mode dispatch over typed JSON configs.

Replaces the reference Hydra ``launch()`` (``/root/reference/train.py:
207-225``; modes ``pretrain_segmentation`` / ``pretrain_image`` /
``train_transformer`` / ``show`` / ``preprocess_dataset``) with argparse +
the strict dataclass config schema (``mas_tpu.utils.config``), and adds the
``sample``, ``eval`` and ``export`` (checkpoint -> reference torch ``.pt``)
modes the reference never shipped.

Usage:
    python -m mas_tpu.cli --config configs/seg_256.json [--mode ...]
    python -m mas_tpu.cli --mode sample --config configs/sample_256.json

Config files are JSON objects with sections ``train`` / ``model`` /
``transformer`` / ``loss`` / ``data``; unknown keys anywhere are errors
(the reference's kwargs-swallowing misconfigured its own seg decoder —
SURVEY §2.4 pitfall).
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Any, Dict

from .utils.config import (ConfigError, SegLossConfig, TrainConfig,
                           TransformerConfig, VQGANLossConfig, VQModelConfig,
                           vq_img_config, vq_seg_config)


def _load(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return json.load(f)


def _global_batch(train_cfg: TrainConfig) -> int:
    """Per-PROCESS host batch: reference configs give a per-replica batch
    (batch 2/GPU, ``conf/img_config.yaml:2-17``); each host's input
    pipeline produces per-replica x data-axis / process_count rows and
    ``shard_batch`` assembles the global array from the per-process
    shards — no host decodes another host's samples."""
    import jax

    data, _ = train_cfg.mesh.shape(len(jax.devices()))
    total = train_cfg.batch_size * data
    if total % jax.process_count():
        raise ConfigError(
            f"global batch {total} (batch_size {train_cfg.batch_size} x "
            f"data axis {data}) must be divisible by the process count "
            f"{jax.process_count()}")
    return total // jax.process_count()


def _data_iter(data_cfg: Dict[str, Any], mode: str, batch_size: int,
               model_cfg=None, tcfg=None):
    """Build the host batch iterator from the config's ``data`` section."""
    from .data.dataset import (PreprocessedWebDataset, SyntheticImgBatches,
                               SyntheticSegBatches, SyntheticTokenBatches,
                               batch_iterator)

    kind = data_cfg.get("kind", "synthetic")
    if kind == "synthetic":
        res = data_cfg.get("resolution",
                           model_cfg.resolution if model_cfg else 256)
        seed = data_cfg.get("seed", 0)
        if mode == "pretrain_segmentation":
            return iter(SyntheticSegBatches(batch_size, res, seed))
        if mode == "pretrain_image":
            return iter(SyntheticImgBatches(batch_size, res, seed=seed))
        return iter(SyntheticTokenBatches(batch_size, tcfg, seed))
    if kind == "webdataset":
        import jax

        from .data.prefetch import prefetch

        ds = PreprocessedWebDataset(
            data_cfg["shards"],
            resolution=data_cfg.get("resolution", 512),
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            need_seg=(mode != "pretrain_image"))
        batches = batch_iterator(ds, batch_size,
                                 max_boxes=data_cfg.get("max_boxes", 6),
                                 need_seg=(mode != "pretrain_image"))
        # background thread keeps batches ahead of the async TPU step
        return prefetch(batches, size=data_cfg.get("prefetch", 2))
    if kind == "local_npz":
        # reference local mode: COCO-style image dir + per-image
        # {name}_{panoptic,human,face}.npz from the offline annotators
        # (Data/dataset_preprocessor.py:54-95; conf/seg_config.yaml)
        import jax

        from .data.dataset import PreprocessedLocalDataset
        from .data.prefetch import prefetch

        ds = PreprocessedLocalDataset(
            data_cfg["image_dir"], data_cfg["preprocessed_dir"],
            resolution=data_cfg.get("resolution", 256),
            seed=data_cfg.get("seed", 0))

        def samples():
            # infinite shuffled epochs, strided across hosts; every host
            # permutes with the SAME seed so the strides partition exactly
            # (the reference's DistributedSampler contract)
            import numpy as np
            rng = np.random.default_rng(data_cfg.get("seed", 0))
            pi, pc = jax.process_index(), jax.process_count()
            while True:
                order = rng.permutation(len(ds))
                for i in order[pi::pc]:
                    yield ds[int(i)]

        batches = batch_iterator(samples(), batch_size,
                                 max_boxes=data_cfg.get("max_boxes", 6),
                                 need_seg=(mode != "pretrain_image"))
        return prefetch(batches, size=data_cfg.get("prefetch", 2))
    raise ConfigError(f"unknown data kind {kind!r}")


def _load_vq(vq_cfg_raw: Dict[str, Any], checkpoint_dir):
    """Build a VQModel + its (params, batch_stats) variables, restoring
    from a training checkpoint when given.

    Restores via ``restore_variables`` (params-only, no state template):
    inference paths don't know the run's optimizer config, and the
    optimizer tree's structure depends on it (``accumulate_grad > 1``
    wraps Adam in MultiSteps), so a template restore here would break on
    any checkpoint whose training optimizer differed from the template's
    — e.g. the shipped ``seg_256.json``/``img_512.json`` runs.  This also
    covers both the plain VQ-SEG state and the VQ-IMG state carrying the
    discriminator (whose extra fields are simply not read)."""
    import jax
    import jax.numpy as jnp

    from .models.vqvae import VQModel
    from .utils.checkpoint import restore_variables

    vq_cfg = VQModelConfig.from_dict(vq_cfg_raw)
    vq = VQModel(vq_cfg)
    if checkpoint_dir:
        variables = restore_variables(checkpoint_dir)
        variables.setdefault("batch_stats", {})
        return vq, variables
    init = vq.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, vq_cfg.resolution, vq_cfg.resolution,
                              vq_cfg.in_channels)))
    return vq, {"params": init["params"],
                "batch_stats": init.get("batch_stats", {})}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="mas_tpu",
                                 description=__doc__.split("\n")[0])
    ap.add_argument("--config", required=True, help="JSON config path")
    ap.add_argument("--mode", default=None,
                    help="override the config's train.mode")
    args = ap.parse_args(argv)

    # Multi-host rendezvous BEFORE any device use (the reference orders
    # dist.init_process_group ahead of training, train.py:20-34); no-ops on
    # single-process runs, so call it unconditionally.
    from .parallel.distributed import initialize
    from .utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    topo = initialize()
    if topo["process_index"] == 0 and topo["process_count"] > 1:
        print(f"multi-host topology: {topo}")

    raw = _load(args.config)
    train_raw = dict(raw.get("train", {}))
    if args.mode:
        train_raw["mode"] = args.mode
    mode = train_raw.get("mode", "pretrain_segmentation")
    train_modes = ("pretrain_segmentation", "pretrain_image",
                   "train_transformer")
    # TrainConfig only validates the 3 training modes; eval/sample/preprocess
    # modes reuse its generic fields
    train_raw["mode"] = mode if mode in train_modes else train_modes[0]
    train_cfg = TrainConfig.from_dict(train_raw)

    from .train import loop as L

    if mode == "pretrain_segmentation":
        model_cfg = (VQModelConfig.from_dict(raw["model"])
                     if "model" in raw else vq_seg_config())
        loss_cfg = (SegLossConfig.from_dict(raw["loss"])
                    if "loss" in raw else SegLossConfig())
        batches = _data_iter(raw.get("data", {}), mode,
                             _global_batch(train_cfg), model_cfg)
        L.run_pretrain_segmentation(train_cfg, model_cfg, batches, loss_cfg)
    elif mode == "pretrain_image":
        model_cfg = (VQModelConfig.from_dict(raw["model"])
                     if "model" in raw else vq_img_config())
        loss_cfg = (VQGANLossConfig.from_dict(raw["loss"])
                    if "loss" in raw else VQGANLossConfig())
        batches = _data_iter(raw.get("data", {}), mode,
                             _global_batch(train_cfg), model_cfg)
        L.run_pretrain_image(
            train_cfg, model_cfg, batches, loss_cfg,
            lpips_params_path=raw.get("lpips_weights"),
            face_params_path=raw.get("face_weights"))
    elif mode == "train_transformer":
        tcfg = (TransformerConfig.from_dict(raw["transformer"])
                if "transformer" in raw else TransformerConfig())
        data_cfg = raw.get("data", {})
        if data_cfg.get("kind") == "webdataset":
            # pixel shards -> tokens through the two frozen VQ encoders
            # (sections: vq_seg / vq_img = {model: ..., checkpoint: ...})
            from .data.tokenizer import HashWordTokenizer
            from .train.loop import tokenize_batches

            pixel_batches = _data_iter(
                data_cfg, "pretrain_segmentation",
                _global_batch(train_cfg))
            vq_seg, seg_vars = _load_vq(raw["vq_seg"]["model"],
                                        raw["vq_seg"].get("checkpoint"))
            vq_img, img_vars = _load_vq(raw["vq_img"]["model"],
                                        raw["vq_img"].get("checkpoint"))
            tok = HashWordTokenizer(
                vocab_size=tcfg.text_vocab_size - tcfg.text_length,
                text_length=tcfg.text_length)
            batches = tokenize_batches(pixel_batches, vq_seg, seg_vars,
                                       vq_img, img_vars, tok)
        else:
            batches = _data_iter(data_cfg, mode,
                                 _global_batch(train_cfg), tcfg=tcfg)
        L.run_train_transformer(train_cfg, tcfg, batches)
    elif mode == "show":
        model_cfg = (VQModelConfig.from_dict(raw["model"])
                     if "model" in raw else vq_seg_config())
        batches = _data_iter(raw.get("data", {}), "pretrain_segmentation",
                             train_cfg.batch_size, model_cfg)
        paths = L.run_show(train_cfg, model_cfg, batches,
                           n_samples=raw.get("n_samples", 40))
        print("\n".join(paths))
    elif mode == "sample":
        _run_sample(raw, train_cfg)
    elif mode == "eval":
        metrics = _run_eval(raw, train_cfg)
        print(json.dumps(metrics))
    elif mode == "preprocess_dataset":
        from .data.preprocess import run_preprocessor

        run_preprocessor(raw.get("preprocess", {}))
    elif mode == "export":
        print(_run_export(raw, train_cfg))
    else:
        raise ConfigError(f"unknown mode {mode!r}")
    return 0


def run(argv=None) -> int:
    """main() with the reference's failure handling: append the traceback
    to ``error.log`` and re-raise (``/root/reference/train.py:128-134``)."""
    try:
        return main(argv)
    except Exception:
        import traceback

        with open("error.log", "a") as f:
            f.write(traceback.format_exc() + "\n")
        raise


def _run_eval(raw: Dict[str, Any], train_cfg: TrainConfig) -> Dict[str, float]:
    """VQ reconstruction metrics over a dataset (recon L1/MSE/PSNR
    [+LPIPS for RGB models] + codebook usage/perplexity) — the eval loop
    the reference never shipped (SURVEY §6: no benchmarks or eval scripts
    upstream; BASELINE.md sets recon quality as a self-generated target).

    Config: ``model`` (VQModelConfig), ``data``, ``train.checkpoint_dir``
    + ``train.resume=true`` to restore a trained model (random init
    otherwise — useful only for pipeline smoke), ``n_eval_batches``
    (default 8).  LPIPS uses converted torch weights from
    ``lpips_weights`` when given, else a random-init VGG trunk (ranks
    models consistently; not the canonical value).
    """
    from .eval import evaluate_vq_model

    model_cfg = (VQModelConfig.from_dict(raw["model"]) if "model" in raw
                 else vq_seg_config())
    model, variables = _load_vq(raw.get("model", {}),
                                train_cfg.checkpoint_dir
                                if train_cfg.resume else None)
    data_mode = ("pretrain_image" if model_cfg.in_channels == 3
                 else "pretrain_segmentation")
    batches = _data_iter(raw.get("data", {}), data_mode,
                         train_cfg.batch_size, model_cfg)
    lpips_apply = None
    if model_cfg.in_channels == 3:
        import jax
        import jax.numpy as jnp

        from .losses.lpips import LPIPS, load_lpips_params_from_torch

        lpips = LPIPS()
        if raw.get("lpips_weights"):
            lpips_vars = {"params": load_lpips_params_from_torch(
                raw["lpips_weights"])}
        else:
            dummy = jnp.zeros((1, model_cfg.resolution,
                               model_cfg.resolution, 3), jnp.float32)
            lpips_vars = lpips.init(jax.random.PRNGKey(1), dummy, dummy)
        lpips_apply = jax.jit(
            lambda a, b: jnp.mean(lpips.apply(lpips_vars, a, b)))
    return evaluate_vq_model(model, variables, batches,
                             n_batches=raw.get("n_eval_batches", 8),
                             lpips_apply=lpips_apply)


def _run_export(raw: Dict[str, Any], train_cfg: TrainConfig) -> str:
    """Trained checkpoint -> reference-layout torch ``.pt`` (the return
    leg of MIGRATION.md §3; inverse of the ``torch_import`` converters).

    Config: ``output`` (path, default ``exported.pt``) plus EITHER a
    ``transformer`` section (+ optional ``transformer_checkpoint``) OR a
    ``model`` section (+ optional ``checkpoint``) — random-init export
    without a checkpoint is allowed for layout smoke tests.
    """
    import jax
    import jax.numpy as jnp

    from .utils.torch_export import (export_transformer_state,
                                     export_vqbase_state,
                                     save_torch_checkpoint)

    out = raw.get("output", "exported.pt")
    if "transformer" in raw:
        from .models.transformer import MakeAScene, unstack_layer_params
        from .utils.checkpoint import restore_variables

        tcfg = TransformerConfig.from_dict(raw["transformer"])
        if raw.get("transformer_checkpoint"):
            # params-only restore: no optimizer template, so checkpoints
            # from any accumulate_grad setting load
            params = restore_variables(
                raw["transformer_checkpoint"])["params"]
        else:
            transformer = MakeAScene(tcfg)
            params = transformer.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, tcfg.text_length), jnp.int32),
                jnp.zeros((1, tcfg.seg_length), jnp.int32),
                jnp.zeros((1, tcfg.image_length), jnp.int32))["params"]
        if tcfg.scan_layers:
            # checkpoints under scan_layers hold the stacked tree
            params = unstack_layer_params(dict(params), tcfg.num_layers)
        state = export_transformer_state({"params": params}, tcfg)
    elif "model" in raw:
        vq, vvars = _load_vq(raw["model"], raw.get("checkpoint"))
        state = export_vqbase_state(vvars, vq.cfg)
    else:
        raise ConfigError(
            "export mode needs a 'transformer' or 'model' section")
    # rank-0 only: torch.save has no multi-host coordination (orbax does),
    # so concurrent writers on a shared filesystem would corrupt the .pt
    if jax.process_index() == 0:
        save_torch_checkpoint(out, state)
    return out


def _run_sample(raw: Dict[str, Any], train_cfg: TrainConfig) -> None:
    """text+seg -> image sampling (the script the reference lacks)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .models.sampler import sample_images
    from .models.transformer import MakeAScene
    from .utils.logging import make_grid, save_image
    from .data.tokenizer import HashWordTokenizer

    tcfg = TransformerConfig.from_dict(raw["transformer"])
    # scan_layers is a training-path option; prefill/decode run the
    # unrolled graph, so sample from the unrolled config and convert a
    # scan-trained (stacked) checkpoint tree below
    sample_cfg = (tcfg.replace(scan_layers=False) if tcfg.scan_layers
                  else tcfg)
    transformer = MakeAScene(sample_cfg)
    rng = jax.random.PRNGKey(train_cfg.seed)
    captions = raw.get("captions") or []
    b = len(captions) or train_cfg.batch_size
    if captions:
        tok = HashWordTokenizer(
            vocab_size=tcfg.text_vocab_size - tcfg.text_length,
            text_length=tcfg.text_length)
        text = jnp.asarray(tok(captions))
    else:
        # no captions => all-pad text = unconditional sampling (exactly
        # the CFG-dropout distribution the model trained on)
        text = jnp.zeros((b, tcfg.text_length), jnp.int32)
    if raw.get("seg_tokens_file"):
        seg_np = np.load(raw["seg_tokens_file"])
        if hasattr(seg_np, "files"):
            seg_np = seg_np[seg_np.files[0]]
        seg = jnp.asarray(
            np.asarray(seg_np).reshape(b, tcfg.seg_length), jnp.int32)
    else:
        seg = jnp.zeros((b, tcfg.seg_length), jnp.int32)
    init_vars = transformer.init(
        rng, text, seg, jnp.zeros((b, tcfg.image_length), jnp.int32))
    tvars = {"params": init_vars["params"]}
    if raw.get("transformer_checkpoint"):
        # params-only restore (no optimizer template: inference doesn't
        # know the run's accumulate_grad, which changes the opt_state
        # structure).  A scan_layers run saved the STACKED tree — unstack
        # it for the unrolled serving graph.
        from .models.transformer import unstack_layer_params
        from .utils.checkpoint import restore_variables

        params = restore_variables(raw["transformer_checkpoint"])["params"]
        if tcfg.scan_layers:
            params = unstack_layer_params(dict(params), tcfg.num_layers)
        tvars = {"params": params}
    vq, vvars = _load_vq(raw["model"], raw.get("vq_checkpoint"))
    imgs = sample_images(transformer, tvars, vq, vvars, text, seg, rng,
                         guidance_scale=raw.get("guidance_scale", 3.0),
                         temperature=raw.get("temperature", 1.0),
                         top_k=raw.get("top_k", 0))
    out = raw.get("output", "samples.jpg")
    save_image(make_grid(np.clip(np.asarray(imgs), 0, 1)), out)
    print(out)


if __name__ == "__main__":
    sys.exit(run())
