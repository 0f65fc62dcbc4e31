"""Training-loop orchestration for the three stages + eval/sampling drivers.

Rebuilds the reference ``train.py`` mode dispatch (``/root/reference/
train.py:18-225``) the TPU way: one process per *host* (not per chip),
global-view SPMD over a ``Mesh``; gradient sync is XLA's problem.  Each
``run_*`` function wires config -> mesh -> model -> state -> jitted step ->
loop, with rank-0 logging (scalars + periodic image grids), periodic orbax
checkpoints and resume (including the codebook phase counter, reference
``train.py:69-76``).

Data enters as an iterator of host numpy batches (``mas_tpu.data``); batches
are placed batch-sharded over the data axis via ``shard_batch``.
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..losses.discriminator import PatchDiscriminator
from ..losses.face_loss import FaceNet
from ..losses.lpips import LPIPS
from ..models.transformer import MakeAScene
from ..models.vqvae import VQModel
from ..parallel.mesh import make_mesh, shard_batch
from ..utils.checkpoint import (latest_step, restore_checkpoint,
                                save_checkpoint)
from ..utils.config import (SegLossConfig, TrainConfig, TransformerConfig,
                            VQGANLossConfig, VQModelConfig)
from ..utils.logging import Logger, Visualizer
from .state import (TransformerTrainState, create_vq_train_state, make_adam)
from .steps import (make_img_train_step, make_seg_eval_step,
                    make_seg_train_step, make_transformer_train_step)


def _maybe_resume(cfg: TrainConfig, state):
    if cfg.resume and latest_step(cfg.checkpoint_dir) is not None:
        state = restore_checkpoint(cfg.checkpoint_dir, state)
        print(f"resumed from step {int(state.step)}")
    return state


def _loop(cfg: TrainConfig, state, step_fn: Callable, batches: Iterable,
          mesh, logger: Logger, to_step_args: Callable,
          image_fn: Optional[Callable] = None):
    """Shared train loop: shard batch, step, log, checkpoint."""
    # fold the resume step into the key so a resumed run does NOT replay
    # the original run's random stream (reservoir sampling, CFG dropout)
    start = int(state.step)
    if start >= cfg.total_steps:
        # fully-trained resume (e.g. eval-only re-run after a lost eval):
        # return before pulling a batch — the first next() on a tokenizing
        # generator would otherwise re-tokenize the whole train pool
        print(f"resume at step {start} >= total_steps {cfg.total_steps}; "
              "skipping train loop")
        return state
    rng = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), start)
    t0 = time.time()
    for i, batch in enumerate(batches):
        step_no = start + i
        if step_no >= cfg.total_steps:
            break
        rng, key = jax.random.split(rng)
        with jax.profiler.TraceAnnotation("host_batch_prep"):
            arrays = {k: np.asarray(v) for k, v in batch.items()
                      if not isinstance(v, list)}
            n_data = mesh.shape["data"]
            b = next(iter(arrays.values())).shape[0]
            # b is per-PROCESS; the global batch must tile the data axis
            if (b * jax.process_count()) % n_data == 0:
                sharded = shard_batch(mesh, arrays)
            elif cfg.allow_replicated_batch:
                # tiny-test escape hatch: replicate (opt-in via config)
                sharded = {k: jax.device_put(v) for k, v in arrays.items()}
            else:
                raise ValueError(
                    f"global batch {b * jax.process_count()} (host batch {b}"
                    f" x {jax.process_count()} processes) does not tile the "
                    f"data axis ({n_data}); fix batch_size/mesh, or set "
                    f"train.allow_replicated_batch=true for tiny tests")
        with jax.profiler.StepTraceAnnotation("train_step", step_num=step_no):
            state, metrics = step_fn(state, *to_step_args(sharded), key)
        if (step_no + 1) % cfg.log_period == 0:
            host = {k: float(np.asarray(v)) for k, v in metrics.items()}
            rate = cfg.log_period / max(time.time() - t0, 1e-9)
            t0 = time.time()
            logger.log(step=step_no + 1, steps_per_sec=np.float32(rate),
                       **{k: np.float32(v) for k, v in host.items()})
            if image_fn is not None:
                # host-local arrays: sharded global arrays are not fully
                # addressable on multi-host, so grids render from the
                # process-local rows
                image_fn(step_no + 1, state, arrays)
        if (step_no + 1) % cfg.save_period == 0 or \
                (step_no + 1) == cfg.total_steps:
            save_checkpoint(cfg.checkpoint_dir, state, step_no + 1)
    # the data iterator may exhaust before total_steps (finite dataset):
    # persist whatever progress the last save_period boundary missed
    final = int(state.step)
    if final > start and latest_step(cfg.checkpoint_dir) != final:
        save_checkpoint(cfg.checkpoint_dir, state, final)
    return state


def run_pretrain_segmentation(train_cfg: TrainConfig,
                              model_cfg: VQModelConfig,
                              batches: Iterable[Dict[str, np.ndarray]],
                              loss_cfg: SegLossConfig = SegLossConfig(),
                              logger: Optional[Logger] = None):
    """VQ-SEG stage (reference ``train.py:18-58``).

    Batches carry either a dense ``mask`` [B, H, W, 159] or a compact
    ``seg_packed`` int16 [B, H, W, 4] (``segmap.pack_seg_labels``)
    expanded to the one-hot on device inside the jitted step — 80x less
    host->device traffic, which decides throughput on thin-transfer
    hosts."""
    mesh = make_mesh(train_cfg.mesh)
    model = VQModel(model_cfg)
    # reference seg loop accumulates at the UNDIVIDED lr (train.py:51-53;
    # only pretrain_image rescales) — see make_adam
    tx = make_adam(train_cfg.optimizer, rescale_lr=False)
    state = create_vq_train_state(model, model_cfg, tx,
                                  jax.random.PRNGKey(train_cfg.seed))
    state = _maybe_resume(train_cfg, state)
    batches = iter(batches)
    first = next(batches, None)
    packed = first is not None and "seg_packed" in first
    key = "seg_packed" if packed else "mask"
    step = make_seg_train_step(model, tx, loss_cfg,
                               from_packed_labels=packed)
    logger = logger or Logger(process_index=jax.process_index())
    recon_fn = jax.jit(
        lambda p, bs, x, quantize: model.apply(
            {"params": p, "batch_stats": bs}, x, quantize=quantize,
            method=VQModel.reconstruct),
        static_argnames=("quantize",))
    viz = Visualizer()

    def image_fn(step_no, st, batch):
        # input ‖ reconstruction grids (reference logs every 500 steps,
        # log_utils.py:24); seg tensors colorized per group.  During the
        # codebook bootstrap window (counter < q_init) training passes
        # latents THROUGH (codebook.quantize_train) — the reference logs
        # that train-forward recon (train.py:43-47), so quantizing here
        # against the untrained codebook would log garbage grids.
        if step_no % logger.image_period:
            return
        if packed:
            from ..data.segmap import one_hot_seg_packed
            seg = np.asarray(one_hot_seg_packed(batch["seg_packed"][:4]))
        else:
            seg = batch["mask"][:4]
        quantize = int(st.vq_state.counter) >= model_cfg.codebook.q_init
        recon = recon_fn(st.params, st.batch_stats, seg, quantize=quantize)
        logger.log(step=step_no,
                   img=viz.colorize(np.asarray(seg))["panoptic"],
                   img_rec=viz.colorize(np.asarray(recon),
                                        logits=True)["panoptic"])

    # itertools.chain (NOT a `yield from` wrapper): closing a generator
    # that delegates with `yield from` would close the caller's shared
    # iterator when this wrapper is GC'd after the loop breaks early
    import itertools
    rest = (itertools.chain([first], batches) if first is not None
            else batches)

    with jax.set_mesh(mesh):
        state = _loop(train_cfg, state, step, rest, mesh, logger,
                      to_step_args=lambda b: (b[key],),
                      image_fn=image_fn)
    return state


def run_pretrain_image(train_cfg: TrainConfig, model_cfg: VQModelConfig,
                       batches: Iterable[Dict[str, np.ndarray]],
                       loss_cfg: VQGANLossConfig = VQGANLossConfig(),
                       lpips_params_path: Optional[str] = None,
                       face_params_path: Optional[str] = None,
                       logger: Optional[Logger] = None):
    """VQ-IMG / VQGAN stage (reference ``train.py:60-134``)."""
    mesh = make_mesh(train_cfg.mesh)
    model = VQModel(model_cfg)
    disc = PatchDiscriminator()
    lpips = LPIPS()
    face = FaceNet() if loss_cfg.face_loss else None

    rng = jax.random.PRNGKey(train_cfg.seed)
    tx = make_adam(train_cfg.optimizer)
    disc_tx = make_adam(train_cfg.disc_optimizer)
    state = create_vq_train_state(model, model_cfg, tx, rng,
                                  disc_model=disc, disc_tx=disc_tx)
    state = _maybe_resume(train_cfg, state)

    res = model_cfg.resolution
    dummy = jnp.zeros((1, res, res, 3), jnp.float32)
    if lpips_params_path:
        from ..losses.lpips import load_lpips_params_from_torch
        lpips_vars = {"params": load_lpips_params_from_torch(
            lpips_params_path)}
    else:
        lpips_vars = lpips.init(jax.random.PRNGKey(1), dummy, dummy)
    frozen = {"lpips": lpips_vars}
    if face is not None:
        if face_params_path:
            from ..losses.face_loss import load_face_params_from_torch
            frozen["face"] = load_face_params_from_torch(face_params_path)
        else:
            frozen["face"] = face.init(
                jax.random.PRNGKey(2),
                jnp.zeros((1, 254, 254, 3), jnp.float32), train=False)

    step = make_img_train_step(model, disc, tx, disc_tx, loss_cfg, lpips,
                               face_model=face)
    logger = logger or Logger(process_index=jax.process_index())

    _recon = jax.jit(
        lambda p, bs, x, quantize: model.apply(
            {"params": p, "batch_stats": bs}, x, quantize=quantize,
            method=VQModel.reconstruct),
        static_argnames=("quantize",))

    def image_fn(step_no, st, batch):
        if step_no % logger.image_period:
            return
        from .steps import to_float_image
        images = to_float_image(batch["image"][:4])
        # mirror the train forward during the codebook bootstrap window
        # (pass-through; see run_pretrain_segmentation.image_fn)
        quantize = int(st.vq_state.counter) >= model_cfg.codebook.q_init
        recon = _recon(st.params, st.batch_stats, images, quantize=quantize)
        logger.log(step=step_no, img=np.asarray(images),
                   img_rec=np.clip(np.asarray(recon), 0.0, 1.0))

    with jax.set_mesh(mesh):
        state = _loop(
            train_cfg, state,
            lambda s, b, k: step(s, b, frozen, k),
            batches, mesh, logger, to_step_args=lambda b: (b,),
            image_fn=image_fn)
    return state


def run_train_transformer(train_cfg: TrainConfig, tcfg: TransformerConfig,
                          batches: Iterable[Dict[str, np.ndarray]],
                          logger: Optional[Logger] = None):
    """Stage-2 AR transformer training (reference ``train.py:136-173``);
    batches carry pre-extracted (text, seg, image) tokens — tokenize with
    ``tokenize_batches`` when starting from pixels."""
    mesh = make_mesh(train_cfg.mesh)
    model = MakeAScene(tcfg)
    # reference transformer loop accumulates at the UNDIVIDED lr
    # (train.py:153-156) — see make_adam
    tx = make_adam(train_cfg.optimizer, rescale_lr=False)
    rng = jax.random.PRNGKey(train_cfg.seed)
    text = jnp.zeros((1, tcfg.text_length), jnp.int32)
    seg = jnp.zeros((1, tcfg.seg_length), jnp.int32)
    img = jnp.zeros((1, tcfg.image_length), jnp.int32)
    variables = model.init(rng, text, seg, img)
    state = TransformerTrainState(step=jnp.zeros((), jnp.int32),
                                  params=variables["params"],
                                  opt_state=tx.init(variables["params"]))
    state = _maybe_resume(train_cfg, state)
    step = make_transformer_train_step(model, tx, uncond_p=train_cfg.uncond_p,
                                       start_uncond=train_cfg.start_uncond)
    logger = logger or Logger(process_index=jax.process_index())

    with jax.set_mesh(mesh):
        state = _loop(train_cfg, state, step, batches, mesh, logger,
                      to_step_args=lambda b: (b["text"], b["seg"],
                                              b["image"]))
    return state


def tokenize_batches(pixel_batches: Iterable[Dict[str, np.ndarray]],
                     vq_seg: VQModel, seg_vars, vq_img: VQModel, img_vars,
                     text_tokenizer: Callable[[list], np.ndarray]):
    """Pixels+captions -> (text, seg, image) token batches using the two
    frozen VQ encoders (the reference repo never shipped this glue —
    SURVEY §3.3 notes tokens are 'expected pre-extracted')."""
    from .steps import to_float_image
    seg_enc = jax.jit(lambda v, x: vq_seg.apply(v, x,
                                                method=VQModel.encode_tokens))
    img_enc = jax.jit(lambda v, x: vq_img.apply(v, to_float_image(x),
                                                method=VQModel.encode_tokens))
    for batch in pixel_batches:
        seg_t = np.asarray(seg_enc(seg_vars, batch["mask"]))
        img_t = np.asarray(img_enc(img_vars, batch["image"]))
        b = seg_t.shape[0]
        yield {
            "text": text_tokenizer(batch.get("caption", [""] * b)),
            "seg": seg_t.reshape(b, -1).astype(np.int32),
            "image": img_t.reshape(b, -1).astype(np.int32),
        }


def run_show(train_cfg: TrainConfig, model_cfg: VQModelConfig,
             batches: Iterable[Dict[str, np.ndarray]], n_samples: int = 40,
             out_dir: str = "results"):
    """VQ-SEG visual eval (reference ``train.py:175-197``): load latest
    checkpoint, reconstruct, save colorized grids."""
    model = VQModel(model_cfg)
    tx = make_adam(train_cfg.optimizer)
    state = create_vq_train_state(model, model_cfg, tx,
                                  jax.random.PRNGKey(0))
    state = _maybe_resume(train_cfg.replace(resume=True), state)
    eval_step = make_seg_eval_step(model)
    viz = Visualizer(out_dir)
    done = 0
    paths = []
    for batch in batches:
        seg = jnp.asarray(batch["mask"])
        recon, _ = eval_step(state.params, state.batch_stats, seg)
        rgb = batch.get("image")
        if rgb is None:
            rgb = np.zeros(seg.shape[:3] + (3,), np.float32)
        paths.append(viz(done, image=np.asarray(rgb), seg=np.asarray(seg),
                         seg_rec=np.asarray(recon)))
        done += seg.shape[0]
        if done >= n_samples:
            break
    return paths
