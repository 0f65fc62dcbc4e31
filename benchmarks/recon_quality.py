"""Measured reconstruction / end-to-end quality (the BASELINE.md targets).

Round 1 shipped the eval tooling (``mas_tpu/eval.py``) but never recorded a
quality number; this script produces them by training the full 3-stage
pipeline ON CHIP over structured synthetic scenes
(``mas_tpu.data.dataset.StructuredSceneBatches`` — compressible, aligned
image/seg pairs; no real dataset or pretrained annotators exist in this
zero-egress image) and measuring:

  stage seg : VQ-SEG recon (argmax pixel accuracy per channel group, BCE,
              codebook health) + colorized grids into results/
  stage img : VQ-IMG recon (L1 / PSNR / LPIPS) + recon-FID over VGG
              features + input-vs-recon grids into results/
  stage ar  : transformer trained on tokens from the two frozen VQ stages
              (scene-statistic text tokens give CFG real conditioning),
              then guided sampling under compute/int8/int4 KV caches:
              token agreement + decoded-sample L1/LPIPS deltas + sample
              FID vs real scenes + sample grids — the trained-weights
              KV-quantization evidence VERDICT r1 asked for.

Run:  python benchmarks/recon_quality.py [seg|img|ar|all]
        [--res 256|512] [--pool N] [--batch B] [--steps-seg N]
        [--steps-img N] [--steps-ar N] [--ar-eval-prompts N]
(real TPU; ~40 min for the default demonstration schedule, ~3 h for the
round-3 competence schedule: --pool 16384 --steps-seg 12000
--steps-img 12000 --steps-ar 20000 --ar-eval-prompts 128).
Metrics accumulate into results/recon_quality.json (keys suffixed _512
at --res 512 so both resolutions coexist).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mas_tpu.data.dataset import StructuredSceneBatches
from mas_tpu.utils.config import (CodebookConfig, OptimizerConfig,
                                  TrainConfig, TransformerConfig,
                                  VQGANLossConfig, vq_img_config,
                                  vq_seg_config)

RESULTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "results")
CKPT = "/tmp/recon_q"
SEG_CKPT_256 = "/tmp/recon_q"   # where a 512² run finds the 256² seg stage
RES = 256
BATCH = 8
# scene-pool disk cache: user-owned dir (never a world-writable /tmp path
# — ADVICE r4) holding versioned .npy pool directories; override with
# MAS_POOL_CACHE for shared/pregenerated pools
POOL_CACHE_DIR = os.environ.get(
    "MAS_POOL_CACHE", os.path.expanduser("~/.cache/mas_tpu/scene_pool"))


def grid_path(name: str) -> str:
    """Per-resolution artifact name so a 512² run can't overwrite the
    256² evidence grids (metrics are suffixed the same way in record())."""
    suffix = "" if RES == 256 else f"_{RES}"
    return os.path.join(RESULTS, f"{name}{suffix}.png")

# fast-convergence optimizer for the demonstration runs (the reference's
# production lr of 4.5e-6 needs millions of steps; capability != schedule)
OPT = OptimizerConfig(lr=2e-4, beta1=0.5, beta2=0.9)


def record(stage: str, metrics: dict) -> None:
    os.makedirs(RESULTS, exist_ok=True)
    path = os.path.join(RESULTS, "recon_quality.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    if RES != 256:
        stage = f"{stage}_{RES}"
    data[stage] = {k: (float(v) if not isinstance(v, (list, str)) else v)
                   for k, v in metrics.items()}
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print(f"[{stage}] {json.dumps(data[stage])}", flush=True)


TRAIN_CACHE = 512   # pre-generated scene pool for the training streams

# VQ-SEG is a fixed 256² pipeline regardless of --res: the reference
# tokenizes 256² seg maps into 16² tokens even for 512² images (the AR
# geometry keeps seg_tokens_per_dim=16 at both image resolutions), so
# the 512² run reuses the 256² seg checkpoint and nearest-subsamples the
# aligned label maps for conditioning (exact for labels).
SEG_RES = 256


def sub_seg(packed):
    """Packed int16 label map [B, r, r, 4] -> SEG_RES² by nearest."""
    f = RES // SEG_RES
    assert f >= 1 and RES % SEG_RES == 0, (RES, SEG_RES)
    return packed if f == 1 else packed[:, ::f, ::f]


def train_scenes(seed=0, compact=False, batch=None, res=None,
                 image_u8=False):
    """Cached + prefetched scene stream (fresh generation starves the
    chip: 8.4 s/batch at 256² vs 160 ms steps; compact=True additionally
    ships packed int16 labels instead of the 41 MB/sample one-hot —
    host->device transfer through the tunnel starved the chip too;
    image_u8=True ships uint8 RGB, 4x less upload: the axon client leaks
    every staging buffer, and the competence schedules upload for hours)."""
    from mas_tpu.data.prefetch import prefetch
    return prefetch(StructuredSceneBatches(batch or BATCH, res or RES,
                                           seed=seed,
                                           cache_scenes=TRAIN_CACHE,
                                           compact=compact,
                                           image_u8=image_u8,
                                           # persist the generated pool:
                                           # 512²×4096 costs 40+ CPU-min
                                           # (tail-9 postmortem) and every
                                           # stage/retry repaid it
                                           pool_cache_dir=POOL_CACHE_DIR),
                    size=4)


def seg_batches(seed=0):
    for b in train_scenes(seed=seed, compact=True, res=SEG_RES):
        yield {"seg_packed": b["seg_packed"]}


def train_cfg(name: str, steps: int, **kw) -> TrainConfig:
    kw.setdefault("batch_size", BATCH)
    return TrainConfig(total_steps=steps, log_period=200,
                       save_period=steps, optimizer=OPT, disc_optimizer=OPT,
                       checkpoint_dir=os.path.join(CKPT, name), **kw)


SEG_INIT_STEPS = 200


def seg_model_cfg():
    # init_steps sets the whole phase schedule (CodebookConfig): k-means
    # re-inits run every init_steps//2 until 30*init_steps and then STOP —
    # at the round-3 value (200) the last re-init fired at step 6000 of a
    # 12000-step run and half the codebook was dead by eval.  The
    # competence schedule passes --seg-init-steps 400 so the re-init
    # window covers the full run (matching the reference's proportions:
    # its 6M-step schedule uses init_steps=2000, conf/seg_config.yaml).
    return vq_seg_config(
        compute_dtype="bfloat16",
        codebook=CodebookConfig(codebook_size=1024,
                                init_steps=SEG_INIT_STEPS,
                                reservoir_size=50_000))


def img_model_cfg():
    # attention at the 16x-reduced bottleneck (256 -> 16^2, 512 -> 32^2)
    return vq_img_config(
        resolution=RES, attn_resolutions=(RES // 16,),
        compute_dtype="bfloat16",
        codebook=CodebookConfig(codebook_size=8192, init_steps=200,
                                reservoir_size=50_000))


def stage_seg(steps: int = 3000):
    from mas_tpu.eval import codebook_stats
    from mas_tpu.models.vqvae import VQModel
    from mas_tpu.train.loop import run_pretrain_segmentation
    from mas_tpu.utils.logging import Visualizer

    mcfg = seg_model_cfg()
    t0 = time.time()
    state = run_pretrain_segmentation(
        train_cfg("seg", steps, mode="pretrain_segmentation"), mcfg,
        seg_batches(seed=0))
    train_s = time.time() - t0

    model = VQModel(mcfg)

    from mas_tpu.data.segmap import one_hot_seg_packed

    @jax.jit
    def eval_step(params, stats, packed):
        seg = one_hot_seg_packed(packed)
        recon, _ = model.apply({"params": params, "batch_stats": stats}, seg)
        toks = model.apply({"params": params, "batch_stats": stats}, seg,
                           method=VQModel.encode_tokens)
        return seg, recon, toks

    # held-out scenes (fresh seed).  Argmax accuracy is measured per
    # channel group over ACTIVE pixels only (any gt channel set): the
    # human-parts [133,153) and face [153,158) groups are all-zero on most
    # pixels — there argmax(gt)=0 by convention while the (correctly)
    # all-negative recon logits argmax on noise, so the unmasked metric of
    # rounds 2-3 mixed a ~1/20 coin flip over ~85% of the image into the
    # mean (the reported 47.3%/55.3% were metric artifacts, not recon
    # quality).  The unmasked mean is kept for cross-round continuity.
    GROUPS = {"panoptic": slice(0, 133), "human": slice(133, 153),
              "face": slice(153, 158)}
    correct = {g: 0.0 for g in GROUPS}
    active = {g: 0.0 for g in GROUPS}
    unmasked, bces, all_toks = [], [], []
    viz = Visualizer(RESULTS)
    for i, batch in enumerate(seg_batches(seed=999)):
        if i >= 8:
            break
        seg, recon, toks = eval_step(state.params, state.batch_stats,
                                     jnp.asarray(batch["seg_packed"]))
        all_toks.append(np.asarray(toks))
        for g, sl in GROUPS.items():
            hit = jnp.argmax(recon[..., sl], -1) == jnp.argmax(seg[..., sl],
                                                               -1)
            mask = jnp.sum(seg[..., sl], -1) > 0
            correct[g] += float(jnp.sum(hit & mask))
            active[g] += float(jnp.sum(mask))
            if g != "face":   # the historical unmasked pan+human mean
                unmasked.append(float(jnp.mean(hit)))
        p = jax.nn.log_sigmoid(recon)
        q = jax.nn.log_sigmoid(-recon)
        bces.append(float(-jnp.mean(seg * p + (1 - seg) * q)))
        if i == 0:
            viz(0, image=np.zeros(seg.shape[:3] + (3,), np.float32),
                seg=np.asarray(seg), seg_rec=np.asarray(recon))
    cb = codebook_stats(jnp.asarray(np.concatenate(all_toks).ravel()),
                        mcfg.codebook.codebook_size)
    accs = {f"argmax_acc_{g}": correct[g] / max(active[g], 1.0)
            for g in GROUPS}
    record("seg", dict(
        steps=steps, train_seconds=train_s, init_steps=SEG_INIT_STEPS,
        argmax_accuracy=float(np.mean(list(accs.values()))), **accs,
        argmax_accuracy_unmasked=float(np.mean(unmasked)),
        bce=float(np.mean(bces)),
        codebook_perplexity=float(cb["perplexity"]),
        codebook_used_fraction=float(cb["used_fraction"])))


def stage_img(steps: int = 3000, disc_start: int = 2000):
    from mas_tpu.eval import (FIDAccumulator, lpips_feature_fn,
                              recon_metrics, codebook_stats)
    from mas_tpu.losses.lpips import LPIPS
    from mas_tpu.models.vqvae import VQModel
    from mas_tpu.train.loop import run_pretrain_image
    from mas_tpu.utils.logging import make_grid, save_image

    mcfg = img_model_cfg()
    lcfg = VQGANLossConfig(disc_start=disc_start)
    t0 = time.time()
    def img_batches():
        # strip the seg labels: the VQGAN step consumes image + boxes only
        # (uint8 images — the step converts on device, steps.to_float_image)
        for b in train_scenes(seed=0, compact=True, image_u8=True):
            yield {k: b[k] for k in ("image", "bbox_obj", "bbox_face")}

    state = run_pretrain_image(
        train_cfg("img", steps, mode="pretrain_image"), mcfg,
        img_batches(), loss_cfg=lcfg)
    train_s = time.time() - t0

    model = VQModel(mcfg)
    lpips = LPIPS()
    dummy = jnp.zeros((1, RES, RES, 3), jnp.float32)
    lpips_vars = lpips.init(jax.random.PRNGKey(1), dummy, dummy)
    lpips_apply = jax.jit(lambda a, b: lpips.apply(lpips_vars, a, b))

    @jax.jit
    def eval_step(params, stats, images):
        recon, _ = model.apply({"params": params, "batch_stats": stats},
                               images)
        toks = model.apply({"params": params, "batch_stats": stats},
                           images, method=VQModel.encode_tokens)
        return recon, toks

    feat = lpips_feature_fn(lpips, lpips_vars)
    fid_real, fid_rec = FIDAccumulator(feat), FIDAccumulator(feat)
    agg, all_toks = {}, []
    for i, batch in enumerate(StructuredSceneBatches(BATCH, RES, seed=999,
                                                     compact=True)):
        if i >= 16:
            break
        images = jnp.asarray(batch["image"])
        recon, toks = eval_step(state.params, state.batch_stats, images)
        recon = jnp.clip(recon, 0.0, 1.0)
        all_toks.append(np.asarray(toks))
        m = recon_metrics(images, recon, lpips_apply)
        for k, v in m.items():
            agg.setdefault(k, []).append(float(v))
        fid_real.update(images)
        fid_rec.update(recon)
        if i == 0:
            pair = np.concatenate([np.asarray(images[:4]),
                                   np.asarray(recon[:4])])
            save_image(make_grid(pair, nrow=4),
                       grid_path("vqimg_recon_grid"))
    cb = codebook_stats(jnp.asarray(np.concatenate(all_toks).ravel()),
                        mcfg.codebook.codebook_size)
    record("img", dict(
        steps=steps, train_seconds=train_s,
        **{k: float(np.mean(v)) for k, v in agg.items()},
        recon_fid_vgg=fid_real.fid(fid_rec),
        codebook_perplexity=float(cb["perplexity"]),
        codebook_used_fraction=float(cb["used_fraction"])))


# ---------------------------------------------------------------------------
# stage 3: AR transformer end-to-end
# ---------------------------------------------------------------------------

TEXT_LEN = 16
AR_BATCH = 32     # --ar-batch: train/eval batch.  32 fits the 256^2 AR
                  # geometry (784 tokens); the 512^2 run (1296 tokens)
                  # OOMs the train step at 32 (r4 tail-9 log) — use 8.
TOK_BATCH = 32    # scene->token encode batch (fwd only, never OOMs)


AR_KV_HEADS = 0   # --ar-kv-heads: GQA quality row (0 = MHA)
AR_RESUME = False  # --ar-resume: eval-only recovery of a lost AR eval


def ar_cfg() -> TransformerConfig:
    return TransformerConfig(
        num_layers=8, hidden_dim=512, num_attn_heads=8,
        image_vocab_size=8192, seg_vocab_size=1024,
        text_vocab_size=64 + TEXT_LEN, image_tokens_per_dim=RES // 16,
        seg_tokens_per_dim=16, text_length=TEXT_LEN,
        compute_dtype="bfloat16", num_kv_heads=AR_KV_HEADS)


def scene_text_tokens(batch) -> np.ndarray:
    """Scene-statistic 'captions': real conditioning signal for CFG.
    Token 1..: number of things (+1 offset so 0 stays the pad/uncond id),
    horizon bucket, mean-color buckets."""
    imgs = batch["image"]
    boxes = batch["bbox_obj"]
    b = imgs.shape[0]
    scale = 1.0 / 255.0 if imgs.dtype == np.uint8 else 1.0
    text = np.zeros((b, TEXT_LEN), np.int32)
    n_things = (boxes.sum(-1) > 0).sum(-1)
    text[:, 0] = 1 + n_things
    text[:, 1] = 1 + (imgs[:, :, :, 1].mean((1, 2)) * scale
                      * 30).astype(np.int32)
    text[:, 2] = 1 + (imgs[:, :, :, 0].mean((1, 2)) * scale
                      * 30).astype(np.int32)
    return text


def restore_vq(name: str, mcfg, with_disc: bool = False):
    from mas_tpu.losses.discriminator import PatchDiscriminator
    from mas_tpu.models.vqvae import VQModel
    from mas_tpu.train.loop import _maybe_resume
    from mas_tpu.train.state import create_vq_train_state, make_adam

    model = VQModel(mcfg)
    # the saved pytree must match: the img stage's checkpoint carries the
    # discriminator + its optimizer state
    disc = PatchDiscriminator() if with_disc else None
    state = create_vq_train_state(model, mcfg, make_adam(OPT),
                                  jax.random.PRNGKey(0), disc_model=disc,
                                  disc_tx=make_adam(OPT) if with_disc
                                  else None)
    cfg1 = train_cfg(name, 1, mode="pretrain_segmentation")
    if name == "seg" and RES != SEG_RES:
        # the seg pipeline is 256²-only; 512² runs reuse its checkpoint
        cfg1 = cfg1.replace(
            checkpoint_dir=os.path.join(SEG_CKPT_256, "seg"))
    state = _maybe_resume(
        cfg1.replace(resume=True),
        state)
    assert int(state.step) > 0, f"train stage '{name}' first"
    return model, {"params": state.params, "batch_stats": state.batch_stats}


def stage_ar(steps: int = 4000):
    from mas_tpu.eval import FIDAccumulator, lpips_feature_fn
    from mas_tpu.losses.lpips import LPIPS
    from mas_tpu.models.sampler import sample_tokens
    from mas_tpu.models.transformer import MakeAScene
    from mas_tpu.models.vqvae import VQModel
    from mas_tpu.train.loop import run_train_transformer
    from mas_tpu.utils.logging import make_grid, save_image

    tcfg = ar_cfg()
    from mas_tpu.data.segmap import one_hot_seg_packed

    seg_model, seg_vars = restore_vq("seg", seg_model_cfg())
    img_model, img_vars = restore_vq("img", img_model_cfg(), with_disc=True)
    # packed labels -> on-device one-hot -> tokens (ships 0.5 MB/sample,
    # not the 41 MB one-hot)
    from mas_tpu.train.steps import to_float_image
    seg_enc = jax.jit(lambda p: seg_model.apply(
        seg_vars, one_hot_seg_packed(p), method=VQModel.encode_tokens))
    img_enc = jax.jit(lambda x: img_model.apply(
        img_vars, to_float_image(x), method=VQModel.encode_tokens))
    img_dec = jax.jit(lambda toks: img_model.apply(
        img_vars, toks, method=VQModel.decode_code))

    def token_batches():
        # tokenize the scene cache ONCE, then cycle token batches: the
        # axon client leaks every host->device staging buffer (measured
        # 25 MB/transfer, never freed — the first attempt re-uploaded
        # images+labels every step and was host-OOM-killed at 130 GB).
        # Per-step uploads drop to ~68 KB of token ids.
        src = iter(StructuredSceneBatches(TOK_BATCH, RES, seed=1,
                                          cache_scenes=TRAIN_CACHE,
                                          compact=True, image_u8=True,
                                          pool_cache_dir=POOL_CACHE_DIR))
        texts, segs, imgs = [], [], []
        for _ in range(TRAIN_CACHE // TOK_BATCH):
            batch = next(src)
            texts.append(scene_text_tokens(batch))
            segs.append(np.asarray(seg_enc(jnp.asarray(sub_seg(
                batch["seg_packed"])))).reshape(TOK_BATCH, -1))
            imgs.append(np.asarray(img_enc(jnp.asarray(
                batch["image"]))).reshape(TOK_BATCH, -1))
        texts = np.concatenate(texts)
        segs = np.concatenate(segs).astype(np.int32)
        imgs = np.concatenate(imgs).astype(np.int32)
        rng = np.random.default_rng(17)
        while True:
            idx = rng.permutation(len(texts))
            for s in range(0, len(idx) - AR_BATCH + 1, AR_BATCH):
                j = idx[s:s + AR_BATCH]
                yield {"text": texts[j], "seg": segs[j], "image": imgs[j]}

    # GQA rows train/checkpoint/record under a distinct name: the param
    # shapes differ from the MHA run, so sharing a checkpoint dir would
    # poison resume, and the metrics must not overwrite the MHA row
    ar_name = f"ar_kv{AR_KV_HEADS}" if AR_KV_HEADS else "ar"
    t0 = time.time()
    state = run_train_transformer(
        train_cfg(ar_name, steps, mode="train_transformer",
                  batch_size=AR_BATCH, uncond_p=0.1, resume=AR_RESUME),
        tcfg, token_batches())
    train_s = time.time() - t0
    variables = {"params": state.params}

    # held-out conditioning: AR_EVAL_PROMPTS prompts sampled in AR_BATCH
    # chunks under every cache dtype (>= 128 prompts gives the int4
    # FID-parity claim statistical weight — VERDICT r2 #3)
    n_chunks = max(1, AR_EVAL_PROMPTS // AR_BATCH)
    lpips = LPIPS()
    dummy = jnp.zeros((1, RES, RES, 3), jnp.float32)
    lpips_vars = lpips.init(jax.random.PRNGKey(1), dummy, dummy)
    lpips_apply = jax.jit(lambda a, b: jnp.mean(lpips.apply(lpips_vars, a, b)))
    feat = lpips_feature_fn(lpips, lpips_vars)

    kvs = ("compute", "int8", "int4")
    models = {kv: MakeAScene(tcfg.replace(kv_cache_dtype=kv)) for kv in kvs}
    fid_s = {kv: FIDAccumulator(feat) for kv in kvs}
    fid_real = FIDAccumulator(feat)
    agg = {kv: {"agree": [], "l1": [], "lpips": []} for kv in kvs[1:]}
    grid_rows = None
    for c in range(n_chunks):
        held = next(iter(StructuredSceneBatches(AR_BATCH, RES,
                                                seed=2026 + c,
                                                compact=True)))
        text = jnp.asarray(scene_text_tokens(held))
        seg_t = seg_enc(jnp.asarray(sub_seg(held["seg_packed"]))).reshape(
            AR_BATCH, -1)
        samples = {}
        for kv in kvs:
            toks = sample_tokens(models[kv], variables, text,
                                 seg_t.astype(jnp.int32),
                                 jax.random.PRNGKey(11 + c),
                                 guidance_scale=2.0, temperature=1.0,
                                 top_k=64)
            grid = toks.reshape(-1, tcfg.image_tokens_per_dim,
                                tcfg.image_tokens_per_dim)
            samples[kv] = dict(
                tokens=np.asarray(toks),
                pixels=np.clip(np.asarray(img_dec(grid)), 0.0, 1.0))
            fid_s[kv].update(jnp.asarray(samples[kv]["pixels"]))
        ref = samples["compute"]
        for kv in kvs[1:]:
            agg[kv]["agree"].append(
                (samples[kv]["tokens"] == ref["tokens"]).mean())
            agg[kv]["l1"].append(
                np.abs(samples[kv]["pixels"] - ref["pixels"]).mean())
            agg[kv]["lpips"].append(float(lpips_apply(
                jnp.asarray(samples[kv]["pixels"]),
                jnp.asarray(ref["pixels"]))))
        if c == 0:
            grid_rows = np.concatenate([np.asarray(held["image"][:4]),
                                        ref["pixels"][:4],
                                        samples["int4"]["pixels"][:4]])

    metrics = dict(steps=steps, train_seconds=train_s,
                   eval_prompts=n_chunks * AR_BATCH)
    for kv in kvs[1:]:
        metrics[f"{kv}_token_agreement"] = float(np.mean(agg[kv]["agree"]))
        metrics[f"{kv}_sample_l1_delta"] = float(np.mean(agg[kv]["l1"]))
        metrics[f"{kv}_sample_lpips_delta"] = float(
            np.mean(agg[kv]["lpips"]))

    # distributional check: FID(samples, real scenes) per cache dtype,
    # real pool matched to the sample count
    for i, batch in enumerate(StructuredSceneBatches(AR_BATCH, RES,
                                                     seed=31, compact=True)):
        if i >= max(4, n_chunks):
            break
        fid_real.update(jnp.asarray(batch["image"]))
    for kv in kvs:
        metrics[f"{kv}_sample_fid_vgg"] = fid_real.fid(fid_s[kv])

    save_image(make_grid(grid_rows, nrow=4),
               grid_path(f"{ar_name}_samples_grid"))
    record(ar_name, metrics)


AR_EVAL_PROMPTS = 32


def main():
    global RES, BATCH, TRAIN_CACHE, CKPT, AR_EVAL_PROMPTS, AR_KV_HEADS
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", nargs="?", default="all",
                    choices=("seg", "img", "ar", "all"))
    ap.add_argument("--res", type=int, default=256, choices=(256, 512))
    ap.add_argument("--pool", type=int, default=512,
                    help="scene-pool size for the training streams")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps-seg", type=int, default=3000)
    ap.add_argument("--steps-img", type=int, default=3000)
    ap.add_argument("--disc-start", type=int, default=2000)
    ap.add_argument("--steps-ar", type=int, default=4000)
    ap.add_argument("--ar-batch", type=int, default=32,
                    help="AR train/eval batch; the 512^2 geometry (1296 "
                         "tokens) OOMs the train step at 32 — use 8")
    ap.add_argument("--ar-eval-prompts", type=int, default=32)
    ap.add_argument("--ar-resume", action="store_true",
                    help="resume the AR stage from its latest checkpoint; "
                         "with steps-ar <= the checkpointed step this is "
                         "an eval-only re-run (recovers a lost eval "
                         "without retraining)")
    ap.add_argument("--seg-init-steps", type=int, default=200,
                    help="codebook phase-schedule base for the seg stage; "
                         "k-means re-inits run every N//2 steps until "
                         "30*N (400 covers a 12k-step run)")
    ap.add_argument("--ar-kv-heads", type=int, default=0,
                    help="train/eval the AR stage as a GQA architecture "
                         "with this many shared K/V heads (0 = MHA); "
                         "records under ar_kv{N} without touching the "
                         "MHA row")
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint root (default /tmp/recon_q[_512])")
    ap.add_argument("--seg-ckpt", default=None,
                    help="256² checkpoint root whose seg stage a 512² run "
                         "reuses (default /tmp/recon_q)")
    args = ap.parse_args()
    RES, BATCH, TRAIN_CACHE = args.res, args.batch, args.pool
    AR_EVAL_PROMPTS = args.ar_eval_prompts
    AR_KV_HEADS = args.ar_kv_heads
    global AR_BATCH, AR_RESUME
    AR_BATCH = args.ar_batch
    AR_RESUME = args.ar_resume
    global SEG_INIT_STEPS
    SEG_INIT_STEPS = args.seg_init_steps
    CKPT = args.ckpt or ("/tmp/recon_q" if RES == 256
                         else f"/tmp/recon_q_{RES}")
    global SEG_CKPT_256
    SEG_CKPT_256 = args.seg_ckpt or (CKPT if RES == SEG_RES
                                     else "/tmp/recon_q")
    if args.stage in ("seg", "all"):
        if RES == SEG_RES:
            stage_seg(args.steps_seg)
        else:
            print("seg stage is 256²-only (16² tokens either way); "
                  f"reusing {SEG_CKPT_256}/seg", flush=True)
    if args.stage in ("img", "all"):
        stage_img(args.steps_img, args.disc_start)
    if args.stage in ("ar", "all"):
        stage_ar(args.steps_ar)


if __name__ == "__main__":
    main()
