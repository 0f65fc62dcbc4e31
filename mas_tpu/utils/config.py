"""Strict, typed configuration schema.

The reference uses Hydra ``_target_`` reflection with modules that swallow
unknown kwargs (``/root/reference/models/modules.py:217,338``), which silently
mis-configures the VQ-SEG decoder (``conf/seg_config.yaml`` passes
taming-style keys ``ch``/``ch_mult``/``out_ch`` that are ignored, so the seg
decoder would emit 3 channels instead of 159).  This rebuild rejects unknown
keys at construction time (`ConfigError`) and parameterizes every field the
reference actually consumes.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple, Type, TypeVar

T = TypeVar("T")


class ConfigError(ValueError):
    """Raised on unknown keys or invalid field values."""


def _from_dict(cls: Type[T], data: Dict[str, Any]) -> T:
    """Build a dataclass from a dict, rejecting unknown keys recursively."""
    if not dataclasses.is_dataclass(cls):
        raise ConfigError(f"{cls} is not a config dataclass")
    names = {f.name: f for f in dataclasses.fields(cls)}
    unknown = set(data) - set(names)
    if unknown:
        raise ConfigError(
            f"unknown config keys for {cls.__name__}: {sorted(unknown)}; "
            f"valid keys: {sorted(names)}"
        )
    kwargs: Dict[str, Any] = {}
    for key, value in data.items():
        f = names[key]
        sub = f.type if isinstance(f.type, type) else None
        if sub is not None and dataclasses.is_dataclass(sub) and isinstance(value, dict):
            kwargs[key] = _from_dict(sub, value)
        else:
            kwargs[key] = value
    return cls(**kwargs)


class _Base:
    @classmethod
    def from_dict(cls, data: Dict[str, Any]):
        return _from_dict(cls, data)

    @classmethod
    def from_json(cls, text: str):
        return cls.from_dict(json.loads(text))

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def replace(self, **kwargs):
        return dataclasses.replace(self, **kwargs)


@dataclass(frozen=True)
class CodebookConfig(_Base):
    """Vector-quantizer codebook with a staged k-means bootstrap.

    Phase schedule mirrors the reference counter machine
    (``models/modules.py:465-499``): collect latents into a reservoir after
    ``init_steps`` steps, pass latents through unquantized until
    ``3 * init_steps``, then re-initialize the codebook by k-means over the
    all-gathered cross-replica reservoir every ``init_steps // 2`` steps
    until ``30 * init_steps``.
    """

    codebook_size: int = 1024          # K (VQ-SEG 1024, VQ-IMG 8192)
    codebook_dim: int = 256            # D
    beta: float = 0.25                 # commitment weight (vqvae.py:13)
    init_steps: int = 2000
    reservoir_size: int = 200_000
    samples_per_image: int = 10        # latents sampled into reservoir/image
    kmeans_iters: int = 10             # Lloyd iterations per re-init

    def __post_init__(self):
        if self.codebook_size <= 0 or self.codebook_dim <= 0:
            raise ConfigError("codebook_size and codebook_dim must be positive")
        if self.reservoir_size <= 0:
            raise ConfigError("reservoir_size must be positive")
        if self.reservoir_size < self.codebook_size:
            # the k-means re-init draws codebook_size centroids from the
            # reservoir (ops/kmeans.py top_k) — fewer samples than
            # centroids fails at trace time deep inside the train step
            raise ConfigError(
                f"reservoir_size ({self.reservoir_size}) must be >= "
                f"codebook_size ({self.codebook_size}): the k-means "
                "bootstrap draws one centroid per codebook entry from "
                "the reservoir")

    @property
    def q_start_collect(self) -> int:
        return self.init_steps

    @property
    def q_init(self) -> int:
        return self.init_steps * 3

    @property
    def q_re_end(self) -> int:
        return self.init_steps * 30

    @property
    def q_re_step(self) -> int:
        return self.init_steps // 2


@dataclass(frozen=True)
class VQModelConfig(_Base):
    """VQ-VAE / VQGAN autoencoder (reference ``models/vqvae.py:8-39``).

    ``channels`` / ``attn_resolutions`` / ``resolution`` follow the active
    reference Encoder/Decoder semantics (``models/modules.py:199-240,337-369``):
    len(channels)-2 downsample stages => 16x spatial reduction with defaults.
    """

    in_channels: int = 3
    out_channels: int = 3
    channels: Tuple[int, ...] = (128, 128, 128, 256, 512, 512)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (32,)
    resolution: int = 512
    z_channels: int = 256
    embed_dim: int = 256
    dropout: float = 0.0
    codebook: CodebookConfig = field(default_factory=CodebookConfig)
    # compute dtype for conv stack ("bfloat16" or "float32"); params stay fp32
    compute_dtype: str = "float32"

    def __post_init__(self):
        if isinstance(self.channels, list):
            object.__setattr__(self, "channels", tuple(self.channels))
        if isinstance(self.attn_resolutions, list):
            object.__setattr__(self, "attn_resolutions", tuple(self.attn_resolutions))
        if isinstance(self.codebook, dict):
            object.__setattr__(self, "codebook", CodebookConfig.from_dict(self.codebook))
        if len(self.channels) < 2:
            raise ConfigError("channels needs at least 2 entries")
        if self.resolution % self.spatial_reduction != 0:
            raise ConfigError(
                f"resolution {self.resolution} not divisible by reduction "
                f"{self.spatial_reduction}"
            )

    @property
    def num_down(self) -> int:
        # reference Encoder downsamples when i < len(channels) - 2
        return len(self.channels) - 2

    @property
    def spatial_reduction(self) -> int:
        return 2 ** self.num_down

    @property
    def latent_resolution(self) -> int:
        return self.resolution // self.spatial_reduction


def vq_seg_config(**overrides) -> VQModelConfig:
    """VQ-SEG: 159-ch one-hot seg maps at 256^2 -> 16^2 tokens, K=1024.

    Fixes the reference config pitfall (seg decoder must emit 159 channels).
    """
    base = dict(
        in_channels=159,
        out_channels=159,
        resolution=256,
        attn_resolutions=(16,),
        codebook=CodebookConfig(codebook_size=1024),
    )
    base.update(overrides)
    return VQModelConfig(**base)


def vq_img_config(**overrides) -> VQModelConfig:
    """VQ-IMG: RGB at 512^2 -> 32^2 tokens, K=8192 (conf/img_config.yaml)."""
    base = dict(
        in_channels=3,
        out_channels=3,
        resolution=512,
        attn_resolutions=(32,),
        codebook=CodebookConfig(codebook_size=8192, init_steps=3000,
                                reservoir_size=12500),
    )
    base.update(overrides)
    return VQModelConfig(**base)


@dataclass(frozen=True)
class TransformerConfig(_Base):
    """MakeAScene AR transformer (reference ``models/transformer.py:275-378``).

    Sequence = [text | seg | image]; causal mask is full (bidirectional) over
    the text+seg prefix. Text pad tokens (id 0) are remapped to
    ``text_vocab_size - text_length + position``.
    """

    num_layers: int = 24
    hidden_dim: int = 1024
    num_attn_heads: int = 16
    # Grouped-query attention (no reference analog — a serving-architecture
    # option): number of shared K/V heads; 0 (default) = num_attn_heads
    # (standard MHA, the reference architecture).  Each group of
    # num_attn_heads/num_kv_heads consecutive query heads attends to one
    # K/V head.  Decode is KV-cache-bandwidth-bound (BASELINE.md), so
    # fewer KV heads divides the dominant HBM stream (and the cache
    # memory) by the group size.  A GQA model is a DIFFERENT architecture:
    # it must be trained with the same num_kv_heads it serves with.
    num_kv_heads: int = 0
    image_vocab_size: int = 8192
    seg_vocab_size: int = 1024
    text_vocab_size: int = 16512       # includes text_length pad-remap slots
    image_tokens_per_dim: int = 32
    seg_tokens_per_dim: int = 16
    text_length: int = 128
    attn_dropout: float = 0.0
    out_dropout: float = 0.0
    cogview_pb_relax: bool = True
    cogview_sandwich_layernorm: bool = True
    pb_relax_alpha: float = 32.0
    # The paper's mask is bidirectional over the text+seg prefix, and the
    # reference BUILDS that mask (transformer.py:366-369) — but then
    # multiplies it by the per-layer tril buffer (transformer.py:262-263),
    # which cancels the prefix block: the reference effectively runs pure
    # causal attention.  True (default) = paper intent; False = faithful to
    # the reference's effective behavior (needed for bit-parity against
    # reference-trained checkpoints).
    prefix_bidirectional: bool = True
    # ruDALL-E numerical-relaxation variant (reference transformer.py:48-55,
    # 93-106,133-136): sigma-normalized scores with a min/max midpoint shift,
    # 65504 mask value, detached max-rescaling of v/context/MLP activations.
    # Checkpoint-compat surface.  Algebraically the shift is a row-constant
    # softmax-invariant and both sigma divisions fold into the q operand, so
    # the flash kernel runs this variant exactly (see
    # models/transformer.py::rudalle_relax_attention_fused); incompatible
    # with the quantized KV caches (decode needs masked float statistics).
    rudalle_relax: bool = False
    # CogView LayerNorm-prescale (reference transformer.py:177-178,184-185,
    # 192-193): divide LN inputs by their detached per-position max (ln_in,
    # first sandwich, ln_out — not the second sandwich).
    cogview_layernorm_prescale: bool = False
    compute_dtype: str = "float32"
    # Fold ln_in / ln_out algebraically into the qkv / mlp.lin1 matmuls
    # (ops.norms.folded_ln_dense): LN(x)@W = r*(x@(gamma*W)) - r*mu*colsum
    # + beta@W, so the normalized activation is never written/re-read.
    # Same parameter tree as the unfolded model (checkpoints
    # interchangeable); sandwich LNs are unaffected (no adjacent matmul).
    ln_matmul_fold: bool = False
    # 'auto' picks pallas flash attention on TPU, jnp elsewhere
    attention_impl: str = "auto"
    # single-token cached decode attention: 'auto' | 'jnp' | 'pallas' |
    # 'pallas_interpret'.  'auto' falls back to attention_impl when that is
    # an explicit pallas choice, else uses the measured per-cache-dtype
    # default (see models/transformer.py::SelfAttention.decode)
    decode_attention_impl: str = "auto"
    # rematerialize each layer's activations in the backward pass
    # (jax.checkpoint): trades ~30% step FLOPs for O(layers) less
    # activation memory — the standard lever for the 1408-token geometry
    remat: bool = False
    # what the remat saves: 'nothing' (max memory savings, full recompute)
    # or 'dots' (save matmul outputs, recompute only the cheap elementwise
    # tail — recovers most of the recompute cost at moderate memory)
    remat_policy: str = "nothing"
    # decode KV-cache storage: 'compute' (same dtype as activations) or
    # 'int8' (symmetric per-position quantization — halves the cache HBM
    # traffic that dominates large-batch decode; see ops/quant.py)
    kv_cache_dtype: str = "compute"
    # ring-tail decode (int8 cache only): keep the bulk of the cache as an
    # immutable int8 "frozen" region (a scan INVARIANT — no per-token
    # dynamic_update_slice on 84 MB carries) and write new tokens into a
    # small compute-dtype tail buffer, flushed (quantized) into the frozen
    # region every 128 tokens between scan segments.  Requires
    # total_length % 128 == 0; falls back to the plain cache otherwise.
    decode_ring_tail: bool = False
    # quantized-cache memory layout + write path for decode:
    #   'lane'         — k and v in separate [B, H, hd, T] buffers (sequence
    #                    in lanes), written via dynamic_update_slice.  The
    #                    round-2 "whole-cache carry copy per step" theory is
    #                    DEAD: trace attribution (benchmarks/decode_trace.py,
    #                    BASELINE round 3) shows XLA in-places the DUS writes
    #                    (all carry copies = 5.5% of token time) — this is
    #                    the measured-best default;
    #   'lane_aliased' — same buffers and same (bandwidth-perfect,
    #                    XLA-overlapped) read path, but the write is an
    #                    input_output_aliased Pallas RMW of the 128-lane
    #                    block holding the token (ops/decode_cache.py) —
    #                    no carry copy;
    #   'packed'       — k‖v share one [B, H, T, 2*hd] buffer with a
    #                    sublane-block RMW write.  MEASURED LOSER (8.8 vs
    #                    31.9 img/s, BENCH r3): the read must lane-slice
    #                    kv[..., :hd], which XLA materializes as a
    #                    whole-cache relayout copy per step.  Kept as the
    #                    documented ablation.
    kv_cache_layout: str = "lane"
    # storage dtype of the quantized cache's per-position scales:
    # 'float32' (exact) or 'bfloat16' (halves the scale stream — 12.5% of
    # the int4 cache read at d=64 — for <=0.4% extra scale rounding).
    # Only the measured-default decode path ('lane' layout, no ring tail)
    # supports bfloat16; the Pallas read/write kernels keep fp32 scales.
    kv_scale_dtype: str = "float32"
    # length-bucketed decode reads (quantized caches, jnp read path): with
    # n > 1 the cached-attention read dispatches through a lax.switch over
    # n static prefix-slice lengths, reading only the smallest bucket
    # covering the current index.  MEASURED LOSER end-to-end (BASELINE.md
    # round 3: 6.96 vs 32.06 img/s at 256²) — the switch branches break
    # the scan carry's in-place aliasing.  Kept as a tested ablation.
    decode_length_buckets: int = 1
    # decode query-row padding (jnp read path, quantized or float caches):
    # pad the single decode query to this many rows before the cached
    # attention einsums and slice row 0 back out afterwards.  Motivation
    # (benchmarks/read_floor.py, BASELINE round 4): the isolated Q=1
    # batched matvec lowers to a pathological VPU kLoop fusion — padding q
    # to 4/8 rows (same cache bytes, 4-8x the MACs) runs 30-45% FASTER
    # isolated because XLA routes the wider contraction onto the MXU.
    # MEASURED END-TO-END LOSER (BASELINE round 4): 7.36 img/s (rows=4) /
    # 5.91 (rows=8) vs 32.4 shipped at 256²/batch 64/int4 — the widened
    # [B,H,rows,T] score/softmax/pv intermediates lose the scan's
    # read-fusion overlap.  Kept as a tested ablation (default 1 = off),
    # like decode_length_buckets.
    # Numerics: exact in exact arithmetic (zero rows are inert — proven
    # bitwise on CPU, tests/test_decode_cache.py::TestDecodeQRows); on TPU
    # the wider einsum changes bf16/MXU accumulation order, so sampled
    # trajectories are NOT bitwise-reproducible vs rows=1 (single-step
    # outputs agree to accumulation tolerance; same determinism-vs-quality
    # distinction as the quantized caches, BASELINE.md).
    decode_q_rows: int = 1
    # LayerNorm implementation: 'jnp' (XLA reduce+map fusions) or 'pallas'
    # (fused one-pass fwd/bwd kernel, ops/pallas/layer_norm.py — targets
    # the 12.4%-of-step sandwich-LN cost measured by train_profile
    # --levers; small shapes auto-fall back to jnp)
    layernorm_impl: str = "jnp"
    # stack the transformer layers and sweep them with ONE lax.scan
    # (flax nn.scan) in the training forward/backward instead of
    # unrolling num_layers clones into the HLO.  Compile-time /
    # compile-memory lever: the flagship 24-layer program carries one
    # layer body (the axon remote-compile helper OOMs on the unrolled
    # program at mlp-remat batch >= 24 — BASELINE.md).  Param tree
    # changes to a stacked {'layers': {'layer': [L, ...]}} form;
    # checkpoints convert losslessly via
    # models.transformer.{stack,unstack}_layer_params.  Serving
    # (prefill/decode_step) keeps the unrolled per-layer graph — its
    # in-place cache aliasing is layout-load-bearing (BASELINE round 3)
    # — so sample with scan_layers=False after unstacking.  remat
    # composes (applied per scan step, prevent_cse off inside scan).
    scan_layers: bool = False

    def __post_init__(self):
        if self.layernorm_impl not in ("jnp", "pallas"):
            raise ConfigError(
                f"layernorm_impl must be jnp/pallas, got "
                f"{self.layernorm_impl!r}")
        if self.hidden_dim % self.num_attn_heads:
            raise ConfigError("hidden_dim must divide num_attn_heads")
        if self.num_kv_heads:
            if (self.num_kv_heads < 1
                    or self.num_attn_heads % self.num_kv_heads):
                raise ConfigError(
                    f"num_kv_heads ({self.num_kv_heads}) must be a positive "
                    f"divisor of num_attn_heads ({self.num_attn_heads})")
            if self.num_kv_heads < self.num_attn_heads:
                if self.rudalle_relax:
                    raise ConfigError(
                        "grouped-query attention is not defined for the "
                        "rudalle_relax checkpoint-compat variant")
                if self.decode_ring_tail:
                    raise ConfigError(
                        "grouped-query attention supports only the default "
                        "decode path; disable decode_ring_tail")
                if self.kv_cache_layout == "packed":
                    raise ConfigError(
                        "grouped-query attention supports "
                        "kv_cache_layout 'lane' or 'lane_aliased' (the "
                        "packed write kernel assumes full-head caches)")
                if self.decode_attention_impl in ("pallas",
                                                  "pallas_interpret"):
                    raise ConfigError(
                        "grouped-query attention decodes via the jnp read "
                        "path only (the Pallas decode kernels assume "
                        "full-head q); drop the explicit "
                        "decode_attention_impl")
        if self.text_vocab_size < self.text_length:
            raise ConfigError("text_vocab_size must be >= text_length "
                              "(pad-remap needs text_length trailing slots)")
        if self.rudalle_relax and not self.cogview_pb_relax:
            raise ConfigError(
                "rudalle_relax is a refinement of the PB-relax branch "
                "(reference transformer.py:47-55); enable cogview_pb_relax")
        if self.kv_cache_dtype not in ("compute", "int8", "int4"):
            raise ConfigError(
                f"kv_cache_dtype must be compute/int8/int4, got "
                f"{self.kv_cache_dtype!r}")
        if self.rudalle_relax and self.kv_cache_dtype != "compute":
            raise ConfigError(
                "rudalle_relax requires a floating-point KV cache (its "
                "masked sigma/max statistics are not defined over the "
                "quantized cache)")
        if self.decode_length_buckets < 1:
            raise ConfigError("decode_length_buckets must be >= 1")
        if self.decode_q_rows < 1:
            raise ConfigError("decode_q_rows must be >= 1")
        if self.decode_q_rows > 1:
            if self.rudalle_relax or self.decode_ring_tail:
                raise ConfigError(
                    "decode_q_rows > 1 supports only the default decode "
                    "path (no rudalle_relax, no decode_ring_tail)")
            if self.kv_cache_layout != "lane":
                raise ConfigError(
                    "decode_q_rows > 1 requires kv_cache_layout='lane'")
            if self.decode_attention_impl in ("pallas", "pallas_interpret"):
                raise ConfigError(
                    "decode_q_rows > 1 uses the jnp read path only (the "
                    "Pallas decode kernels assume a single query row)")
        if self.kv_scale_dtype not in ("float32", "bfloat16"):
            raise ConfigError(
                f"kv_scale_dtype must be float32/bfloat16, got "
                f"{self.kv_scale_dtype!r}")
        if self.kv_scale_dtype == "bfloat16" and (
                self.kv_cache_layout != "lane" or self.decode_ring_tail
                or self.kv_cache_dtype not in ("int8", "int4")):
            raise ConfigError(
                "kv_scale_dtype='bfloat16' is only supported on the "
                "default quantized decode path (kv_cache_dtype int8/int4, "
                "kv_cache_layout='lane', no ring tail)")
        if self.decode_length_buckets > 1 and self.decode_ring_tail:
            raise ConfigError(
                "decode_length_buckets and decode_ring_tail restructure "
                "the same cache read; pick one")
        if self.kv_cache_layout not in ("lane", "lane_aliased", "packed"):
            raise ConfigError(
                f"kv_cache_layout must be lane/lane_aliased/packed, got "
                f"{self.kv_cache_layout!r}")
        if self.kv_cache_layout in ("lane_aliased", "packed"):
            if self.kv_cache_dtype not in ("int8", "int4"):
                raise ConfigError(
                    f"kv_cache_layout={self.kv_cache_layout!r} is a "
                    "quantized-cache layout; set kv_cache_dtype to int8 "
                    "or int4")
            if self.decode_ring_tail:
                raise ConfigError(
                    f"decode_ring_tail and kv_cache_layout="
                    f"{self.kv_cache_layout!r} are alternative decode "
                    "write-path strategies; pick one")
            if self.total_length % 128:
                raise ConfigError(
                    f"kv_cache_layout={self.kv_cache_layout!r} needs "
                    "total_length % 128 == 0 (the RMW block is one "
                    "128-lane tile)")

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_attn_heads

    @property
    def kv_heads(self) -> int:
        """Effective number of K/V heads (= num_attn_heads unless GQA)."""
        return self.num_kv_heads or self.num_attn_heads

    @property
    def image_length(self) -> int:
        return self.image_tokens_per_dim ** 2

    @property
    def seg_length(self) -> int:
        return self.seg_tokens_per_dim ** 2

    @property
    def total_length(self) -> int:
        return self.text_length + self.seg_length + self.image_length

    @property
    def prefix_length(self) -> int:
        return self.text_length + self.seg_length

    @property
    def effective_prefix(self) -> int:
        """Bidirectional-prefix extent actually applied to masks: 0 when
        mirroring the reference's tril-cancelled mask (see
        ``prefix_bidirectional``)."""
        return self.prefix_length if self.prefix_bidirectional else 0


@dataclass(frozen=True)
class SegLossConfig(_Base):
    """Weighted-BCE seg loss (reference ``losses/loss_seg.py:6-22``)."""

    image_channels: int = 159
    codebook_weight: float = 1.0
    face_weight: float = 20.0
    face_channel_start: int = 153
    face_channel_end: int = 158


@dataclass(frozen=True)
class VQGANLossConfig(_Base):
    """VQ-IMG composite loss (reference ``losses/loss_img.py:32-141``)."""

    disc_start: int = 250_001
    codebook_weight: float = 1.0
    pixelloss_weight: float = 1.0
    disc_factor: float = 1.0
    disc_weight: float = 0.8
    perceptual_weight: float = 1.0
    face_loss: bool = True
    object_weight: float = 2.0   # bbox gradient upweight for object-aware LPIPS
    max_faces: int = 6           # reference caps faces at 6 (face_loss.py:132)


@dataclass(frozen=True)
class OptimizerConfig(_Base):
    lr: float = 4.5e-6
    beta1: float = 0.5
    beta2: float = 0.9
    eps: float = 1e-8
    accumulate_grad: int = 1     # optax.MultiSteps; reference divides lr by it


@dataclass(frozen=True)
class MeshConfig(_Base):
    """Device mesh. axes: data (DP, gradient psum) and model (TP)."""

    data: int = -1   # -1 = all remaining devices
    model: int = 1

    def shape(self, n_devices: int) -> Tuple[int, int]:
        model = max(1, self.model)
        data = self.data if self.data > 0 else n_devices // model
        if data * model != n_devices:
            raise ConfigError(
                f"mesh {data}x{model} does not cover {n_devices} devices")
        return data, model


@dataclass(frozen=True)
class TrainConfig(_Base):
    mode: str = "pretrain_segmentation"
    total_steps: int = 100
    batch_size: int = 2          # per-replica, as in the reference configs
    log_period: int = 50
    save_period: int = 50_000
    checkpoint_dir: str = "checkpoints"
    resume: bool = False
    seed: int = 0
    # transformer CFG dropout (train.py:147-148)
    start_uncond: int = 0
    uncond_p: float = 0.1
    mesh: MeshConfig = field(default_factory=MeshConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    disc_optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    # tiny-test escape hatch: replicate batches that don't tile the data
    # axis instead of raising (never enable in production — it silently
    # runs every device over the same rows)
    allow_replicated_batch: bool = False

    def __post_init__(self):
        valid = {"pretrain_segmentation", "pretrain_image", "train_transformer"}
        if self.mode not in valid:
            raise ConfigError(f"mode must be one of {sorted(valid)}")
        for name in ("mesh", "optimizer", "disc_optimizer"):
            v = getattr(self, name)
            if isinstance(v, dict):
                cls = {"mesh": MeshConfig}.get(name, OptimizerConfig)
                object.__setattr__(self, name, cls.from_dict(v))
