"""Flagship transformer train-step attribution (VERDICT r1 #6).

Round 1 measured 1240 ms/step (24L/1024h, T=1408, batch 16, bf16,
remat+flash) ~= 19% MFU and left "where do the other 81% go" unanswered.
This script answers it by measured subtraction INSIDE the real jitted
train step (the same methodology as benchmarks/decode_ablation.py —
isolated microbenches mislead):

  * component passthroughs: attention -> identity, MLP -> identity,
    sandwich-LN off  => each component's inclusive share,
  * remat policy: nothing / dots / off,
  * batch sweep => tokens/s scaling,
  * MFU from the analytic model-flop count (fwd 2NBT + bwd 4NBT +
    attention scores; recompute NOT counted — the standard convention).

Run: python benchmarks/train_profile.py [--quick]   (real TPU, ~15 min)
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mas_tpu.models import transformer as tfm
from mas_tpu.utils.config import OptimizerConfig, TransformerConfig
from mas_tpu.train.state import TransformerTrainState, make_adam
from mas_tpu.train.steps import make_transformer_train_step

V5E_PEAK = 197e12   # bf16 flops/s


def flagship(**kw) -> TransformerConfig:
    base = dict(num_layers=24, hidden_dim=1024, num_attn_heads=16,
                image_vocab_size=8192, seg_vocab_size=1024,
                text_vocab_size=16384 + 128, image_tokens_per_dim=32,
                seg_tokens_per_dim=16, text_length=128,
                compute_dtype="bfloat16", remat=True,
                remat_policy="nothing")
    base.update(kw)
    return TransformerConfig(**base)


def model_flops(cfg: TransformerConfig, batch: int) -> float:
    """Analytic model flops per step (no remat recompute — MFU convention)."""
    h, t, b, L = cfg.hidden_dim, cfg.total_length, batch, cfg.num_layers
    layer_matmul = 2 * 12 * h * h          # qkv + out + 2 mlp, flops/token
    fwd = layer_matmul * L * b * t
    # attention scores: 2 matmuls, ~55% of the T^2 mask visible
    fwd += 2 * 2 * b * cfg.num_attn_heads * t * t * cfg.head_dim * 0.55
    # vocab projection over image positions only
    fwd += 2 * b * (cfg.image_length + 1) * h * cfg.image_vocab_size
    return 3.0 * fwd                        # bwd = 2x fwd


def bench_step(cfg: TransformerConfig, batch: int, iters: int = 4,
               label: str = "") -> float:
    model = tfm.MakeAScene(cfg)
    tx = make_adam(OptimizerConfig(lr=1e-4))
    rng = jax.random.PRNGKey(0)
    text = jnp.zeros((1, cfg.text_length), jnp.int32)
    seg = jnp.zeros((1, cfg.seg_length), jnp.int32)
    img = jnp.zeros((1, cfg.image_length), jnp.int32)
    variables = jax.jit(model.init)(rng, text, seg, img)
    state = TransformerTrainState(step=jnp.zeros((), jnp.int32),
                                  params=variables["params"],
                                  opt_state=tx.init(variables["params"]))
    step = make_transformer_train_step(model, tx)
    bt = jax.random.randint(rng, (batch, cfg.text_length), 1, 1000)
    bs = jax.random.randint(rng, (batch, cfg.seg_length), 0, 1024)
    bi = jax.random.randint(rng, (batch, cfg.image_length), 0, 8192)
    t0 = time.time()
    state, m = step(state, bt, bs, bi, rng)
    float(m["loss"])                        # force completion (axon: no
    compile_s = time.time() - t0            # block_until_ready)
    times = []
    for _ in range(iters):
        t0 = time.time()
        state, m = step(state, bt, bs, bi, rng)
        float(m["loss"])
        times.append(time.time() - t0)
    ms = float(np.median(times) * 1e3)
    mfu = model_flops(cfg, batch) / (ms / 1e3) / V5E_PEAK
    print(f"{label:34s} batch {batch:3d}: {ms:7.1f} ms/step  "
          f"{batch * cfg.total_length / ms * 1e3 / 1e3:7.1f} ktok/s  "
          f"MFU {mfu * 100:5.1f}%  (compile {compile_s:.0f}s)", flush=True)
    return ms


def safe(fn, *a, **kw):
    """OOM on one variant must not kill the sweep."""
    try:
        return fn(*a, **kw)
    except Exception as exn:                                  # noqa: BLE001
        print(f"  FAILED ({type(exn).__name__}): "
              f"{str(exn).splitlines()[0][:120]}", flush=True)
        return None


def levers():
    """Round-4 MFU levers (VERDICT r3 #4): quantify the non-attention
    surplus by diagnostic subtraction — gelu transcendentals, the four
    LayerNorm bandwidth passes, optimizer glue — then the retryable
    config levers (mlp-remat at batch >= 24 with the warm compile cache).
    Diagnostics change semantics (identity gelu / LN) and are never
    shipped; they bound what a fused kernel could recover."""
    print("== levers: diagnostics ==", flush=True)
    base = bench_step(flagship(), 16, label="baseline (remat nothing)")

    orig_gelu = tfm._gelu
    tfm._gelu = lambda x: x
    no_gelu = safe(bench_step, flagship(), 16, label="gelu -> identity")
    tfm._gelu = orig_gelu

    orig_ln = tfm.LayerNorm.__call__
    tfm.LayerNorm.__call__ = lambda self, x: x
    no_ln = safe(bench_step, flagship(), 16, label="ALL LayerNorms -> id")
    tfm.LayerNorm.__call__ = orig_ln

    for name, ms in (("gelu", no_gelu), ("all-LN", no_ln)):
        if ms is not None:
            print(f"{name}: {100 * (base - ms) / base:.1f}% of the step",
                  flush=True)

    print("== levers: fused LN kernel (shippable) ==", flush=True)
    pl_ln = safe(bench_step, flagship(layernorm_impl="pallas"), 16,
                 label="pallas fused LN")
    if pl_ln is not None and no_ln is not None:
        recovered = 100 * (base - pl_ln) / max(base - no_ln, 1e-9)
        print(f"fused LN recovers {recovered:.0f}% of the all-LN bound "
              f"({base:.1f} -> {pl_ln:.1f} ms)", flush=True)

    print("== levers: LN folded into matmuls (shippable) ==", flush=True)
    # ln_in -> qkv and ln_out -> mlp.lin1 are computed algebraically inside
    # the following matmul (ops.norms.folded_ln_dense) — 2 of the 4 LNs per
    # block never materialize.  Upper bound: half the all-LN bound (~5.3%).
    fold = safe(bench_step, flagship(ln_matmul_fold=True), 16,
                label="LN->matmul fold (ln_in+ln_out)")
    if fold is not None and no_ln is not None:
        recovered = 100 * (base - fold) / max(base - no_ln, 1e-9)
        print(f"LN fold recovers {recovered:.0f}% of the all-LN bound "
              f"({base:.1f} -> {fold:.1f} ms)", flush=True)

    print("== levers: mlp-remat retry (compile cache now persistent) ==",
          flush=True)
    for b in (24, 32):
        safe(bench_step, flagship(remat_policy="mlp"), b,
             label="remat mlp-only")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--levers", action="store_true",
                    help="round-4 MFU lever diagnostics only")
    ap.add_argument("--fold-only", action="store_true",
                    help="baseline + LN->matmul fold A/B only (the other "
                         "lever rows are committed in train_levers.txt)")
    ap.add_argument("--remat-only", action="store_true",
                    help="mlp-remat at batch 24/32 retry only (VERDICT r4 "
                         "#4: the toolchain-blocked lever, retried once "
                         "per round)")
    ap.add_argument("--scan-only", action="store_true",
                    help="cfg.scan_layers A/B: compile time + step time "
                         "vs the unrolled stack, then the batch>=24 "
                         "retry with the 24x-smaller scanned HLO (the "
                         "axon compile helper OOMs on the unrolled one)")
    args = ap.parse_args()
    if args.scan_only:
        print("== scan_layers A/B (flagship 24L/1408tok bf16) ==",
              flush=True)
        bench_step(flagship(), 16, label="unrolled (remat nothing)")
        safe(bench_step, flagship(scan_layers=True), 16,
             label="scan_layers (remat nothing)")
        safe(bench_step, flagship(scan_layers=True, remat_policy="mlp"),
             16, label="scan_layers remat mlp-only")
        for b in (24, 32):
            safe(bench_step, flagship(scan_layers=True,
                                      remat_policy="mlp"), b,
                 label="scan_layers remat mlp-only")
            safe(bench_step, flagship(scan_layers=True), b,
                 label="scan_layers (remat nothing)")
        return
    if args.remat_only:
        print("== mlp-remat >= 24 retry ==", flush=True)
        bench_step(flagship(), 16, label="baseline (remat nothing)")
        for b in (24, 32):
            safe(bench_step, flagship(remat_policy="mlp"), b,
                 label="remat mlp-only")
        return
    if args.fold_only:
        print("== LN->matmul fold A/B ==", flush=True)
        base = bench_step(flagship(), 16, label="baseline (remat nothing)")
        fold = safe(bench_step, flagship(ln_matmul_fold=True), 16,
                    label="LN->matmul fold (ln_in+ln_out)")
        if fold is not None:
            # all-LN identity bound: 736.8 ms vs 823.8 baseline (committed
            # results/train_levers.txt) = 87 ms; the fold targets 2/4 LNs
            print(f"fold delta {base - fold:+.1f} ms vs the committed "
                  f"87 ms all-LN bound", flush=True)
        # larger-batch check: fold changes peak activation memory
        safe(bench_step, flagship(ln_matmul_fold=True), 32,
             label="LN->matmul fold")
        safe(bench_step, flagship(), 32, label="baseline")
        return
    if args.levers:
        levers()
        return

    print("== remat / batch ==", flush=True)
    base_ms = bench_step(flagship(), 16, label="baseline (remat nothing)")
    safe(bench_step, flagship(remat_policy="dots"), 16, label="remat dots")
    safe(bench_step, flagship(remat_policy="mlp"), 16, label="remat mlp-only")
    if not args.quick:
        safe(bench_step, flagship(remat=False), 8, label="no remat")
        safe(bench_step, flagship(remat=False), 12, label="no remat")
        safe(bench_step, flagship(remat_policy="mlp"), 24,
             label="remat mlp-only")
        safe(bench_step, flagship(remat_policy="mlp"), 32,
             label="remat mlp-only")
        safe(bench_step, flagship(), 32, label="baseline")

    print("== component passthroughs (inclusive share) ==", flush=True)
    orig_attn = tfm.SelfAttention.__call__
    orig_mlp = tfm.MLP.__call__

    def attn_passthrough(self, x, mask, return_kv=False, prefix_length=None):
        return (x, (x, x)) if return_kv else x

    tfm.SelfAttention.__call__ = attn_passthrough
    no_attn = safe(bench_step, flagship(), 16, label="attention removed")
    tfm.SelfAttention.__call__ = orig_attn

    tfm.MLP.__call__ = lambda self, x: x
    no_mlp = safe(bench_step, flagship(), 16, label="mlp removed")
    tfm.MLP.__call__ = orig_mlp

    no_sand = safe(bench_step, flagship(cogview_sandwich_layernorm=False),
                   16, label="sandwich LN off")
    for name, ms in (("attention", no_attn), ("mlp", no_mlp),
                     ("sandwich-LN", no_sand)):
        if ms is not None:
            print(f"{name}: {100 * (base_ms - ms) / base_ms:.0f}% of the "
                  f"step", flush=True)


if __name__ == "__main__":
    main()
