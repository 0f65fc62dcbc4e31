"""Trace-based floor analysis of the VQ-IMG (VQGAN) train step.

The reference's hottest loop (SURVEY §3.2, ``/root/reference/train.py:
60-134``) is the dual-optimizer GAN step: generator forward + LPIPS VGG
tower + adaptive-d_weight double-grad w.r.t. the final decoder conv +
discriminator hinge update.  BASELINE's perf map has this surface as
"not yet floor-analyzed" — this harness answers where the step time
goes and how far the conv stack sits from the MXU roof:

  * op-family totals from a jax.profiler device trace (same aggregation
    as ``decode_trace.py``) — convolution vs fusion (elementwise /
    norm-swish) vs copies,
  * XLA's own cost analysis (flops) of the compiled step -> implied MFU
    against the v5e bf16 peak.  NOTE: cost_analysis counts flops AS
    COMPILED (incl. any rematerialized recompute), so the MFU it implies
    is an upper bound on the waste, not the MFU convention used for the
    transformer rows (analytic model flops).

Run (real TPU):  python benchmarks/gan_trace.py [--res 512 --batch 2]
The reference trains the 512^2 model at batch 2/GPU
(conf/img_config.yaml) — that is the default geometry here; the GAN
branch is forced live (disc_start=1) so the double-grad is in the trace.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK = 197e12   # bf16 flops/s


def build(res: int, batch: int):
    from mas_tpu.losses.discriminator import PatchDiscriminator
    from mas_tpu.losses.lpips import LPIPS
    from mas_tpu.models.vqvae import VQModel
    from mas_tpu.train.state import create_vq_train_state, make_adam
    from mas_tpu.train.steps import make_img_train_step
    from mas_tpu.utils.config import (CodebookConfig, OptimizerConfig,
                                      VQGANLossConfig, vq_img_config)

    cfg = vq_img_config(
        resolution=res, attn_resolutions=(res // 16,),
        compute_dtype="bfloat16",
        codebook=CodebookConfig(codebook_size=8192, init_steps=2,
                                reservoir_size=8192, samples_per_image=4))
    model = VQModel(cfg)
    disc = PatchDiscriminator()
    lpips = LPIPS()
    rng = jax.random.PRNGKey(0)
    tx = make_adam(OptimizerConfig(lr=1e-4))
    disc_tx = make_adam(OptimizerConfig(lr=1e-4))
    state = create_vq_train_state(model, cfg, tx, rng, disc_model=disc,
                                  disc_tx=disc_tx)
    x = jax.random.uniform(rng, (batch, res, res, 3))
    lpips_vars = lpips.init(jax.random.PRNGKey(1), x[:1], x[:1])
    frozen = {"lpips": lpips_vars}
    loss_cfg = VQGANLossConfig(disc_start=1, face_loss=False)
    step = make_img_train_step(model, disc, tx, disc_tx, loss_cfg, lpips,
                               face_model=None)
    batch_d = dict(
        image=x,
        bbox_obj=jnp.tile(jnp.array([[[4, 4, 60, 60]]], jnp.float32),
                          (batch, 1, 1)),
        bbox_face=jnp.zeros((batch, 1, 4), jnp.float32))
    return state, step, batch_d, frozen


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from benchmarks.decode_trace import aggregate

    state, step, batch, frozen, = build(args.res, args.batch)

    flops = None
    try:
        lowered = step.lower(state, batch, frozen, jax.random.PRNGKey(2))
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception as exn:                                  # noqa: BLE001
        print(f"cost_analysis unavailable: {type(exn).__name__}: "
              f"{str(exn).splitlines()[0][:100]}")

    rng = jax.random.PRNGKey(3)
    t0 = time.time()
    state, m = step(state, batch, frozen, rng)
    float(m["loss"])
    print(f"compile+first step {time.time() - t0:.0f}s", flush=True)

    times = []
    for i in range(args.iters):
        t0 = time.time()
        state, m = step(state, batch, frozen, jax.random.fold_in(rng, i))
        float(m["loss"])                    # axon: force completion
        times.append(time.time() - t0)
    ms = float(np.median(times) * 1e3)
    print(f"step {ms:.1f} ms  ({args.batch / ms * 1e3:.2f} img/s/chip, "
          f"batch {args.batch}, {args.res}^2)")
    if flops:
        mfu = flops / (ms / 1e3) / V5E_PEAK
        print(f"XLA cost-analysis flops/step: {flops / 1e12:.2f} TF  "
              f"-> as-compiled MFU {mfu * 100:.1f}% of v5e bf16 peak")

    trace_dir = "/tmp/mas_gan_trace"
    with jax.profiler.trace(trace_dir):
        state, m = step(state, batch, frozen, jax.random.fold_in(rng, 99))
        float(m["loss"])
    by_name, by_family, total, path = aggregate(trace_dir)
    print(f"trace: {path}")
    print(f"total device op time: {total / 1e3:.1f} ms")
    print("-- op-family totals --")
    for name, dur in sorted(by_family.items(), key=lambda kv: -kv[1])[:14]:
        print(f"{dur / 1e3:9.2f} ms  {100 * dur / total:5.1f}%  {name[:90]}")
    print("-- top individual ops --")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{dur / 1e3:9.2f} ms  {100 * dur / total:5.1f}%  {name[:90]}")


if __name__ == "__main__":
    main()
