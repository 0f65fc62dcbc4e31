"""Trace-based attribution of the decode scan (one bench-geometry call).

The round-2/3 write-path variants (select-mask, ring, segmented, packed
RMW, lane-aliased RMW) ALL lost end-to-end to the plain DUS cache —
before building another, this captures a jax.profiler trace of the real
sampler call and aggregates device op durations, answering:

  * does the DUS whole-cache carry copy actually exist in the compiled
    scan (look for large fusion/copy ops ~ cache-sized)?
  * what fraction goes to the attention einsums vs qkv/mlp matmuls vs
    the sampling head vs raw copies?

Run: python benchmarks/decode_trace.py [--batch 64] (real TPU, ~4 min).
Writes the trace under /tmp/mas_decode_trace and prints the top ops.
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def aggregate(trace_dir):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert files, f"no trace under {trace_dir}"
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # device lanes: pid whose name contains 'TPU' and thread names with XLA
    # op events carry 'dur' (us) and args with 'long_name'/'name'
    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        cat = (e.get("args") or {}).get("device_type", "")
        tid_name = e.get("name", "")
        # keep only device compute events (they carry run_id/args on TPU)
        args = e.get("args") or {}
        if "run_id" not in args and "long_name" not in args:
            continue
        by_name[tid_name] += e["dur"]
        total += e["dur"]
    # op-family totals: individual DUS/copy ops are each ~0.3% and fall
    # below the top-30 cut, but their SUM is the whole story when carry
    # aliasing breaks (the GQA regression: 1.32 s of DUS + 0.47 s of copy
    # in a 2.79 s iteration — BASELINE round 4)
    by_family = defaultdict(float)
    for name, dur in by_name.items():
        by_family[name.split(".")[0]] += dur
    return by_name, by_family, total, path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--kv-layout", default="lane")
    ap.add_argument("--kv-cache", default="int4")
    ap.add_argument("--kv-heads", type=int, default=0,
                    help="GQA trace: why do 4x-smaller cache reads bench "
                         "SLOWER end-to-end (22.98 vs 32.35 img/s)?")
    ap.add_argument("--decode-q-rows", type=int, default=1)
    ap.add_argument("--resolution", type=int, default=256,
                    choices=(256, 512),
                    help="512 = the 1408-token paper geometry (VERDICT "
                         "r4 #3: the 512^2 'cache-read-bound' claim gets "
                         "its own trace, not an analogy)")
    args = ap.parse_args()

    from bench import build_pipeline

    pipeline, tcfg = build_pipeline(args.resolution, "auto", args.kv_cache,
                                    0, False, args.kv_layout,
                                    kv_heads=args.kv_heads,
                                    q_rows=args.decode_q_rows)
    text = jnp.zeros((args.batch, tcfg.text_length), jnp.int32)
    seg = jnp.zeros((args.batch, tcfg.seg_length), jnp.int32)
    out = pipeline(text, seg, jax.random.PRNGKey(2))
    float(out.mean())                       # compile + settle
    trace_dir = "/tmp/mas_decode_trace"
    with jax.profiler.trace(trace_dir):
        out = pipeline(text, seg, jax.random.PRNGKey(3))
        float(out.mean())
    by_name, by_family, total, path = aggregate(trace_dir)
    print(f"trace: {path}")
    print(f"total device op time: {total / 1e3:.1f} ms")
    print("-- op-family totals --")
    for name, dur in sorted(by_family.items(), key=lambda kv: -kv[1])[:12]:
        print(f"{dur / 1e3:9.2f} ms  {100 * dur / total:5.1f}%  {name[:90]}")
    print("-- top individual ops --")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{dur / 1e3:9.2f} ms  {100 * dur / total:5.1f}%  {name[:90]}")


if __name__ == "__main__":
    main()
