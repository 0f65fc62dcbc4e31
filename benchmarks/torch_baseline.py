"""PyTorch baseline for bench.py: the reference-architecture sampling
pipeline (AR decode with KV cache + CFG batch-doubling + VQ decoder),
written independently in idiomatic torch (the reference repo has *no*
sampler — SURVEY intro — so this supplies the same workload the JAX
pipeline runs, for a same-host throughput comparison).

torch in this image is CPU-only; results are cached to
``torch_baseline_result.json`` (committed) so bench.py doesn't re-measure
every round.  Per-step decode cost is measured over a few steps and
extrapolated to the full image; the VQ decoder forward is measured once.
"""

from __future__ import annotations

import json
import math
import os
import time

import torch
import torch.nn as nn

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "torch_baseline_result.json")


class TorchLayer(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.d, self.heads = d, heads
        self.ln_in = nn.LayerNorm(d)
        self.ln_out = nn.LayerNorm(d)
        self.ln_s1 = nn.LayerNorm(d)
        self.ln_s2 = nn.LayerNorm(d)
        self.qkv = nn.Linear(d, 3 * d)
        self.proj = nn.Linear(d, d)
        self.lin1 = nn.Linear(d, 4 * d)
        self.lin2 = nn.Linear(4 * d, d)

    def decode(self, x, cache):
        b = x.shape[0]
        h = self.ln_in(x)
        q, k, v = self.qkv(h).chunk(3, dim=-1)

        def heads(t):
            return t.view(b, -1, self.heads, self.d // self.heads
                          ).transpose(1, 2)

        q, k, v = heads(q), heads(k), heads(v)
        if cache is not None:
            k = torch.cat([cache[0], k], dim=2)
            v = torch.cat([cache[1], v], dim=2)
        scale = 1.0 / math.sqrt(self.d // self.heads)
        att = torch.softmax(q @ k.transpose(-1, -2) * scale, dim=-1)
        ctx = (att @ v).transpose(1, 2).reshape(b, -1, self.d)
        x = x + self.ln_s1(self.proj(ctx))
        x = x + self.ln_s2(self.lin2(torch.nn.functional.gelu(
            self.lin1(self.ln_out(x)), approximate="tanh")))
        return x, (k, v)


class TorchAR(nn.Module):
    def __init__(self, layers, d, heads, vocab):
        super().__init__()
        self.layers = nn.ModuleList(TorchLayer(d, heads)
                                    for _ in range(layers))
        self.embed = nn.Embedding(vocab, d)
        self.final_ln = nn.LayerNorm(d)
        self.head = nn.Sequential(nn.LayerNorm(d), nn.Linear(d, vocab))

    @torch.no_grad()
    def prefill(self, tokens):
        x = self.embed(tokens)
        caches = []
        for layer in self.layers:
            x, kv = layer.decode(x, None)
            caches.append(kv)
        return self.head(self.final_ln(x[:, -1:]))[:, 0], caches

    @torch.no_grad()
    def decode_one(self, tok, caches):
        x = self.embed(tok)
        new = []
        for layer, kv in zip(self.layers, caches):
            x, kv2 = layer.decode(x, kv)
            new.append(kv2)
        return self.head(self.final_ln(x))[:, 0], new


class TorchResBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.n1 = nn.GroupNorm(32, cin, eps=1e-6)
        self.c1 = nn.Conv2d(cin, cout, 3, 1, 1)
        self.n2 = nn.GroupNorm(32, cout, eps=1e-6)
        self.c2 = nn.Conv2d(cout, cout, 3, 1, 1)
        self.sc = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.c1(torch.nn.functional.silu(self.n1(x)))
        h = self.c2(torch.nn.functional.silu(self.n2(h)))
        if self.sc is not None:
            x = self.sc(x)
        return x + h


class TorchVQDecoder(nn.Module):
    """Mirror of the decoder topology (channels [128,128,128,256,512,512],
    3 res blocks/stage + attn at bottleneck omitted for baseline speed —
    slight *advantage* to torch)."""

    def __init__(self, z=256, channels=(128, 128, 128, 256, 512, 512),
                 out=3):
        super().__init__()
        ch_mult = list(channels[1:])
        blocks = [nn.Conv2d(z, ch_mult[-1], 3, 1, 1),
                  TorchResBlock(ch_mult[-1], ch_mult[-1]),
                  TorchResBlock(ch_mult[-1], ch_mult[-1])]
        cin = ch_mult[-1]
        for i in reversed(range(len(ch_mult))):
            for _ in range(3):
                blocks.append(TorchResBlock(cin, ch_mult[i]))
                cin = ch_mult[i]
            if i > 0:
                blocks.append(nn.Upsample(scale_factor=2, mode="nearest"))
                blocks.append(nn.Conv2d(cin, cin, 3, 1, 1))
        blocks += [nn.GroupNorm(32, cin, eps=1e-6), nn.SiLU(),
                   nn.Conv2d(cin, out, 3, 1, 1)]
        self.model = nn.Sequential(*blocks)

    @torch.no_grad()
    def forward(self, x):
        return self.model(x)


def measure(layers=24, d=1024, heads=16, vocab=8192, prefix=384,
            image_tokens=256, batch=2, probe_steps=4, latent=16):
    """Returns torch-CPU images/sec for the CFG sampling pipeline."""
    torch.manual_seed(0)
    model = TorchAR(layers, d, heads, vocab).eval()
    bb = batch * 2  # CFG batch doubling
    toks = torch.randint(0, vocab, (bb, prefix))

    t0 = time.time()
    logits, caches = model.prefill(toks)
    prefill_s = time.time() - t0

    tok = torch.randint(0, vocab, (bb, 1))
    # warm one step
    _, caches = model.decode_one(tok, caches)
    t0 = time.time()
    for _ in range(probe_steps):
        _, caches = model.decode_one(tok, caches)
    per_step = (time.time() - t0) / probe_steps
    ar_total = prefill_s + per_step * image_tokens

    dec = TorchVQDecoder().eval()
    zq = torch.randn(batch, 256, latent, latent)
    t0 = time.time()
    dec(zq)
    vq_s = time.time() - t0

    total = ar_total + vq_s
    ips = batch / total
    return dict(images_per_sec=ips, batch=batch, prefill_s=prefill_s,
                per_step_s=per_step, vq_decode_s=vq_s,
                layers=layers, hidden=d, image_tokens=image_tokens,
                device="cpu", torch_version=torch.__version__)


def get_baseline(force=False, resolution: int = 256):
    """Per-geometry cached baseline: 256² (256 image tokens) or the 512²
    paper geometry (1024 image tokens, 32² latent) — bench.py's
    ``vs_baseline`` must compare like with like."""
    cache = (CACHE if resolution == 256
             else CACHE.replace(".json", f"_{resolution}.json"))
    if not force and os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)
    kw = {} if resolution == 256 else dict(image_tokens=1024, latent=32)
    result = measure(**kw)
    result["resolution"] = resolution
    with open(cache, "w") as f:
        json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    import sys
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    print(json.dumps(get_baseline(force=True, resolution=res), indent=1))
