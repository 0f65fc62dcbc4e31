"""Re-decide the 640-token attention dispatch with single-pass blocks.

Round 1 measured jnp beating the (128, 128) flash kernel at the 256²
training geometry (640 tokens) and set the auto threshold at >= 1024
tokens.  auto_blocks' blk_k = T single-pass regime changed the kernel's
cost structure at 1408 tokens (1.9x); this re-measures the full train
step at 640 tokens to keep the dispatch rule honest.

Run: python benchmarks/attn640.py  (real TPU, ~8 min)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.train_profile import bench_step, flagship, safe


def main():
    cfg640 = dict(image_tokens_per_dim=16)          # 128 + 256 + 256 = 640
    for impl in ("jnp", "pallas"):
        for remat, pol, batch in ((False, "nothing", 16),
                                  (True, "mlp", 32)):
            safe(bench_step,
                 flagship(attention_impl=impl, remat=remat,
                          remat_policy=pol, **cfg640),
                 batch, label=f"640tok {impl} remat={pol if remat else 'off'}")


if __name__ == "__main__":
    main()
