"""One-off migration: round-4 pickle scene pools -> the v2 .npy pool format.

Round 4 cached two 512² scene pools as pickles under /tmp/mas_scene_pool
(8.6 GB each, 40+ CPU-min to regenerate on this 1-vCPU host).  Round 5
replaced the pickle cache with a versioned directory of plain .npy files
in a user-owned cache dir (ADVICE r4: never pickle.load from a world-
writable path).  This script rewrites OUR OWN surviving pickles — created
by this repo in this round's session lineage, the one legitimate load —
into the new format, via the same ``_save_pool`` the generator uses.

Usage: python benchmarks/migrate_pool_pkl.py /tmp/mas_scene_pool/<name>.pkl
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from mas_tpu.data.dataset import StructuredSceneBatches

    dst_dir = os.environ.get(
        "MAS_POOL_CACHE", os.path.expanduser("~/.cache/mas_tpu/scene_pool"))
    for src in sys.argv[1:]:
        m = re.match(r"scenes_r(\d+)_n(\d+)_s(\d+)_m(\d+)\.pkl$",
                     os.path.basename(src))
        if not m:
            raise SystemExit(f"unrecognized pool filename: {src}")
        res, n, seed, boxes = map(int, m.groups())
        ds = StructuredSceneBatches(1, res, seed=seed, max_boxes=boxes,
                                    cache_scenes=n, pool_cache_dir=dst_dir)
        dst = ds._pool_path()
        if os.path.isdir(dst):
            print(f"already migrated: {dst}")
            continue
        import pickle
        print(f"loading {src} ...", flush=True)
        with open(src, "rb") as f:
            scenes = pickle.load(f)
        assert len(scenes) == n, (len(scenes), n)
        print(f"writing {dst} ...", flush=True)
        ds._save_pool(scenes)
        print("ok", flush=True)


if __name__ == "__main__":
    main()
