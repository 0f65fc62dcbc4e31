"""Subprocess worker for the REAL 2-process multi-host test.

Each process owns 4 virtual CPU devices (8 global), rendezvouses through
``mas_tpu.parallel.distributed.initialize`` (the reference's
``dist.init_process_group`` analog, ``/root/reference/train.py:20-34``),
assembles its LOCAL batch rows into the global sharded array via
``shard_batch``'s ``make_array_from_process_local_data`` branch
(``parallel/mesh.py``), and drives one VQ-SEG train step.  Run by
``tests/test_multiprocess.py``; prints ``LOSS <value>`` on rank 0.

Usage: python mp_worker_seg.py <coordinator_port> <process_id> <num_procs>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")   # axon plugin ignores the env var


def main() -> None:
    port, pid, nproc = (int(a) for a in sys.argv[1:4])

    from mas_tpu.parallel.distributed import initialize, is_primary

    topo = initialize(coordinator_address=f"localhost:{port}",
                      num_processes=nproc, process_id=pid)
    assert topo["process_count"] == nproc, topo
    assert topo["global_devices"] == 4 * nproc, topo

    import numpy as np

    from mas_tpu.models import VQModel
    from mas_tpu.parallel.mesh import make_mesh, shard_batch
    from mas_tpu.train import create_vq_train_state
    from mas_tpu.train.state import make_adam
    from mas_tpu.train.steps import make_seg_train_step
    from mas_tpu.utils.config import (CodebookConfig, MeshConfig,
                                      OptimizerConfig, SegLossConfig,
                                      VQModelConfig)

    cfg = VQModelConfig(
        in_channels=8, out_channels=8, channels=(32, 32), num_res_blocks=1,
        attn_resolutions=(), resolution=16, z_channels=32, embed_dim=32,
        codebook=CodebookConfig(codebook_size=16, codebook_dim=32,
                                init_steps=2, reservoir_size=64,
                                kmeans_iters=1))
    model = VQModel(cfg)
    tx = make_adam(OptimizerConfig(lr=1e-3))
    state = create_vq_train_state(model, cfg, tx, jax.random.PRNGKey(0))
    step = make_seg_train_step(
        model, tx, loss_cfg=SegLossConfig(image_channels=8,
                                          face_channel_start=4,
                                          face_channel_end=6))
    mesh = make_mesh(MeshConfig(data=4 * nproc, model=1))

    # deterministic GLOBAL batch; each process contributes only its rows
    full = np.random.default_rng(1).integers(0, 8, (8, 16, 16))
    onehot = np.eye(8, dtype=np.float32)[full]           # [8, 16, 16, 8]
    local = onehot[pid * (8 // nproc):(pid + 1) * (8 // nproc)]
    seg = shard_batch(mesh, local)
    assert seg.shape == (8, 16, 16, 8), seg.shape        # global view

    state, metrics = step(state, seg, jax.random.PRNGKey(2))
    loss = float(metrics["loss"])
    if is_primary():
        print(f"LOSS {loss:.8f}", flush=True)
    print(f"OK process={pid} loss={loss:.8f}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
