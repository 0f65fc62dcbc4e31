"""mas_tpu — a TPU-native (JAX / XLA / Pallas / pjit) Make-A-Scene framework.

A from-scratch rebuild of the capabilities of the reference PyTorch
implementation (CasualGANPapers/Make-A-Scene) designed TPU-first:

* NHWC conv layouts, bf16 compute / fp32 params,
* Pallas kernels for the hot primitives (fused GroupNorm+Swish, fused
  VQ L2-distance+argmin, blockwise flash attention + KV-cache decode),
* SPMD parallelism via ``jax.sharding.Mesh`` + ``jit``/``shard_map``
  (data / model axes) instead of NCCL DDP,
* functional train steps (optax) with the codebook phase machine carried
  as explicit state,
* orbax checkpoints (params + both optimizer states + step + codebook
  counter/reservoir) with a PyTorch-layout importer.

Pipeline stages (reference parity):
  1. VQ-SEG  — VQ-VAE over 159-channel one-hot segmentation maps.
  2. VQ-IMG  — VQGAN over RGB (L1 + LPIPS + PatchGAN + face loss).
  3. MakeAScene AR transformer over [text | seg | image] tokens, with a
     classifier-free-guidance sampler (absent in the reference).
"""

__version__ = "0.1.0"

from . import eval as evaluation  # noqa: E402  (recon metrics, FID, codebook stats)
