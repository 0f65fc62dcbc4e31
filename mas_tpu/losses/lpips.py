"""LPIPS perceptual loss, TPU-native (NHWC, flax).

Rebuilds the reference ``LPIPS`` (``/root/reference/losses/lpips.py:43-144``):
input scaling layer (shift/scale constants), a frozen VGG16 feature
extractor tapped at relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3,
channel-unit-normalized feature differences squared, per-layer 1x1
``NetLinLayer`` weights, spatial mean, summed over the 5 taps.

Weights: the reference downloads torchvision's ImageNet VGG16 plus the
heidelberg ``vgg.pth`` lin weights at runtime (``lpips.py:10-37``).  This
build has no network egress, so weights are an explicit input:
``load_lpips_params_from_torch(path)`` converts a combined torch state_dict
(torchvision ``features.*`` + lpips ``lin*.model.1.weight``) into the flax
param tree; absent a checkpoint, the loss still runs with random init
(useful for tests and for training dynamics that only need *a* fixed
feature net; document the deviation in run configs).

TPU notes: all convs are 3x3 NHWC with 2x2 max-pools — straight MXU work;
both images run through VGG in one batched forward (concat on batch) so the
MXU sees one large matmul stream instead of two half-size ones.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# torchvision vgg16.features conv plan: (out_channels, layers-per-block)
_VGG_PLAN: Tuple[Tuple[int, int], ...] = (
    (64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
_LPIPS_CHANNELS = (64, 128, 256, 512, 512)

_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class VGG16Features(nn.Module):
    """VGG16 `.features` trunk emitting the 5 LPIPS taps.

    Tap k is the activation after the last ReLU of block k (before the
    pool), matching the reference slice boundaries (``lpips.py:104-110``).
    """

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        taps = []
        for b, (ch, n_layers) in enumerate(_VGG_PLAN):
            for l in range(n_layers):
                x = nn.Conv(ch, (3, 3), padding=1,
                            name=f"conv{b}_{l}")(x)
                x = nn.relu(x)
            taps.append(x)
            if b < len(_VGG_PLAN) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


def _unit_normalize(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    """Channel-unit-normalize (reference ``norm_tensor``, lpips.py:127-134)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """lpips(real, fake) -> [B] per-image perceptual distances.

    The reference returns a [B,1,1,1] tensor and means it into the loss
    (``loss_img.py:81-86``); returning [B] keeps the same reduction.
    """

    @nn.compact
    def __call__(self, real: jax.Array, fake: jax.Array) -> jax.Array:
        shift = jnp.asarray(_SHIFT, jnp.float32)
        scale = jnp.asarray(_SCALE, jnp.float32)
        b = real.shape[0]
        x = jnp.concatenate([real, fake], axis=0).astype(jnp.float32)
        x = (x - shift) / scale
        taps = VGG16Features(name="vgg")(x)
        total = jnp.zeros((b,), jnp.float32)
        for i, tap in enumerate(taps):
            f = _unit_normalize(tap.astype(jnp.float32))
            diff = jnp.square(f[:b] - f[b:])                    # [B,h,w,C]
            lin = self.param(f"lin{i}", nn.initializers.ones,
                             (_LPIPS_CHANNELS[i], 1))
            # NetLinLayer: 1x1 conv, no bias == matmul over channels
            v = jnp.einsum("bhwc,co->bhwo", diff, lin)
            total = total + jnp.mean(v, axis=(1, 2, 3))          # spatial avg
        return total


# ---------------------------------------------------------------------------
# torch weight conversion
# ---------------------------------------------------------------------------

# torchvision vgg16 `features` indices of each conv layer, in block order
_TORCH_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def _conv_names() -> List[str]:
    names = []
    for b, (_, n_layers) in enumerate(_VGG_PLAN):
        for l in range(n_layers):
            names.append(f"conv{b}_{l}")
    return names


def convert_torch_lpips_state(state: Dict[str, Any]) -> Dict[str, Any]:
    """torch state_dict -> flax LPIPS params.

    Accepts keys in either the torchvision layout (``features.{i}.weight``)
    or the reference LPIPS layout (``vgg.slice{k}.{i}.weight`` +
    ``lin{k}.model.1.weight``).  Conv kernels transpose OIHW -> HWIO.
    """
    import numpy as np

    def to_np(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v)

    flat = {k: to_np(v) for k, v in state.items()}
    # normalize reference slice layout to features.{i} layout
    if any(k.startswith("vgg.slice") for k in flat):
        renamed = {}
        for k, v in flat.items():
            if k.startswith("vgg.slice"):
                # vgg.sliceN.I.weight — I is already the features index
                idx, leaf = k.split(".")[2], k.split(".")[3]
                renamed[f"features.{idx}.{leaf}"] = v
            else:
                renamed[k] = v
        flat = renamed

    params: Dict[str, Any] = {"vgg": {}}
    for name, tidx in zip(_conv_names(), _TORCH_CONV_IDX):
        w = flat[f"features.{tidx}.weight"]            # OIHW
        bias = flat[f"features.{tidx}.bias"]
        params["vgg"][name] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),  # HWIO
            "bias": jnp.asarray(bias),
        }
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        if key in flat:                                 # [1, C, 1, 1]
            params[f"lin{i}"] = jnp.asarray(
                flat[key].reshape(1, -1).transpose(1, 0))
    return params


def load_lpips_params_from_torch(path: str) -> Dict[str, Any]:
    """Load a torch checkpoint file and convert (requires the baked-in
    CPU torch only for deserialization)."""
    import torch

    state = torch.load(path, map_location="cpu")
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return convert_torch_lpips_state(state)
