"""Face-feature loss (paper §3.3), TPU-native.

Rebuilds the reference ``FaceLoss`` (``/root/reference/losses/face_loss.py``):
crop each face bbox from image & reconstruction, Resize(256)+CenterCrop(254),
run a frozen VGGFace2 ResNet50 (Bottleneck layers [3,4,6,3]), tap 5 features
(conv1 pre-BN output, layer1..layer4 — ``face_loss.py:104-121``), and sum
``alpha_i * |f_gt - f_rec|`` with ``alphas = [0.1, 0.0025, 0.025, 0.05,
0.005]`` (``face_loss.py:62``), reduced as sum-over-faces, mean-over-CHW
(``face_loss.py:133-136``).  Returns 0 when no faces (``face_loss.py:130``).

Jit-native ragged handling (SURVEY §7 hard part (d)): faces arrive as a
fixed-size ``[B, M, 4]`` padded bbox array + implicit validity (zero-area
box == invalid).  Crop + Resize(256) + CenterCrop(254) collapse into ONE
bilinear ``scale_and_translate`` per face — no dynamic shapes, so the whole
loss jits and the face count is handled by masking.  The face cap
(``max_faces``, OOM guard) is the padded width M itself.

Deviation from the reference, deliberate: the reference truncates the
*concatenated* [gt; gen] face stack to 6 (``faces[:6]``), which misaligns
gt/gen pairs whenever there are >3 faces — we cap per-pair instead.

Weights: frozen VGGFace2 weights are converted from a user-supplied torch
checkpoint via ``load_face_params_from_torch`` (zero-egress build; random
init otherwise — fine for tests).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

ALPHAS = (0.1, 0.25 * 0.01, 0.25 * 0.1, 0.25 * 0.2, 0.25 * 0.02)
FACE_SIZE = 254
_RESIZE = 256


class Bottleneck(nn.Module):
    """ResNet bottleneck, stride on the first 1x1 conv (VGGFace2 variant,
    reference ``face_loss.py:19-54``)."""

    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=jnp.float32, name=name)
        residual = x
        h = nn.Conv(self.planes, (1, 1), strides=self.stride, use_bias=False,
                    name="conv1")(x)
        h = nn.relu(bn("bn1")(h))
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    name="conv2")(h)
        h = nn.relu(bn("bn2")(h))
        h = nn.Conv(self.planes * 4, (1, 1), use_bias=False, name="conv3")(h)
        h = bn("bn3")(h)
        if self.downsample:
            residual = nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                               use_bias=False, name="down_conv")(x)
            residual = bn("down_bn")(residual)
        return nn.relu(h + residual)


class FaceNet(nn.Module):
    """VGGFace2 ResNet50 trunk emitting the 5 loss taps."""

    layers: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jax.Array]:
        taps = []
        h = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1")(x)
        taps.append(h)                      # pre-BN tap (face_loss.py:106-107)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn1")(h)
        h = nn.relu(h)
        # torch MaxPool2d(3, stride 2, pad 0, ceil_mode=True)
        h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)),
                    constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        for i, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers)):
            stride = 1 if i == 0 else 2
            h = Bottleneck(planes, stride=stride, downsample=True,
                           name=f"layer{i + 1}_0")(h, train)
            for b in range(1, blocks):
                h = Bottleneck(planes, name=f"layer{i + 1}_{b}")(h, train)
            taps.append(h)
        return taps


def crop_resize_face(img: jax.Array, box: jax.Array,
                     out_size: int = FACE_SIZE) -> jax.Array:
    """Crop ``box`` (pascal_voc x0,y0,x1,y1) from ``img`` [H, W, C] and apply
    Resize(smaller-edge=256) + CenterCrop(254) as ONE bilinear resample.

    Output pixel i maps to source row  y0 + i/s + h_box/2 - 127/s  with
    s = 256 / min(h_box, w_box)  (same for columns) — algebraically identical
    to torchvision crop->Resize->CenterCrop up to resampling kernel.
    """
    bx = box.astype(jnp.float32)
    x0, y0, x1, y1 = bx[0], bx[1], bx[2], bx[3]
    h_box = jnp.maximum(y1 - y0, 1.0)
    w_box = jnp.maximum(x1 - x0, 1.0)
    s = _RESIZE / jnp.minimum(h_box, w_box)
    half = out_size / 2.0
    # scale_and_translate: in-coord u -> out-coord o = s*u + t
    ty = half - s * (y0 + h_box / 2.0)
    tx = half - s * (x0 + w_box / 2.0)
    return jax.image.scale_and_translate(
        img.astype(jnp.float32), (out_size, out_size, img.shape[-1]),
        (0, 1), jnp.stack([s, s]), jnp.stack([ty, tx]),
        method="bilinear")


def gather_faces(images: jax.Array, boxes: jax.Array):
    """images [B, H, W, C], boxes [B, M, 4] -> (faces [B*M, 254, 254, C],
    valid [B*M]).  Zero-area boxes are invalid."""
    b, m = boxes.shape[:2]

    def per_image(img, img_boxes):
        return jax.vmap(lambda bx: crop_resize_face(img, bx))(img_boxes)

    faces = jax.vmap(per_image)(images, boxes)          # [B, M, S, S, C]
    faces = faces.reshape(b * m, FACE_SIZE, FACE_SIZE, images.shape[-1])
    area = ((boxes[..., 2] - boxes[..., 0])
            * (boxes[..., 3] - boxes[..., 1])).reshape(b * m)
    return faces, (area > 0)


def face_loss(facenet_apply, images: jax.Array, recon: jax.Array,
              boxes: jax.Array) -> jax.Array:
    """Full face loss.  ``facenet_apply(x) -> list of 5 taps``;
    ``boxes`` [B, M, 4] padded (M = max_faces)."""
    faces_gt, valid = gather_faces(images, boxes)
    faces_gen, _ = gather_faces(recon, boxes)
    n = faces_gt.shape[0]
    # one batched forward for both streams (gt first — reference chunk(2))
    taps = facenet_apply(jnp.concatenate([faces_gt, faces_gen], axis=0))
    mask = valid.astype(jnp.float32)
    total = jnp.zeros((), jnp.float32)
    for alpha, tap in zip(ALPHAS, taps):
        diff = jnp.abs(tap[:n].astype(jnp.float32)
                       - tap[n:].astype(jnp.float32))    # [N, h, w, c]
        # sum over faces, mean over feature dims (face_loss.py:136)
        per_face = jnp.mean(diff, axis=(1, 2, 3))
        total = total + alpha * jnp.sum(per_face * mask)
    # no-face batches contribute exactly 0 (mask all-zero)
    return total


# ---------------------------------------------------------------------------
# torch weight conversion (VGGFace2-pytorch resnet50 state_dict)
# ---------------------------------------------------------------------------

def convert_torch_face_state(state: Dict[str, Any]) -> Dict[str, Any]:
    """torch ``face_loss_weights.pt`` layout -> (params, batch_stats)."""
    import numpy as np

    def np_of(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v)

    flat = {k: np_of(v) for k, v in state.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(leaf)

    for key, val in flat.items():
        parts = key.split(".")
        if parts[0] == "conv1":
            put(params, ("conv1", "kernel"), val.transpose(2, 3, 1, 0))
        elif parts[0] == "bn1":
            _put_bn(put, params, stats, ("bn1",), parts[1], val)
        elif parts[0].startswith("layer"):
            lname = f"{parts[0]}_{parts[1]}"
            rest = parts[2:]
            if rest[0] == "downsample":
                sub = "down_conv" if rest[1] == "0" else "down_bn"
                if sub == "down_conv":
                    put(params, (lname, sub, "kernel"),
                        val.transpose(2, 3, 1, 0))
                else:
                    _put_bn(put, params, stats, (lname, sub), rest[2], val)
            elif rest[0].startswith("conv"):
                put(params, (lname, rest[0], "kernel"),
                    val.transpose(2, 3, 1, 0))
            elif rest[0].startswith("bn"):
                _put_bn(put, params, stats, (lname, rest[0]), rest[1], val)
    return {"params": params, "batch_stats": stats}


def _put_bn(put, params, stats, path, leaf, val):
    if leaf == "weight":
        put(params, path + ("scale",), val)
    elif leaf == "bias":
        put(params, path + ("bias",), val)
    elif leaf == "running_mean":
        put(stats, path + ("mean",), val)
    elif leaf == "running_var":
        put(stats, path + ("var",), val)


def load_face_params_from_torch(path: str) -> Dict[str, Any]:
    import torch

    state = torch.load(path, map_location="cpu")
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return convert_torch_face_state(state)
