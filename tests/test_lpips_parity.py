"""LPIPS: torch-replica numerical parity.

Replicates the reference LPIPS stack (``/root/reference/losses/lpips.py:
43-144``: scaling layer, torchvision-layout VGG16 `.features` trunk tapped
at the five relu block boundaries, channel-unit-normalized squared feature
diffs, 1x1 NetLin weights, spatial mean, summed) in torch, random-inits it,
converts the state_dict with ``convert_torch_lpips_state``, and checks the
flax LPIPS distance numerically.  Upgrades the LPIPS converter from
shape-checked to parity-tested (the face converter got the same in
``test_face_parity.py``)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mas_tpu.losses.lpips import (LPIPS, _SCALE, _SHIFT,  # noqa: E402
                                  _TORCH_CONV_IDX, _VGG_PLAN,
                                  convert_torch_lpips_state)


def _t_features():
    """torchvision ``vgg16().features`` layout: conv indices must equal
    ``_TORCH_CONV_IDX`` (reference slices at 4/9/16/23/30)."""
    layers = []
    in_ch = 3
    for b, (ch, n) in enumerate(_VGG_PLAN):
        for _ in range(n):
            layers += [nn.Conv2d(in_ch, ch, 3, padding=1), nn.ReLU()]
            in_ch = ch
        layers.append(nn.MaxPool2d(2, 2))
    return nn.Sequential(*layers)


class TLPIPS(nn.Module):
    """Reference forward (``lpips.py:104-144``): five relu taps,
    norm_tensor, squared diff, 1x1 lin, spatial mean, sum."""

    # relu boundary indices: tap k = features[:idx] output
    _TAPS = (4, 9, 16, 23, 30)

    def __init__(self):
        super().__init__()
        self.features = _t_features()
        self.register_buffer(
            "shift", torch.tensor(_SHIFT).view(1, 3, 1, 1))
        self.register_buffer(
            "scale", torch.tensor(_SCALE).view(1, 3, 1, 1))
        self.lins = nn.ParameterList(
            torch.nn.Parameter(torch.rand(1, c, 1, 1) + 0.5)
            for c in (64, 128, 256, 512, 512))

    @staticmethod
    def _norm(x, eps=1e-10):
        n = torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True))
        return x / (n + eps)

    def forward(self, real, fake):
        total = 0.0
        feats = []
        for x_in in (real, fake):
            h = (x_in - self.shift) / self.scale
            taps, prev = [], 0
            for idx in self._TAPS:
                h = self.features[prev:idx](h)
                taps.append(h)
                prev = idx
            feats.append(taps)
        for i in range(5):
            d = (self._norm(feats[0][i]) - self._norm(feats[1][i])) ** 2
            v = torch.nn.functional.conv2d(d, self.lins[i])
            total = total + v.mean(dim=(1, 2, 3))
        return total


def test_lpips_torch_replica_parity():
    torch.manual_seed(0)
    tmodel = TLPIPS().eval()
    state = {f"features.{i}.weight": tmodel.features[i].weight
             for i in _TORCH_CONV_IDX}
    state.update({f"features.{i}.bias": tmodel.features[i].bias
                  for i in _TORCH_CONV_IDX})
    state.update({f"lin{i}.model.1.weight": tmodel.lins[i]
                  for i in range(5)})
    params = convert_torch_lpips_state(state)

    rng = np.random.default_rng(0)
    real = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    fake = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_d = tmodel(torch.from_numpy(real).permute(0, 3, 1, 2),
                     torch.from_numpy(fake).permute(0, 3, 1, 2)).numpy()
    j_d = LPIPS().apply({"params": params}, jnp.asarray(real),
                        jnp.asarray(fake))
    np.testing.assert_allclose(np.asarray(j_d), t_d, rtol=2e-3, atol=1e-5)
    assert float(t_d.min()) > 0          # nontrivial distances compared


def test_lpips_reference_slice_layout_converts():
    """The heidelberg ``vgg.pth`` layout (``vgg.slice{k}.{i}.*``) converts
    identically to the torchvision layout."""
    torch.manual_seed(1)
    feats = _t_features()
    # slice k holds features[prev:idx] under its ORIGINAL indices
    state = {}
    for i in _TORCH_CONV_IDX:
        block = sum(i >= b for b in (4, 9, 16, 23)) + 1
        state[f"vgg.slice{block}.{i}.weight"] = feats[i].weight
        state[f"vgg.slice{block}.{i}.bias"] = feats[i].bias
    params = convert_torch_lpips_state(state)
    direct = convert_torch_lpips_state(
        {f"features.{i}.{leaf}": getattr(feats[i], leaf)
         for i in _TORCH_CONV_IDX for leaf in ("weight", "bias")})
    for a, b in zip(jax.tree_util.tree_leaves(params["vgg"]),
                    jax.tree_util.tree_leaves(direct["vgg"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
