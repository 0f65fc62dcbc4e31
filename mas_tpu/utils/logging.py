"""Observability: scalar/image logging + seg-map visualization.

Rebuilds the reference ``Logger``/``Visualizer`` (``/root/reference/
log_utils.py``) host-side:

  * ``Logger`` — rank-0-only (``jax.process_index() == 0``) scalar logging
    to TensorBoard (torch's ``SummaryWriter`` is baked in) with a JSONL
    fallback, plus paired input‖reconstruction image grids every
    ``image_period`` steps (reference logs every 500, ``log_utils.py:24``),
  * ``Visualizer`` — colorizes the 159-channel seg tensor per group
    (panoptic [0,133), human [133,153), face [153,158), edge [158,159) —
    ``log_utils.py:33-38``) through fixed random 1x1 RGB projections,
    per-group min-max normalized; reconstructed *logits* are argmax-one-hot
    re-encoded, with a ``sigmoid > 0.2`` mask for the face/edge groups
    (``log_utils.py:58-68``); grids saved as jpg via PIL.

Device arrays are pulled with ``jax.device_get`` once per log call — the
only host↔device crossings in the train loop (SURVEY §3.1 notes the
reference does ``.item()/.cpu()`` in the same place).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np

SEG_GROUPS = {
    "panoptic": (0, 133),
    "human": (133, 153),
    "face": (153, 158),
    "edge": (158, 159),
}


class Logger:
    """Scalar + image logger; no-op on non-zero processes."""

    def __init__(self, log_dir: str = "logs", process_index: int = 0,
                 image_period: int = 500, use_tensorboard: bool = True):
        self.process_index = process_index
        self.image_period = image_period
        self.step = 0
        self.writer = None
        self._jsonl = None
        if process_index != 0:
            return
        os.makedirs(log_dir, exist_ok=True)
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.writer = SummaryWriter(log_dir)
            except Exception:                        # noqa: BLE001
                self.writer = None
        if self.writer is None:
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def log(self, step: Optional[int] = None, img=None, img_rec=None,
            **scalars) -> None:
        if self.process_index != 0:
            return
        self.step = step if step is not None else self.step + 1
        vals = {k: float(np.asarray(v)) for k, v in scalars.items()}
        if self.writer is not None:
            for key, val in vals.items():
                self.writer.add_scalar(key, val, self.step)
        else:
            self._jsonl.write(json.dumps(
                {"step": self.step, "time": time.time(), **vals}) + "\n")
            self._jsonl.flush()
        if (img is not None and img_rec is not None
                and self.step % self.image_period == 0):
            grid = make_grid(np.concatenate(
                [np.asarray(img), np.asarray(img_rec)], axis=0))
            if self.writer is not None:
                self.writer.add_image("samples", grid.transpose(2, 0, 1),
                                      global_step=self.step)
            else:
                save_image(grid, os.path.join(
                    os.path.dirname(self._jsonl.name),
                    f"samples_{self.step}.jpg"))

    def close(self):
        if self.writer is not None:
            self.writer.close()
        if self._jsonl is not None:
            self._jsonl.close()


def make_grid(images: np.ndarray, nrow: int = 8,
              pad: int = 2) -> np.ndarray:
    """[N, H, W, C] in [0,1] -> one [H', W', C] grid (torchvision
    ``make_grid`` equivalent, NHWC)."""
    n, h, w, c = images.shape
    ncol = min(nrow, n)
    nr = (n + ncol - 1) // ncol
    grid = np.zeros((nr * (h + pad) + pad, ncol * (w + pad) + pad, c),
                    np.float32)
    for i in range(n):
        r, col = divmod(i, ncol)
        y, x = pad + r * (h + pad), pad + col * (w + pad)
        grid[y:y + h, x:x + w] = images[i]
    return np.clip(grid, 0.0, 1.0)


def save_image(grid: np.ndarray, path: str) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray((grid * 255).astype(np.uint8).squeeze()).save(path)


class Visualizer:
    """159-channel seg tensor -> RGB, per-group random projections."""

    def __init__(self, out_dir: str = "results", seed: int = 0):
        self.out_dir = out_dir
        rng = np.random.default_rng(seed)
        self.weights = {
            key: rng.standard_normal((hi - lo, 3)).astype(np.float32)
            for key, (lo, hi) in SEG_GROUPS.items()}
        os.makedirs(out_dir, exist_ok=True)

    def colorize(self, seg: np.ndarray, logits: bool = False) -> Dict[
            str, np.ndarray]:
        """seg [B, H, W, 159] -> {group: [B, H, W, 3] in [0, 1]}."""
        seg = np.asarray(seg, np.float32)
        out = {}
        for key, (lo, hi) in SEG_GROUPS.items():
            part = seg[..., lo:hi]
            if logits:
                n_cls = part.shape[-1]
                if key in ("face", "edge"):
                    mask = (1.0 / (1.0 + np.exp(-part)) > 0.2)
                idx = np.argmax(part, axis=-1)
                part = np.eye(n_cls, dtype=np.float32)[idx]
                if key in ("face", "edge"):
                    part = part * mask
            x = part @ self.weights[key]
            span = x.max() - x.min()
            x = (x - x.min()) / (span + 1e-8)
            out[key] = x
        return out

    def __call__(self, step: int, image: Optional[np.ndarray] = None,
                 seg: Optional[np.ndarray] = None,
                 seg_rec: Optional[np.ndarray] = None) -> str:
        """Save a panel jpg: [image | seg groups | seg_rec groups]."""
        panels = []
        if image is not None:
            panels.append(np.asarray(image, np.float32))
        if seg is not None:
            panels.extend(self.colorize(seg).values())
        if seg_rec is not None:
            panels.extend(self.colorize(seg_rec, logits=True).values())
        flat = np.concatenate(panels, axis=0)
        if flat.shape[-1] == 159:                     # no RGB image passed
            raise ValueError("colorize before stacking")
        path = os.path.join(self.out_dir, f"result_{step}.jpg")
        save_image(make_grid(flat, nrow=len(panels)), path)
        return path
