"""Object-aware LPIPS: bbox-region gradient upweighting via ``custom_vjp``.

The reference ``LPIPSWithObject`` intends to upweight reconstruction
gradients inside object bounding boxes through a custom autograd Function,
but the weight assignment is a no-op bug — ``weight[:, x0:x1, y0:y1]`` is
sliced and never assigned (``/root/reference/losses/lpips_with_object.py:
12-26``), so it degrades to plain LPIPS.  This module implements the
*intent*: a ``jax.custom_vjp`` whose forward is the identity and whose
backward multiplies the incoming cotangent by a per-pixel weight map that is
``object_weight`` inside any object bbox and 1 elsewhere.

Ragged boxes are handled jit-natively: each image carries a fixed-size
``[M, 4]`` box array (pascal_voc ``x_min, y_min, x_max, y_max``) where
invalid slots are all-zero (zero area => no effect), matching how the data
pipeline pads (SURVEY §7 hard part (d)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_weight_map(boxes: jax.Array, height: int, width: int,
                   object_weight: float) -> jax.Array:
    """boxes [B, M, 4] float/int -> weights [B, H, W, 1].

    A pixel inside >=1 box gets ``object_weight``, else 1.  Degenerate
    (zero-area) padding boxes contribute nothing.
    """
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    bx = boxes.astype(jnp.float32)
    x0, y0, x1, y1 = (bx[..., 0], bx[..., 1], bx[..., 2], bx[..., 3])
    # [B, M, H] row coverage and [B, M, W] col coverage
    rows = (ys[None, None, :] >= y0[..., None]) & (ys[None, None, :] < y1[..., None])
    cols = (xs[None, None, :] >= x0[..., None]) & (xs[None, None, :] < x1[..., None])
    inside = jnp.any(rows[:, :, :, None] & cols[:, :, None, :], axis=1)
    w = jnp.where(inside, jnp.float32(object_weight), jnp.float32(1.0))
    return w[..., None]


@jax.custom_vjp
def scale_gradient(x: jax.Array, weights: jax.Array) -> jax.Array:
    """Identity forward; backward multiplies the cotangent by ``weights``."""
    return x


def _scale_gradient_fwd(x, weights):
    return x, weights


def _scale_gradient_bwd(weights, g):
    return g * weights.astype(g.dtype), None


scale_gradient.defvjp(_scale_gradient_fwd, _scale_gradient_bwd)


def lpips_with_object(lpips_apply, real: jax.Array, fake: jax.Array,
                      object_boxes: jax.Array,
                      object_weight: float = 2.0) -> jax.Array:
    """LPIPS with bbox gradient upweighting on the reconstruction.

    ``lpips_apply(real, fake) -> [B]`` is a bound LPIPS apply fn;
    ``object_boxes`` [B, M, 4] padded pascal_voc boxes.
    """
    b, h, w, _ = fake.shape
    wmap = box_weight_map(object_boxes, h, w, object_weight)
    fake = scale_gradient(fake, wmap)
    return lpips_apply(real, fake)
