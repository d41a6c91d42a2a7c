"""Bilinear image sampling on TPU (XLA gather formulation).

This is the TPU replacement for the reference's hot CUDA kernel
``F.grid_sample(mode='bilinear', padding_mode='zeros', align_corners=True)``
(/root/reference/models/modules.py:87-89). Coordinates here are kept in
*unnormalized* pixel space — the reference normalizes to [-1, 1] only because
torch's API demands it; align_corners=True makes the two exactly equivalent.

Semantics matched exactly:
  - 4-tap bilinear interpolation from floor/ceil neighbors;
  - each out-of-bounds tap contributes zero (zeros padding is per-tap, so a
    coordinate half-outside the image still gets partial contributions);
  - coordinate math in float32.

The XLA formulation flattens the spatial grid and issues one row-gather per
tap; gathers of contiguous C-vectors lower to efficient dynamic-gathers on
TPU. A fused Pallas plane-sweep kernel (warp + sample + cost accumulation)
lives in ``ops.plane_sweep`` and uses this as its reference implementation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def grid_sample(feat: Array, xy: Array) -> Array:
    """Sample one feature map at fractional pixel coordinates.

    Args:
      feat: (H, W, C) source feature map (any float dtype).
      xy:   (..., 2) pixel coordinates (x, y), float.
    Returns:
      (..., C) sampled features in feat.dtype.
    """
    H, W, C = feat.shape
    out_shape = xy.shape[:-1] + (C,)
    xy = xy.reshape(-1, 2).astype(jnp.float32)
    x, y = xy[:, 0], xy[:, 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0            # weight of the right tap
    wy1 = y - y0            # weight of the bottom tap
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    flat = feat.reshape(H * W, C)

    def tap(yi, xi, wgt):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        vals = jnp.take(flat, idx, axis=0)                     # (N, C)
        w = jnp.where(valid, wgt, 0.0).astype(feat.dtype)
        return vals * w[:, None]

    out = (tap(y0i, x0i, wy0 * wx0) + tap(y0i, x1i, wy0 * wx1) +
           tap(y1i, x0i, wy1 * wx0) + tap(y1i, x1i, wy1 * wx1))
    return out.reshape(out_shape)


def grid_sample_batched(feat: Array, xy: Array) -> Array:
    """vmap of :func:`grid_sample` over a leading batch axis.

    feat: (B, H, W, C); xy: (B, ..., 2) -> (B, ..., C).
    """
    return jax.vmap(grid_sample)(feat, xy)
