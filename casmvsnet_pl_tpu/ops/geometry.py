"""Pure-JAX multi-view geometry ops.

These fix the numerics of the whole framework: plane-sweep homography
projection, depth-hypothesis windows and soft-argmax depth regression.

Capability parity targets (behavior, not code) in the reference repo:
  - /root/reference/models/modules.py:34-49  (get_depth_values)
  - /root/reference/models/modules.py:52-92  (homo_warp)
  - /root/reference/models/modules.py:95-104 (depth_regression)

Everything here is shape-static, jit-able and vmap-able; coordinate math is
kept in float32 even when features are bfloat16 (mixed precision on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> Array:
    """Homogeneous pixel grid of a feature map.

    Returns (3, H*W): rows are (x, y, 1) in *unnormalized* pixel coordinates,
    x in [0, W-1], y in [0, H-1], raster order (row-major over H then W).
    """
    xs = jnp.arange(width, dtype=dtype)
    ys = jnp.arange(height, dtype=dtype)
    x, y = jnp.meshgrid(xs, ys, indexing="xy")  # each (H, W)
    ones = jnp.ones_like(x)
    return jnp.stack([x, y, ones], axis=0).reshape(3, height * width)


def project_to_src(proj_mat: Array, depth_values: Array,
                   height: int, width: int) -> Array:
    """Plane-sweep projection of the reference pixel grid into a source view.

    For every depth hypothesis d and reference pixel p = (x, y, 1):
        q = R @ p + T / d          (R = proj_mat[:, :3], T = proj_mat[:, 3])
        xy_src = q[:2] / q[2]
    Pixels whose projected depth q[2] <= 1e-7 (behind the source camera) are
    sent to (W, H), i.e. outside the image so the sampler returns zeros —
    matching the reference's negative-depth masking trick
    (/root/reference/models/modules.py:76-79).

    Args:
      proj_mat: (3, 4) src_proj @ ref_proj_inv for this pyramid level.
      depth_values: (D, H, W) depth hypothesis per pixel.
    Returns:
      (D, H, W, 2) unnormalized source-pixel coordinates (x, y), float32.
    """
    f32 = jnp.float32
    proj_mat = proj_mat.astype(f32)
    d = depth_values.reshape(depth_values.shape[0],
                             height * width).astype(f32)      # (D, HW)
    R = proj_mat[:, :3]                               # (3, 3)
    T = proj_mat[:, 3]                                # (3,)
    grid = pixel_grid(height, width, f32)             # (3, H*W)
    rotated = R @ grid                                # (3, H*W)
    # q = R@p + T/d; xy = q01/q2, behind-camera iff q2 <= 1e-7. Multiply
    # through by d (> 0 after hypothesis clamping): num = (R@p)*d + T gives
    # the same ratios with ONE reciprocal instead of two divisions and no
    # (3, D, HW) stack materialization (VPU-bound fusion, measured).
    nx = rotated[0][None] * d + T[0]                  # (D, HW)
    ny = rotated[1][None] * d + T[1]
    nz = rotated[2][None] * d + T[2]
    behind = nz <= 1e-7 * d                           # == (q2 <= 1e-7)
    rden = 1.0 / jnp.where(behind, 1.0, nz)
    x = jnp.where(behind, f32(width), nx * rden)
    y = jnp.where(behind, f32(height), ny * rden)
    D = d.shape[0]
    return jnp.stack([x, y], axis=-1).reshape(D, height, width, 2)


def get_depth_values(current_depth: Array, n_depths: int,
                     depth_interval: Array | float) -> Array:
    """Window of depth hypotheses centered on the current depth estimate.

    depth_min = max(current - n_depths/2 * interval, 1e-7); values are
    depth_min + interval * [0..n_depths) — same window/clamp semantics as the
    reference (/root/reference/models/modules.py:34-49).

    Args:
      current_depth: (B, H, W) current depth map.
      depth_interval: scalar or (B,) per-sample interval.
    Returns:
      (B, D, H, W).
    """
    current_depth = current_depth.astype(jnp.float32)
    interval = jnp.asarray(depth_interval, jnp.float32)
    if interval.ndim == 1:
        interval = interval[:, None, None]            # (B, 1, 1)
    else:
        interval = interval.reshape((1, 1, 1))        # scalar -> broadcastable
    depth_min = jnp.clip(current_depth - n_depths / 2 * interval, min=1e-7)
    steps = jnp.arange(n_depths, dtype=jnp.float32)   # (D,)
    # (B, 1, H, W) + (B|1, 1, 1, 1) * (D, 1, 1) -> (B, D, H, W)
    return depth_min[:, None] + interval[:, None] * steps[None, :, None, None]


def initial_depth_values(depth_min: Array | float, depth_interval: Array | float,
                         n_depths: int, batch: int, height: int,
                         width: int) -> Array:
    """Uniform depth sweep for the coarsest cascade level.

    values = depth_min + interval * [0..D); broadcast to (B, D, H, W). Accepts
    scalars (eval path) or per-sample (B,) arrays (train path), unifying the
    reference's two code paths (/root/reference/models/mvsnet.py:213-229).
    """
    dmin = jnp.broadcast_to(jnp.asarray(depth_min, jnp.float32), (batch,))
    dint = jnp.broadcast_to(jnp.asarray(depth_interval, jnp.float32), (batch,))
    steps = jnp.arange(n_depths, dtype=jnp.float32)
    vals = dmin[:, None] + dint[:, None] * steps[None]        # (B, D)
    return jnp.broadcast_to(vals[:, :, None, None], (batch, n_depths, height, width))


def depth_regression(prob: Array, depth_values: Array) -> Array:
    """Soft-argmax expected depth: sum_d p_d * d_d.

    prob: (B, D, H, W) softmax probabilities; depth_values: (B, D, H, W) or (D,).
    Returns (B, H, W) in depth_values' dtype (accumulated in float32).
    """
    if depth_values.ndim == 1:
        depth_values = depth_values[None, :, None, None]
    acc = jnp.sum(prob.astype(jnp.float32) * depth_values.astype(jnp.float32),
                  axis=1)
    return acc.astype(depth_values.dtype)


@functools.lru_cache(maxsize=64)
def _resize_weights(in_size: int, out_size: int):
    """Dense (out, in) bilinear interpolation matrix, align_corners=True.

    Returns a host numpy array: caching a jnp array here would capture a
    tracer when first materialized inside a jit trace and poison later
    traces (UnexpectedTracerError); numpy constants are trace-safe.
    """
    import numpy as np
    if out_size == 1 or in_size == 1:
        w = np.zeros((out_size, in_size), np.float32)
        w[:, 0] = 1.0
        return w
    src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 2)
    frac = (src - lo).astype(np.float32)
    w = np.zeros((out_size, in_size), np.float32)
    w[np.arange(out_size), lo] = 1.0 - frac
    w[np.arange(out_size), lo + 1] = frac
    return w


def resize_bilinear(x: Array, out_hw: tuple[int, int]) -> Array:
    """Bilinear resize with align_corners=True semantics, channels-last.

    Implemented as two dense matmuls (separable interpolation) so it maps onto
    the MXU instead of a gather — the TPU-native replacement for the
    reference's F.interpolate(align_corners=True) upsampling
    (/root/reference/models/mvsnet.py:36-38,232-234).

    x: (..., H, W, C) -> (..., out_h, out_w, C).
    """
    h, w = x.shape[-3], x.shape[-2]
    out_h, out_w = out_hw
    if (h, w) == (out_h, out_w):
        return x
    wy = jnp.asarray(_resize_weights(h, out_h), x.dtype)   # (out_h, h)
    wx = jnp.asarray(_resize_weights(w, out_w), x.dtype)   # (out_w, w)
    # float32 inputs (depth maps) keep full MXU precision; bfloat16 feature
    # maps use the native bf16 MXU path — HIGHEST on bf16 would trigger the
    # multi-pass f32-emulation and dominate FeatureNet time
    hi = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
          else jax.lax.Precision.DEFAULT)
    x = jnp.einsum("oh,...hwc->...owc", wy, x, precision=hi)
    x = jnp.einsum("ow,...hwc->...hoc", wx, x, precision=hi)
    return x


def upsample2x(x: Array) -> Array:
    """x2 bilinear upsample (align_corners=True), channels-last (..., H, W, C)."""
    return resize_bilinear(x, (2 * x.shape[-3], 2 * x.shape[-2]))
