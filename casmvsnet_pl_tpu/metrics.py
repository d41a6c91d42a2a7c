"""Depth-map metrics.

Parity with /root/reference/metrics.py: masked absolute error and
acc@threshold (fraction of masked pixels with |error| < t). Exposed both as
masked means (train logging) and as (sum, count) pairs so validation can
aggregate pixel-weighted across batches and devices exactly like the
reference's sum-then-divide protocol (/root/reference/train.py:149-163).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def abs_error(depth_pred: Array, depth_gt: Array, mask: Array) -> Array:
    """Per-pixel |pred - gt| with zeros outside the mask. Shapes match inputs."""
    err = jnp.abs(depth_pred.astype(jnp.float32) - depth_gt.astype(jnp.float32))
    return jnp.where(mask, err, 0.0)


def abs_error_mean(depth_pred: Array, depth_gt: Array, mask: Array) -> Array:
    count = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    return jnp.sum(abs_error(depth_pred, depth_gt, mask)) / count


def acc_threshold_mean(depth_pred: Array, depth_gt: Array, mask: Array,
                       threshold: float) -> Array:
    """Fraction of masked pixels with error < threshold."""
    err = abs_error(depth_pred, depth_gt, mask)
    hit = jnp.where(mask, (err < threshold).astype(jnp.float32), 0.0)
    count = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    return jnp.sum(hit) / count


def metric_sums(depth_pred: Array, depth_gt: Array, mask: Array,
                thresholds=(1.0, 2.0, 4.0)) -> dict[str, Array]:
    """Pixel-weighted sums for validation aggregation.

    Returns {'abs_err_sum', 'acc_<t>mm_sum'..., 'mask_sum'}; divide the sums
    by mask_sum after summing over batches/devices (psum on the data axis).
    """
    err = abs_error(depth_pred, depth_gt, mask)
    out = {"abs_err_sum": jnp.sum(err),
           "mask_sum": jnp.sum(mask.astype(jnp.float32))}
    for t in thresholds:
        hit = jnp.where(mask, (err < t).astype(jnp.float32), 0.0)
        out[f"acc_{int(t)}mm_sum"] = jnp.sum(hit)
    return out
