"""Training objectives.

Parity with /root/reference/losses.py: multi-scale masked SmoothL1 (beta=1)
over the cascade levels, weighted 2^(1-l) (2, 1, 0.5 fine->coarse), each
level's loss being the *mean over its masked pixels*.

JIT-friendly formulation: boolean indexing is replaced by
sum(where(mask, loss, 0)) / count(mask) with static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def smooth_l1(pred: Array, target: Array) -> Array:
    """Elementwise SmoothL1 (Huber with beta=1): 0.5*d^2 if |d|<1 else |d|-0.5."""
    diff = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)


def masked_mean(values: Array, mask: Array) -> Array:
    """Mean of ``values`` over True pixels of ``mask`` (0 if mask is empty)."""
    mask_f = mask.astype(jnp.float32)
    total = jnp.sum(values * mask_f)
    count = jnp.sum(mask_f)
    return jnp.where(count > 0, total / jnp.maximum(count, 1.0), 0.0)


def sl1_loss(results: dict[str, Array], depths: dict[str, Array],
             masks: dict[str, Array], levels: int = 3) -> Array:
    """Multi-scale masked SmoothL1.

    results: {'depth_l': (B, h, w)}; depths/masks: {'level_l': (B, h, w)}.
    """
    loss = jnp.float32(0.0)
    for l in range(levels):
        lvl = smooth_l1(results[f"depth_{l}"], depths[f"level_{l}"])
        loss = loss + masked_mean(lvl, masks[f"level_{l}"]) * (2.0 ** (1 - l))
    return loss


loss_dict = {"sl1": sl1_loss}
