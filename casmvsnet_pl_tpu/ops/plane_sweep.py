"""Plane-sweep warping and cost-volume aggregation.

Behavioral parity targets in the reference:
  - homography warp:        /root/reference/models/modules.py:52-92
  - variance aggregation:   /root/reference/models/mvsnet.py:139-168
  - groupwise correlation:  /root/reference/models/mvsnet.py:143,157-171

TPU-native design notes
-----------------------
* Channels-last everywhere: feature maps are (H, W, C), cost volumes are
  (D, H, W, C) so 3D convolutions run in XLA's preferred NDHWC layout.
* Source views are reduced with ``lax.scan`` + ``jax.checkpoint``: the running
  (sum, sum-of-squares) accumulators are the only live volumes, and the warp
  is rematerialized in the backward pass. This replaces the reference's
  incremental in-place accumulation + InPlace-ABN memory tricks
  (/root/reference/models/mvsnet.py:147-163) with the XLA-idiomatic remat.
* Coordinate math stays float32; feature math follows the feature dtype
  (bfloat16 by default on TPU), with the final statistics in feature dtype.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .geometry import project_to_src
from .grid_sample import grid_sample

Array = jax.Array


def warp_src_feature(src_feat: Array, proj_mat: Array,
                     depth_values: Array) -> Array:
    """Warp one source feature map over all depth hypotheses.

    src_feat: (H, W, C); proj_mat: (3, 4) = src_proj @ ref_proj_inv;
    depth_values: (D, H, W). Returns (D, H, W, C).
    """
    H, W = src_feat.shape[:2]
    coords = project_to_src(proj_mat, depth_values, H, W)  # (D, H, W, 2)
    return grid_sample(src_feat, coords)


def _scan_views(body, init_carry, src_feats: Array, proj_mats: Array,
                remat: bool):
    """Reduce over the source-view axis with optional rematerialization."""
    if remat:
        body = jax.checkpoint(body)
    carry, _ = jax.lax.scan(body, init_carry, (src_feats, proj_mats))
    return carry


def variance_cost_volume(feats: Array, proj_mats: Array, depth_values: Array,
                         remat: bool = True) -> Array:
    """Variance cost volume over V views: E[f^2] - E[f]^2.

    The reference view participates as an un-warped volume broadcast over
    depth, exactly as in the reference (/root/reference/models/mvsnet.py:137-141).

    Args:
      feats: (V, H, W, C) per-view features, ref first.
      proj_mats: (V-1, 3, 4) src @ ref^-1 projections.
      depth_values: (D, H, W).
    Returns:
      (D, H, W, C) variance volume.
    """
    V = feats.shape[0]
    ref, srcs = feats[0], feats[1:]
    D = depth_values.shape[0]
    dtype = feats.dtype

    ref_vol = jnp.broadcast_to(ref[None], (D,) + ref.shape)     # (D, H, W, C)
    init = (ref_vol.astype(jnp.float32), (ref_vol.astype(jnp.float32)) ** 2)

    def body(carry, xs):
        vol_sum, vol_sq = carry
        src_feat, proj = xs
        warped = warp_src_feature(src_feat, proj, depth_values).astype(jnp.float32)
        return (vol_sum + warped, vol_sq + warped ** 2), None

    vol_sum, vol_sq = _scan_views(body, init, srcs, proj_mats, remat)
    var = vol_sq / V - (vol_sum / V) ** 2
    return var.astype(dtype)


def groupwise_cost_volume(feats: Array, proj_mats: Array, depth_values: Array,
                          groups: int, remat: bool = True) -> Array:
    """Groupwise-correlation cost volume.

    sim_g = mean_{c in group g}(warped_c * ref_c), summed over source views
    and divided by (V-1) — matching /root/reference/models/mvsnet.py:157-171.

    Args:
      feats: (V, H, W, C), ref first; C must be divisible by groups.
    Returns:
      (D, H, W, G) correlation volume.
    """
    V, H, W, C = feats.shape
    assert C % groups == 0, f"C={C} not divisible by groups={groups}"
    ref, srcs = feats[0], feats[1:]
    D = depth_values.shape[0]
    dtype = feats.dtype

    ref_g = ref.reshape(H, W, groups, C // groups).astype(jnp.float32)
    init = jnp.zeros((D, H, W, groups), jnp.float32)

    def body(carry, xs):
        src_feat, proj = xs
        warped = warp_src_feature(src_feat, proj, depth_values)
        warped = warped.reshape(D, H, W, groups, C // groups).astype(jnp.float32)
        corr = jnp.mean(warped * ref_g[None], axis=-1)           # (D, H, W, G)
        return carry + corr, None

    vol = _scan_views(body, init, srcs, proj_mats, remat)
    return (vol / (V - 1)).astype(dtype)


@functools.partial(jax.jit, static_argnames=("groups", "remat"))
def build_cost_volume(feats: Array, proj_mats: Array, depth_values: Array,
                      groups: int = 1, remat: bool = True) -> Array:
    """Batched cost volume: vmap of the per-sample builders.

    feats: (B, V, H, W, C); proj_mats: (B, V-1, 3, 4);
    depth_values: (B, D, H, W). Returns (B, D, H, W, C or G).
    """
    if groups == 1:
        fn = functools.partial(variance_cost_volume, remat=remat)
    else:
        fn = functools.partial(groupwise_cost_volume, groups=groups, remat=remat)
    return jax.vmap(fn)(feats, proj_mats, depth_values)
