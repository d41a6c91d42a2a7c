"""Plane-sweep warping and cost-volume aggregation.

Behavioral parity targets in the reference:
  - homography warp:        /root/reference/models/modules.py:52-92
  - variance aggregation:   /root/reference/models/mvsnet.py:139-168
  - groupwise correlation:  /root/reference/models/mvsnet.py:143,157-171

TPU-native design notes (each backed by v5e measurements, scripts/devtime.py)
-----------------------------------------------------------------------------
* Channels-last everywhere: feature maps are (H, W, C), cost volumes are
  (D, H, W, C) so 3D convolutions run in XLA's preferred NDHWC layout.
* Sampling uses the packed-quad single-gather path (ops/grid_sample.py):
  TPU's gather engine charges per ROW independent of width 8..128, so one
  4C-wide gather beats four C-wide tap gathers ~4x.
* The batch axis is folded into the flat gather index instead of vmap:
  batched gathers lower ~2x slower than flat ones.
* Source views are reduced with an UNROLLED loop (+ ``jax.checkpoint`` per
  view): a lax.scan here measures ~2.5x slower (carry round-trips HBM and
  the epilogue can't fuse across the while-loop boundary). The running
  (sum, sum-of-squares) accumulators are the only live volumes and the warp
  is rematerialized in the backward pass — replacing the reference's
  in-place accumulation + InPlace-ABN memory tricks
  (/root/reference/models/mvsnet.py:147-163).
* Coordinate math stays float32; feature math follows the feature dtype
  (bfloat16 by default on TPU), with accumulation in float32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .geometry import project_to_src
from .grid_sample import grid_sample, grid_sample_quad, pack_quad

Array = jax.Array


def warp_src_feature(src_feat: Array, proj_mat: Array,
                     depth_values: Array) -> Array:
    """Warp one source feature map over all depth hypotheses.

    src_feat: (H, W, C); proj_mat: (3, 4) = src_proj @ ref_proj_inv;
    depth_values: (D, H, W). Returns (D, H, W, C).

    Reference (non-packed) path, kept as the oracle for tests; the fast path
    below uses pack_quad + a single gather.
    """
    H, W = src_feat.shape[:2]
    coords = project_to_src(proj_mat, depth_values, H, W)  # (D, H, W, 2)
    return grid_sample(src_feat, coords)


def warp_src_quad_batched(src_quad: Array, proj_mat: Array,
                          depth_values: Array, height: int,
                          width: int) -> Array:
    """Batched warp via pre-packed quad volumes (one flat row-gather).

    src_quad: (B, H+1, W+1, 4C); proj_mat: (B, 3, 4);
    depth_values: (B, D, H, W). Returns (B, D, H, W, C).
    """
    coords = jax.vmap(
        lambda p, d: project_to_src(p, d, height, width))(proj_mat,
                                                          depth_values)
    return grid_sample_quad(src_quad, coords, height, width)


def variance_cost_volume(feats: Array, proj_mats: Array, depth_values: Array,
                         remat: bool = True) -> Array:
    """Variance cost volume over V views: E[f^2] - E[f]^2 (single sample).

    feats: (V, H, W, C) ref first; proj_mats: (V-1, 3, 4);
    depth_values: (D, H, W) -> (D, H, W, C).
    """
    return batched_variance_cost_volume(feats[None], proj_mats[None],
                                        depth_values[None], remat)[0]


def groupwise_cost_volume(feats: Array, proj_mats: Array, depth_values: Array,
                          groups: int, remat: bool = True) -> Array:
    """Groupwise-correlation cost volume (single sample).

    feats: (V, H, W, C) ref first -> (D, H, W, G).
    """
    return batched_groupwise_cost_volume(feats[None], proj_mats[None],
                                         depth_values[None], groups,
                                         remat)[0]


def _unrolled_views(body, carry, n_views: int, remat: bool):
    if remat:
        body = jax.checkpoint(body)
    for v in range(n_views):
        carry = body(carry, v)
    return carry


def batched_variance_cost_volume(feats: Array, proj_mats: Array,
                                 depth_values: Array,
                                 remat: bool = True) -> Array:
    """Variance cost volume, batch-native.

    The reference view participates as an un-warped volume broadcast over
    depth, exactly as in the reference (/root/reference/models/mvsnet.py:137-141).

    feats: (B, V, H, W, C); proj_mats: (B, V-1, 3, 4);
    depth_values: (B, D, H, W) -> (B, D, H, W, C).
    """
    B, V, H, W, C = feats.shape
    D = depth_values.shape[1]
    dtype = feats.dtype
    ref, srcs = feats[:, 0], feats[:, 1:]

    # (B, V-1, H+1, W+1, 4C); packing is elementwise, vmap costs nothing here
    src_quads = jax.vmap(jax.vmap(pack_quad))(srcs)

    ref_vol = jnp.broadcast_to(ref[:, None].astype(jnp.float32),
                               (B, D, H, W, C))
    init = (ref_vol, ref_vol ** 2)

    def body(carry, v):
        vol_sum, vol_sq = carry
        warped = warp_src_quad_batched(
            src_quads[:, v], proj_mats[:, v], depth_values, H,
            W).astype(jnp.float32)
        return vol_sum + warped, vol_sq + warped ** 2

    vol_sum, vol_sq = _unrolled_views(body, init, V - 1, remat)
    var = vol_sq / V - (vol_sum / V) ** 2
    return var.astype(dtype)


def batched_groupwise_cost_volume(feats: Array, proj_mats: Array,
                                  depth_values: Array, groups: int,
                                  remat: bool = True) -> Array:
    """Groupwise-correlation cost volume, batch-native.

    sim_g = mean_{c in group g}(warped_c * ref_c), summed over source views
    and divided by (V-1) — matching /root/reference/models/mvsnet.py:157-171.

    feats: (B, V, H, W, C), C divisible by groups -> (B, D, H, W, G).
    """
    B, V, H, W, C = feats.shape
    assert C % groups == 0, f"C={C} not divisible by groups={groups}"
    D = depth_values.shape[1]
    dtype = feats.dtype
    ref, srcs = feats[:, 0], feats[:, 1:]

    src_quads = jax.vmap(jax.vmap(pack_quad))(srcs)
    ref_g = ref.reshape(B, 1, H, W, groups, C // groups).astype(jnp.float32)
    init = jnp.zeros((B, D, H, W, groups), jnp.float32)

    def body(carry, v):
        warped = warp_src_quad_batched(src_quads[:, v], proj_mats[:, v],
                                       depth_values, H, W)
        warped = warped.reshape(B, D, H, W, groups,
                                C // groups).astype(jnp.float32)
        return carry + jnp.mean(warped * ref_g, axis=-1)

    vol = _unrolled_views(body, init, V - 1, remat)
    return (vol / (V - 1)).astype(dtype)


@functools.partial(jax.jit, static_argnames=("groups", "remat"))
def build_cost_volume(feats: Array, proj_mats: Array, depth_values: Array,
                      groups: int = 1, remat: bool = True) -> Array:
    """Batched cost volume dispatcher.

    feats: (B, V, H, W, C); proj_mats: (B, V-1, 3, 4);
    depth_values: (B, D, H, W). Returns (B, D, H, W, C or G).
    """
    if groups == 1:
        return batched_variance_cost_volume(feats, proj_mats, depth_values,
                                            remat)
    return batched_groupwise_cost_volume(feats, proj_mats, depth_values,
                                         groups, remat)
