"""Plane-sweep warping and cost-volume aggregation.

Behavioral parity targets in the reference:
  - homography warp:        /root/reference/models/modules.py:52-92
  - variance aggregation:   /root/reference/models/mvsnet.py:139-168
  - groupwise correlation:  /root/reference/models/mvsnet.py:143,157-171

TPU-native design notes (each backed by v5e measurements; see
scripts/probe_warp_cost.py, probe_l0_variants.py, probe_epi3.py, probe_epi4.py)
-----------------------------------------------------------------------------
* Channels-last everywhere: feature maps are (H, W, C), cost volumes are
  (D, H, W, C) so 3D convolutions run in XLA's preferred NDHWC layout.
* Sampling uses the packed-quad single-row-gather (ops/grid_sample.py): the
  TPU gather engine charges ~2.5 ns per ROW independent of width 8..128
  lanes, so one 4C-wide gather beats four C-wide tap gathers ~4x.
* The gather rate cliffs ~4-5x when the (batch-folded) quad table exceeds
  the VMEM-stageable size: tables up to ~21 MB run at 2.3-3 ns/row, a 42 MB
  table at ~12 ns/row. Levels whose folded table passes ``_FOLD_LIMIT``
  therefore gather PER BATCH ELEMENT (62 ms -> 16 ms per view at level 0).
* The 4-tap combine avoids per-sample-scalar x lane-vector ops entirely
  (XLA lowers those through a transposed f32 copy + while loop, ~7.6 ms per
  2.6M-sample view): tap weights are expanded to (N, 4C) with CONSTANT lane
  masks (sublane broadcasts only), multiplied into the gathered rows
  elementwise, and the four C-blocks are summed by ONE matmul against a
  stacked-identity (4C, C) matrix on the MXU. The variance/correlation
  accumulation then fuses elementwise. Net: 52 -> 18 ms (L2), 58 -> 38 ms
  (L1) per cost volume at batch 2.
* A Pallas fused epilogue (kernels/cost_epilogue.py) was measured SLOWER:
  Mosaic's auto-pipelined DMA streams top out ~85 GB/s/stream on this
  toolchain, below what the XLA fusion achieves.
* Source views are reduced with an UNROLLED loop: a lax.scan here measures
  ~2.5x slower (carry round-trips HBM and the epilogue can't fuse across
  the while-loop boundary). With ``remat`` the gathered rows are
  rematerialized in the backward pass instead of stored — the TPU
  replacement for the reference's in-place accumulation + InPlace-ABN
  memory tricks (/root/reference/models/mvsnet.py:147-163).
* Coordinate math stays float32; feature math follows the feature dtype
  (bfloat16 by default on TPU) with float32 accumulation where it matters.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import project_to_src
from .grid_sample import (grid_sample, grid_sample_quad, pack_quad,
                          quad_weights)

Array = jax.Array

# Folded-table byte limit above which gathers are unrolled per batch element.
_FOLD_LIMIT = 24 * 1024 * 1024


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


def _gather_view(src_quad: Array, proj_mat: Array, depth_values: Array,
                 height: int, width: int):
    """Gather quad rows + tap weights for one source view.

    Issues ONE batch-folded gather when the folded table stays in the fast
    regime, else one gather per batch element (see module docstring).

    src_quad: (B, H+1, W+1, 4C) -> rows (B, N, 4C), w4 (B, N, 4) f32,
    N = D*H*W.
    """
    B, Hq, Wq, C4 = src_quad.shape
    coords = jax.vmap(
        lambda p, d: project_to_src(p, d, height, width))(proj_mat,
                                                          depth_values)
    w4, y0i, x0i = quad_weights(coords, height, width)
    idx = (y0i * Wq + x0i).reshape(B, -1)                 # (B, N)
    table_bytes = B * Hq * Wq * C4 * src_quad.dtype.itemsize
    if table_bytes <= _FOLD_LIMIT or B == 1:
        flat = src_quad.reshape(B * Hq * Wq, C4)
        fidx = idx + (jnp.arange(B, dtype=jnp.int32) * (Hq * Wq))[:, None]
        rows = jnp.take(flat, fidx.reshape(-1), axis=0).reshape(B, -1, C4)
    else:
        rows = jnp.stack([
            jnp.take(src_quad[b].reshape(Hq * Wq, C4), idx[b], axis=0)
            for b in range(B)])
    return rows, w4.reshape(B, -1, 4)


@functools.lru_cache(maxsize=16)
def _lane_masks(C: int):
    """Constant (4C,) one-hot-block masks, one per tap."""
    eye = np.eye(4, dtype=np.float32)
    return tuple(np.repeat(eye[q], C) for q in range(4))


@functools.lru_cache(maxsize=16)
def _identity_stack(C: int):
    """(4C, C) vertical stack of four identity matrices (host constant)."""
    return np.tile(np.eye(C, dtype=np.float32), (4, 1))


def _tap_reduce(rows: Array, w4: Array) -> Array:
    """Bilinear 4-tap combine without lane-group shuffles.

    rows: (B, N, 4C); w4: (B, N, 4) float32. Returns (B, N, C) float32.

    w4 is expanded to (B, N, 4C) via constant lane masks (sublane broadcasts
    only — no data-dependent lane movement), multiplied elementwise, and the
    four C-blocks are collapsed by one MXU matmul against a stacked-identity
    matrix. The matmul is exact: 0/1 matrix, float32 accumulation.
    """
    C4 = rows.shape[-1]
    C = C4 // 4
    dtype = rows.dtype
    masks = _lane_masks(C)
    w4c = sum(w4[..., q:q + 1] * jnp.asarray(masks[q]) for q in range(4))
    prod = rows * w4c.astype(dtype)
    k = jnp.asarray(_identity_stack(C), dtype)
    # Output stays float32: downcasting to bf16 here breaks XLA's fusion of
    # the dot epilogue with the variance/correlation accumulation and costs
    # ~1.7x at L1 (scripts/probe_l1_ab.py: 66 -> 38.7 ms).
    return jax.lax.dot_general(
        prod, k, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=16)
def _group_mean_matrix(C: int, groups: int):
    """(C, G) matrix averaging channels within each group (host constant)."""
    m = np.zeros((C, groups), np.float32)
    cg = C // groups
    for g in range(groups):
        m[g * cg:(g + 1) * cg, g] = 1.0 / cg
    return m


def batched_variance_cost_volume(feats: Array, proj_mats: Array,
                                 depth_values: Array,
                                 remat: bool = True) -> Array:
    """Variance cost volume over V views: E[f^2] - E[f]^2, batch-native.

    The reference view participates as an un-warped volume broadcast over
    depth, exactly as in the reference (/root/reference/models/mvsnet.py:137-141).

    feats: (B, V, H, W, C); proj_mats: (B, V-1, 3, 4);
    depth_values: (B, D, H, W) -> (B, D, H, W, C).
    """
    B, V, H, W, C = feats.shape
    D = depth_values.shape[1]
    dtype = feats.dtype
    ref, srcs = feats[:, 0], feats[:, 1:]
    src_quads = jax.vmap(jax.vmap(pack_quad))(srcs)

    def build(src_quads, proj_mats, depth_values, ref):
        reff = ref.reshape(B, 1, H * W, C).astype(jnp.float32)
        s = jnp.broadcast_to(reff, (B, D, H * W, C))
        sq = s * s
        for v in range(V - 1):
            rows, w4 = _gather_view(src_quads[:, v], proj_mats[:, v],
                                    depth_values, H, W)
            o = _tap_reduce(rows, w4).reshape(B, D, H * W, C)
            s = s + o
            sq = sq + o * o
        var = sq / V - (s / V) ** 2
        return var.astype(dtype).reshape(B, D, H, W, C)

    if remat:
        build = jax.checkpoint(build)
    return build(src_quads, proj_mats, depth_values, ref)


def batched_groupwise_cost_volume(feats: Array, proj_mats: Array,
                                  depth_values: Array, groups: int,
                                  remat: bool = True) -> Array:
    """Groupwise-correlation cost volume, batch-native.

    sim_g = mean_{c in group g}(warped_c * ref_c), summed over source views
    and divided by (V-1) — matching /root/reference/models/mvsnet.py:157-171.
    The group mean runs as a (C, G) matmul fused behind the tap combine.

    feats: (B, V, H, W, C), C divisible by groups -> (B, D, H, W, G).
    """
    B, V, H, W, C = feats.shape
    assert C % groups == 0, f"C={C} not divisible by groups={groups}"
    D = depth_values.shape[1]
    dtype = feats.dtype
    ref, srcs = feats[:, 0], feats[:, 1:]
    src_quads = jax.vmap(jax.vmap(pack_quad))(srcs)

    def build(src_quads, proj_mats, depth_values, ref):
        reff = ref.reshape(B, 1, H * W, C).astype(jnp.float32)
        gm = jnp.asarray(_group_mean_matrix(C, groups))
        acc = jnp.zeros((B, D, H * W, groups), jnp.float32)
        for v in range(V - 1):
            rows, w4 = _gather_view(src_quads[:, v], proj_mats[:, v],
                                    depth_values, H, W)
            o = _tap_reduce(rows, w4).reshape(B, D, H * W, C)
            prod = o * reff
            acc = acc + jax.lax.dot_general(
                prod, gm, dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        corr = acc / (V - 1)
        return corr.astype(dtype).reshape(B, D, H, W, groups)

    if remat:
        build = jax.checkpoint(build)
    return build(src_quads, proj_mats, depth_values, ref)


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
