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
* The gather rate cliffs ~4-5x by table ROW COUNT, independent of row
  width up to 128 lanes: ~2.4-3.4 ns/row through ~340K rows, ~11-12 ns/row
  near 1M (scripts/probe_window.py, probe_evalres_gather.py). Three
  consequences: (a) batch-folded tables past ``_FOLD_LIMIT`` gather per
  batch element (62 -> 16 ms/view at level 0); (b) at large resolutions
  "auto" switches to ALIGNED-BLOCK tables (pack_blocks) that pack `align`
  quad cells per 2x(align+1) row — align-x fewer table rows, still one
  gather row per sample, exact for any geometry (1.4x end-to-end at the
  1152x864 eval resolution); (c) an opt-in WINDOW mode (sampling="window")
  shares one strip window across a depth-hypothesis group where
  strip_w*C <= 128 — fewer gather rows and a 4x-smaller backward scatter,
  but a wider epilogue that loses on the v5e FORWARD (55 vs 40 ms), and
  exact only while group spans fit the window; see _resolve_sampling.
* Many-piece sampling tables (strips, blocks) are built by a one-hot
  patch-extraction CONVOLUTION on the MXU — lane-offset concats of shifted
  slices lower to masked sub-128-lane stores and cost ~26 ms per 512x640
  strip table vs ~1 ms for the conv (scripts/probe_win_ablate.py);
  4-piece quad tables still use the concat (scripts/probe_pack.py).
* The 4-tap combine avoids per-sample-scalar x lane-vector ops entirely
  (XLA lowers those through a transposed f32 copy + while loop, ~7.6 ms per
  2.6M-sample view): tap weights are expanded to (N, 4C) with CONSTANT lane
  masks (sublane broadcasts only), multiplied into the gathered rows
  elementwise, and the four C-blocks are summed by ONE matmul against a
  stacked-identity (4C, C) matrix on the MXU. The variance/correlation
  accumulation then fuses elementwise. Net: 52 -> 18 ms (L2), 58 -> 38 ms
  (L1) per cost volume at batch 2.
* A fused Pallas tap-reduce epilogue (scripts/kernel_cost_epilogue.py) was measured SLOWER:
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
import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.patch_epilogue import epilogue_bwd, epilogue_fwd
from .banded_take import (banded_cfg, banded_gather_rows, banded_scatter_add,
                          batched_take, gather_band_cfg, take_quad_banded)
from .geometry import project_to_src
from .grid_sample import (grid_sample, grid_sample_quad, pack_blocks,
                          pack_patches, pack_quad, pack_strips, quad_weights)

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


@functools.lru_cache(maxsize=32)
def _lane_masks(C: int, blocks: int = 4):
    """Constant (blocks*C,) one-hot-block masks, one per tap block."""
    eye = np.eye(blocks, dtype=np.float32)
    return tuple(np.repeat(eye[q], C) for q in range(blocks))


@functools.lru_cache(maxsize=32)
def _identity_stack(C: int, blocks: int = 4):
    """(blocks*C, C) vertical stack of identity matrices (host constant)."""
    return np.tile(np.eye(C, dtype=np.float32), (blocks, 1))


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


def window_config(C: int, D: int, window_h: int = 4):
    """Static windowed-sampling config for a level, or None if infeasible.

    Windowed sampling packs a strip_w-pixel horizontal strip per table row
    (strip_w * C must fit the 128-lane fast-gather width) and shares one
    window_h x strip_w window across a group of consecutive depth
    hypotheses. Feasible only for levels with C <= 8 — in the reference
    architecture that is exactly the finest cascade level, where the
    hypothesis spacing is sub-pixel by design so a group's samples fit one
    window (/root/reference/models/mvsnet.py:231-235 recenters level-0
    hypotheses in a narrow band around the upsampled coarser depth).
    """
    if C > 8:
        return None
    group = min(D, 8)
    if D % group:
        return None
    return {"strip_w": min(16, 128 // C), "window_h": window_h,
            "depth_group": group}


def _window_view(src_strips: Array, proj_mat: Array, depth_values: Array,
                 height: int, width: int, strip_w: int, window_h: int,
                 depth_group: int) -> Array:
    """Warp + bilinear-sample one source view via shared window gathers.

    One window of window_h gathered strip rows serves a whole group of
    depth_group consecutive hypotheses: the window origin is the floor of
    the group's min (valid) sample coordinate, and each sample's bilinear
    weights are evaluated as hat functions on the window grid — EXACTLY
    bilinear (4 nonzero taps) whenever the group's sample span fits the
    window (x-span <= strip_w - 2, y-span <= window_h - 2). Out-of-image
    taps read the table's zero padding, matching grid_sample's zeros
    padding; samples fully outside get all-zero weights. Samples whose
    support exceeds the window (larger-than-designed camera motion) clamp
    to the window edge — a bounded, local approximation; use quad sampling
    where that is unacceptable.

    src_strips: (B, H+window_h, W+1, strip_w*C) from pack_strips;
    proj_mat: (B, 3, 4); depth_values: (B, D, H, W).
    Returns (B, D, H*W, C) float32 sampled features.
    """
    B, Ht, Wt, SC = src_strips.shape
    C = SC // strip_w
    D = depth_values.shape[1]
    ng = D // depth_group
    hw = height * width
    dtype = src_strips.dtype

    coords = jax.vmap(
        lambda p, d: project_to_src(p, d, height, width))(proj_mat,
                                                          depth_values)
    x = coords[..., 0].astype(jnp.float32).reshape(B, ng, depth_group, hw)
    y = coords[..., 1].astype(jnp.float32).reshape(B, ng, depth_group, hw)
    valid = ((x > -1.0) & (x < float(width)) &
             (y > -1.0) & (y < float(height)))
    # Window origin from the group's min VALID coordinate (invalid samples
    # would drag the window off the real support; they contribute zero
    # regardless via the weight mask below).
    big = jnp.float32(1e9)
    minx = jnp.min(jnp.where(valid, x, big), axis=2)          # (B, ng, hw)
    miny = jnp.min(jnp.where(valid, y, big), axis=2)
    x_org = jnp.clip(jnp.floor(minx), -1.0, width - 1.0)
    y_org = jnp.clip(jnp.floor(miny), -1.0, height - 1.0)
    xi = x_org.astype(jnp.int32) + 1                          # [0, W]
    yi = y_org.astype(jnp.int32) + 1

    # window_h gathers per group; tables are large by construction, so
    # gathers run per batch element (fast-rate regime) via the shared
    # fold-or-scan helper.
    flat = src_strips.reshape(B, Ht * Wt, SC)
    rows = []
    for j in range(window_h):
        idx = (yi + j) * Wt + xi                              # (B, ng, hw)
        r = batched_take(flat, idx.reshape(B, -1))
        rows.append(r.reshape(B, ng, 1, hw, SC))

    fx1 = jnp.clip(x - x_org[:, :, None, :], 0.0, strip_w - 1.0)[..., None]
    fy1 = jnp.clip(y - y_org[:, :, None, :], 0.0, window_h - 1.0)[..., None]
    vm1 = valid.astype(jnp.float32)[..., None]

    # Full per-row-j lane weights built ONLY from (..., 1) per-sample
    # scalars broadcast against a CONSTANT lane iota (the fast pattern —
    # per-sample scalars multiplied into gathered DATA lanes lower through
    # a transposed copy + while loop and cost 3x, scripts/probe_wi).
    # hat(fx - k) * hat(fy - j) reproduces exact bilinear: 4 nonzero taps.
    # The x-hat lane expansion is shared across window rows; each row adds
    # only one (..., 1)-scalar y-hat multiply.
    kl = jnp.asarray(np.repeat(np.arange(strip_w, dtype=np.float32), C))
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(fx1 - kl)) * vm1
    prod = None
    for j in range(window_h):
        w_j = wx * jnp.maximum(0.0, 1.0 - jnp.abs(fy1 - j))
        term = rows[j] * w_j.astype(dtype)     # (B, ng, Gd, hw, SC)
        prod = term if prod is None else prod + term
    kmat = jnp.asarray(_identity_stack(C, strip_w), dtype)
    o = jax.lax.dot_general(
        prod.reshape(B, D * hw, SC), kmat,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return o.reshape(B, D, hw, C)


def patch_config(C: int, D: int):
    """Patch-shared sampling config for a level, or None if infeasible.

    Patch sampling gathers ONE stride-1 ph x pw patch row (ph*pw*C <= 128
    lanes) per group of g consecutive depth hypotheses instead of one quad
    row per (pixel, depth): the recentered hypothesis windows of the fine
    cascade levels are epipolar-tight, so a whole group's bilinear supports
    usually fit a 4x4 patch (measured fit rates ~1.0 for DTU-like rigs at
    baselines <= ~50-100 mm, scripts/probe_patch.py spans). C <= 8 uses one
    table; C = 16 / C = 32 (cascade levels 1 / 2) SPLIT the channels into
    two / four 128-lane sub-tables sharing one coordinate/fit computation —
    each split still halves-or-better the gather rows vs quad and the
    backward scatters g/split-fold fewer rows. ``groups`` lists candidate
    group sizes; the sampler picks the largest whose spans fit AT RUNTIME
    and falls back to exact quad sampling otherwise (lax.cond), so the
    result is exact for ANY geometry. Extraction runs in the transposed
    pixel-lane layout (kernels/patch_epilogue.py; scripts/probe_epi5.py).
    """
    ph = pw = 4
    split = -(-(ph * pw * C) // 128)
    if split > 4 or (C % split):
        return None
    # g=16 candidate: the gather engine charges per ROW, so when sixteen
    # consecutive hypotheses' supports fit one patch (epipolar-tight fine
    # levels, e.g. DTU-rig L1: ~0.18 px/step -> span 2.7 <= 3) the rows
    # halve again vs g=8. Runtime span check falls through when unfit.
    groups = tuple(g for g in (16, 8, 4) if D % g == 0 and g <= D)
    if not groups:
        return None
    return {"ph": ph, "pw": pw, "groups": groups, "split": split}


def _patch_view(table: Array, proj_mat: Array, depth_values: Array,
                height: int, width: int, ph: int, pw: int,
                groups, split: int = 1, fb_align: int = 0) -> Array:
    """Warp one source view via patch-shared gathers: exact for any geometry.

    table: (B, H+2, W+2, split*128) — the per-split pack_patches tables
    fused along the lane axis (_pack_tables). One gathered patch row
    serves a whole group of g consecutive depth hypotheses; each sample is
    extracted with hat weights on constant lane iotas + one stacked-identity
    MXU matmul (the validfold epilogue, scripts/probe_patch2.py). A nested
    lax.cond tries each group size in ``groups`` (largest first): a group
    size is usable only when EVERY valid sample's bilinear support fits its
    group's patch; otherwise the view falls back to the exact packed-quad
    path (the original features are recovered from the table's (0,0) lanes),
    so no geometry is ever approximated.

    Differentiation: a hand-written custom VJP (:func:`_patch_sample`).
    Gradients flow to the TABLE only; the projected coordinates are
    treated as non-differentiable (in this architecture they are: the
    cascade recenters hypotheses on a gradient-stopped previous depth,
    models/cascade.py, matching /root/reference/models/mvsnet.py:233).

    Returns (B, D, H*W, C) sampled features in the table dtype (bf16 on
    TPU, f32 elsewhere).
    """
    B, Ht, Wt, SL = table.shape
    S = split
    L = SL // S
    D = depth_values.shape[1]
    hw = height * width

    coords = jax.vmap(
        lambda p, d: project_to_src(p, d, height, width))(proj_mat,
                                                          depth_values)
    coords = jax.lax.stop_gradient(coords)
    xf = coords[..., 0].astype(jnp.float32).reshape(B, D, hw)
    yf = coords[..., 1].astype(jnp.float32).reshape(B, D, hw)
    validf = ((xf > -1.0) & (xf < float(width)) &
              (yf > -1.0) & (yf < float(height)))

    # Per-group coordinate stats, computed ONCE at the finest group size and
    # combined pairwise for coarser groups — one masked min/max pass over the
    # (B, D, hw) coords instead of one per candidate g. A group with no valid
    # sample gets min=+big / max=-big and trivially "fits" (all-zero weights).
    big = jnp.float32(1e9)
    g0 = min(groups)
    base = []
    for a in (xf, yf):
        ar = a.reshape(B, D // g0, g0, hw)
        vr = validf.reshape(B, D // g0, g0, hw)
        base.append(jnp.min(jnp.where(vr, ar, big), axis=2))
        base.append(jnp.max(jnp.where(vr, ar, -big), axis=2))
    stats = {g0: tuple(base)}                 # (minx, maxx, miny, maxy)
    for g in sorted(groups):
        if g == g0:
            continue
        k = g // g0
        stats[g] = tuple(
            (jnp.min if i % 2 == 0 else jnp.max)(
                a.reshape(B, D // g, k, hw), axis=2)
            for i, a in enumerate(stats[g0]))

    per_g = {}
    for g in groups:
        minx, maxx, miny, maxy = stats[g]
        x_org = jnp.clip(jnp.floor(minx), -1.0, width - 1.0)
        y_org = jnp.clip(jnp.floor(miny), -1.0, height - 1.0)
        fit = jnp.all((maxx - x_org <= pw - 1.0) &
                      (maxy - y_org <= ph - 1.0))
        per_g[g] = (x_org, y_org, fit)

    ops = {"x": xf, "y": yf, "valid": validf, "per_g": per_g}
    static = (height, width, ph, pw, tuple(sorted(groups)), D,
              S, Ht, Wt, L, str(table.dtype), fb_align)
    return _patch_sample(static, table, ops)


def _patch_gather(table: Array, idx: Array) -> Array:
    """Fold-or-scan row gather shared by the patch forward paths
    (ops/banded_take.batched_take — one lax.scan over batch past the fold
    limit, constant-size HLO at any batch)."""
    B, Ht, Wt, L = table.shape
    return batched_take(table.reshape(B, Ht * Wt, L), idx)


def _patch_frac(x, y, valid, x_org, y_org, ph, pw):
    """validfold fractional patch-frame coords: (B, ng, g, hw) f32 each.

    The valid mask folds into fx (invalid -> -9 -> every hat weight 0,
    scripts/probe_patch2.py epi A/B), preserving grid_sample's
    zeros-padding semantics for out-of-image samples.
    """
    fx = jnp.where(valid,
                   jnp.clip(x - x_org[:, :, None], 0.0, pw - 1.0),
                   -9.0)
    fy = jnp.clip(y - y_org[:, :, None], 0.0, ph - 1.0)
    return fx, fy


def _patch_nested_cond(groups_desc, per_g, patch_fn, fallback_fn):
    """cond(fit_g_max, patch, cond(fit_next, patch, ... fallback))."""
    fn = fallback_fn
    for g in sorted(groups_desc):       # build inside-out: largest outermost
        fit = per_g[g][2]
        fn = (lambda inner, fit=fit, g=g:
              lambda: jax.lax.cond(fit, lambda: patch_fn(g), inner))(fn)
    return fn()


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _patch_sample(static, table: Array, ops) -> Array:
    """Patch-shared sampling with a HAND-WRITTEN backward.

    Autodiff through the nested lax.cond stores the union of both branches'
    residuals (gathered rows, hat weights, the fallback's quad table) —
    several GB at train resolution, which erased the patch win inside the
    composed train step (599 -> 618 ms measured). This custom VJP keeps
    only the (B, D, hw) coordinate arrays as residuals and rebuilds the
    hat weights in the backward, scattering cotangent rows through
    ops.banded_take.banded_scatter_add at the fast scatter rate.

    Gradients flow to ``table`` only; ``ops`` coordinates are
    gradient-stopped by the caller (_patch_view).
    """
    height, width, ph, pw, groups, D, S, Ht, Wt, L, _, fb_align = static
    B = table.shape[0]
    Ch = L // (ph * pw)                  # channels per split half
    C = Ch * S
    hw = height * width

    def patch_fwd(g):
        ng = D // g
        x = ops["x"].reshape(B, ng, g, hw)
        y = ops["y"].reshape(B, ng, g, hw)
        valid = ops["valid"].reshape(B, ng, g, hw)
        x_org, y_org, _ = ops["per_g"][g]
        xi = x_org.astype(jnp.int32) + 1
        yi = y_org.astype(jnp.int32) + 1
        idx = (yi * Wt + xi).reshape(B, -1)                  # (B, ng*hw)
        # ONE frac-coord build serves all split halves; the bilinear
        # extraction runs in the transposed (pixel-lane) layout via the
        # Pallas kernel (kernels/patch_epilogue.py) — 1.8 vs 9.5 ms per L0
        # view for the lane-layout hat expansion (scripts/probe_epi5.py).
        fx, fy = _patch_frac(x, y, valid, x_org, y_org, ph, pw)
        # ONE fused gather fetches all S splits' lanes per row (the gather
        # engine charges per row ~independent of width to 1 KB), then each
        # split's 128-lane block feeds the epilogue kernel. Past the
        # fast-regime row budget (eval-res level 0: 999K-row tables gather
        # at ~12 ns/row) the gather runs BANDED: per ref-row tile, a
        # band-sized dynamic slice of the table re-enters the fast regime
        # (3.8 vs 12.1 ms measured, scripts/probe_banded_gather.py), with
        # an exact monolithic fallback when a tile's valid rows escape
        # its band.
        bg = gather_band_cfg(Ht * Wt, Wt, height,
                             S * L * table.dtype.itemsize)
        if bg is not None:
            valid_g = jnp.any(valid, axis=2).reshape(B, -1)  # (B, ng*hw)
            rows = banded_gather_rows(
                table.reshape(B, Ht * Wt, S * L), idx, valid_g, ng,
                height, width, Wt, *bg)
        else:
            rows = _patch_gather(table, idx)                 # (B, ng*hw, S*L)
        rows = rows.reshape(B, ng, hw, S, L)
        outs = []
        for s in range(S):
            rowsT = jnp.swapaxes(rows[:, :, :, s], -1, -2)
            # Emit in the table dtype (bf16 on TPU): the kernel boundary
            # always materializes to HBM, and the warped volumes are the
            # largest arrays in the level — the f32 accumulation happens
            # in-register inside the kernel and again in the variance /
            # correlation combine, so only the stored samples are rounded.
            outs.append(epilogue_fwd(rowsT, fx, fy, ph, pw,
                                     out_dtype=table.dtype))
        o = outs[0] if S == 1 else jnp.concatenate(outs, axis=3)
        # (B, ng, g, C, hw) -> (B, D, hw, C); the transpose fuses into the
        # variance/correlation accumulation (measured free, probe_epi5).
        return jnp.swapaxes(o.reshape(B, D, C, hw), -1, -2)

    def quad_fwd():
        feat = jnp.concatenate(
            [table[:, 1:height + 1, 1:width + 1, s * L:s * L + Ch]
             for s in range(S)], axis=-1)
        quad = jax.vmap(pack_quad)(feat)
        xy = jnp.stack([ops["x"], ops["y"]], axis=-1)        # (B, D, hw, 2)
        w4, y0i, x0i = quad_weights(xy, height, width)
        idx = (y0i * (width + 1) + x0i).reshape(B, -1)
        rows = _patch_gather(quad, idx)
        # Match patch_fwd's output dtype (lax.cond branches must agree).
        # The f32-out rule for the standalone quad path (_tap_reduce note)
        # protected the dot->variance fusion; here the cast is the branch's
        # last op and this fallback only runs on unfit geometry anyway.
        return (_tap_reduce(rows, w4.reshape(B, -1, 4))
                .reshape(B, D, hw, C).astype(table.dtype))

    def block_fwd():
        # Past-the-row-cliff fallback (fb_align > 0): a quad table here
        # would gather D*hw slow-regime rows; the aligned-block table is
        # align-x smaller and was the previous production path at this
        # resolution (_resolve_sampling). Features are recovered from the
        # patch table's (0,0)-tap lanes, same as quad_fwd.
        feat = jnp.concatenate(
            [table[:, 1:height + 1, 1:width + 1, s * L:s * L + Ch]
             for s in range(S)], axis=-1)
        btab = jax.vmap(lambda f: pack_blocks(f, fb_align))(feat)
        x = ops["x"].reshape(B, -1)
        y = ops["y"].reshape(B, -1)
        o = _block_sample(btab, x, y, height, width, fb_align)
        return o.reshape(B, D, hw, C).astype(table.dtype)

    fallback = block_fwd if fb_align > 0 else quad_fwd
    return _patch_nested_cond(groups, ops["per_g"], patch_fwd, fallback)


def _patch_sample_fwd(static, table, ops):
    return _patch_sample(static, table, ops), ops


def _patch_sample_bwd(static, ops, g_out):
    height, width, ph, pw, groups, D, S, Ht, Wt, L, dtype_str, fb = static
    # NOTE on the fallback branch: when the forward's unfit-geometry branch
    # is block_fwd (fb_align > 0) the backward still runs quad_bwd — both
    # forwards compute the SAME exact bilinear sample of the same recovered
    # features, so the cotangent wrt the patch table is identical math;
    # quad_bwd is the cheaper adjoint to maintain and training resolutions
    # never select fb_align > 0 anyway (_resolve_sampling row threshold).
    if fb > 0:
        # Differentiating a past-the-row-cliff (eval-resolution) config is
        # correct but runs quad_bwd's fallback as a MONOLITHIC scatter into
        # a ~1M-row quad-table gradient (banded_cfg declines: band thinner
        # than 32 rows) — a slow-regime, high-memory surprise worth a
        # signal (ADVICE r3).
        warnings.warn(
            "differentiating a plane-sweep config with fb_align > 0 "
            f"({height}x{width}: past the gather row cliff): the unfit-"
            "geometry branch backward scatters monolithically into a "
            f"{Ht * Wt}-row table gradient — slow and memory-hungry; "
            "training at this resolution is not a tuned path.",
            stacklevel=2)
    g_out = g_out.astype(jnp.float32)                        # (B, D, hw, C)
    B = g_out.shape[0]
    Ch = L // (ph * pw)
    C = Ch * S
    hw = height * width
    dtype = jnp.dtype(dtype_str)

    def patch_bwd(g):
        ng = D // g
        x = ops["x"].reshape(B, ng, g, hw)
        y = ops["y"].reshape(B, ng, g, hw)
        valid = ops["valid"].reshape(B, ng, g, hw)
        x_org, y_org, _ = ops["per_g"][g]
        # Cotangent rows in the transposed layout: d_rowsT[k*Ch+c, p] =
        # sum_j hat_w[j, k, p] * goT[j, c, p] — hats rebuilt from the
        # coordinate residuals (never stored), one kernel per split half
        # (kernels/patch_epilogue.epilogue_bwd).
        fx, fy = _patch_frac(x, y, valid, x_org, y_org, ph, pw)
        goT = jnp.swapaxes(g_out, -1, -2).reshape(B, ng, g, C, hw)
        xi = x_org.astype(jnp.int32) + 1
        yi = y_org.astype(jnp.int32) + 1
        idx = (yi * Wt + xi).reshape(B, -1)
        valid_g = jnp.any(valid, axis=2).reshape(B, -1)
        bcfg = banded_cfg(Ht, Wt, ng, height, width)
        # Cotangent rows fused across splits (like the forward gather): one
        # (S*L)-lane scatter row per patch row — S-fold fewer scatter
        # descriptors than per-split scatters of the same bytes.
        upds = []
        for s in range(S):
            d_rowsT = epilogue_bwd(goT[:, :, :, s * Ch:(s + 1) * Ch], fx, fy,
                                   ph, pw)                   # (B, ng, L, hw)
            upds.append(jnp.swapaxes(d_rowsT, -1, -2).reshape(B, -1, L))
        upd = upds[0] if S == 1 else jnp.concatenate(upds, axis=-1)
        if bcfg is not None:
            return banded_scatter_add(
                (ng, height, width) + bcfg, Ht, Wt, idx, valid_g, upd)
        fidx = idx + (jnp.arange(B, dtype=jnp.int32) * (Ht * Wt))[:, None]
        return (jnp.zeros((B * Ht * Wt, S * L), jnp.float32)
                .at[fidx.reshape(-1)].add(upd.reshape(-1, S * L))
                .reshape(B, Ht, Wt, S * L))

    def quad_bwd():
        # adjoint of the packed-quad fallback: scatter 4C-lane cotangent
        # rows into a quad-table gradient, fold its four tap blocks back
        # onto the feature pixels, and embed that into the patch table's
        # (0,0)-tap lanes (the only lanes the fallback forward read).
        Hq, Wq = height + 1, width + 1
        xy = jnp.stack([ops["x"], ops["y"]], axis=-1)
        w4, y0i, x0i = quad_weights(xy, height, width)
        w4 = w4.reshape(B, -1, 4)
        idx = (y0i * Wq + x0i).reshape(B, -1)
        k4T = jnp.asarray(_identity_stack(C, 4).T, jnp.float32)
        dp = jax.lax.dot_general(
            g_out.reshape(B, D * hw, C), k4T,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (B, N, 4C)
        masks = _lane_masks(C)
        w4c = sum(w4[..., q:q + 1] * jnp.asarray(masks[q]) for q in range(4))
        upd = dp * w4c
        valid4 = jnp.max(w4, axis=-1) > 0
        bcfg = banded_cfg(Hq, Wq, D, height, width)
        if bcfg is not None:
            d_quad = banded_scatter_add((D, height, width) + bcfg,
                                        Hq, Wq, idx, valid4, upd)
        else:
            fidx = idx + (jnp.arange(B, dtype=jnp.int32) * (Hq * Wq))[:, None]
            d_quad = (jnp.zeros((B * Hq * Wq, 4 * C), jnp.float32)
                      .at[fidx.reshape(-1)].add(upd.reshape(-1, 4 * C))
                      .reshape(B, Hq, Wq, 4 * C))
        # pack_quad adjoint: q00[yq,xq]=f[yq-1,xq-1], q01=f[yq-1,xq],
        # q10=f[yq,xq-1], q11=f[yq,xq] (zero-padded borders dropped)
        H, W = height, width
        d_feat = (d_quad[:, 1:H + 1, 1:W + 1, 0:C]
                  + d_quad[:, 1:H + 1, 0:W, C:2 * C]
                  + d_quad[:, 0:H, 1:W + 1, 2 * C:3 * C]
                  + d_quad[:, 0:H, 0:W, 3 * C:4 * C])
        return jnp.concatenate([
            jnp.pad(d_feat[..., s * Ch:(s + 1) * Ch],
                    ((0, 0), (1, Ht - H - 1), (1, Wt - W - 1), (0, L - Ch)))
            for s in range(S)], axis=-1)                 # (B, Ht, Wt, S*L)

    d_table = _patch_nested_cond(groups, ops["per_g"], patch_bwd, quad_bwd)
    zero0 = np.zeros((), dtype=jax.dtypes.float0)

    def _cot(leaf):
        if jnp.issubdtype(leaf.dtype, jnp.inexact):
            return jnp.zeros_like(leaf)
        return np.broadcast_to(zero0, leaf.shape)

    return d_table.astype(dtype), jax.tree.map(_cot, ops)


_patch_sample.defvjp(_patch_sample_fwd, _patch_sample_bwd)


@functools.lru_cache(maxsize=16)
def _group_mean_matrix(C: int, groups: int):
    """(C, G) matrix averaging channels within each group (host constant)."""
    m = np.zeros((C, groups), np.float32)
    cg = C // groups
    for g in range(groups):
        m[g * cg:(g + 1) * cg, g] = 1.0 / cg
    return m


# Above this many table rows the gather engine leaves its fast ~2.4 ns/row
# regime (measured cliff to ~11-12 ns/row near 1M rows, fast through ~330K;
# scripts/probe_evalres_gather.py, probe_window.py).
_ROW_THRESH = 340_000


def block_align(C: int, H: int, W: int, itemsize: int = 2) -> int:
    """Aligned-block packing factor for a level (1 = plain quad table).

    Stays on the plain quad table while it is reliably in the gather fast
    regime (both few rows AND small bytes — a 250K-row/32MB 64-lane table
    already measured slow, probe_evalres_gather.py); otherwise packs to
    full 128-lane rows (A = 64/C - 1), minimizing table rows. Exact for
    any geometry at any A. ``itemsize`` is the feature dtype's byte width
    (2 for bf16, 4 for f32) so the byte check holds under --precision f32.
    """
    a_max = 64 // C - 1
    if a_max < 2:
        return 1
    rows = (H + 2) * (W + 2)
    if rows <= _ROW_THRESH and rows * 4 * C * itemsize <= _FOLD_LIMIT:
        return 1
    return a_max


def _resolve_sampling(sampling, C: int, D: int, H: int, W: int,
                      itemsize: int = 2):
    """Map a sampling mode string to a per-level sampler config dict.

    "auto"/"quad" use one gather row per (pixel, depth, view): a plain quad
    table while it fits the gather fast regime (~340K rows), else an
    aligned-block table ("auto" only) packing `align` quad cells per row —
    exact for any geometry, and 1.4x end-to-end at the 1152x864 DTU eval
    resolution where quad tables fall off the row-count cliff. "window"
    additionally shares strip-window gathers across depth groups where
    lane-feasible (fewer gather rows and a 4x-smaller backward scatter, but
    a wider epilogue; exact only while group spans fit the window) and
    falls back to the auto policy elsewhere.
    """
    if sampling not in ("quad", "auto", "window", "patch"):
        raise ValueError(f"unknown sampling mode {sampling!r}")
    if sampling == "window":
        cfg = window_config(C, D)
        if cfg is not None:
            _warn_window_once()
            return {"mode": "window", **cfg}
    if sampling in ("patch", "auto"):
        cfg = patch_config(C, D)
        # patch tables ((H+2)x(W+2) rows, 128 lanes) must stay in the gather
        # fast regime; past the row cliff the auto/block policy wins anyway.
        # "auto" prefers patch wherever feasible: with the transposed-layout
        # Pallas epilogue (kernels/patch_epilogue.py) the patch FORWARD beats
        # quad at every cascade level and split factor (per-view on v5e,
        # scripts/probe_epi5.py: L0 9.9 vs 18.4, L1 split2 9.2 vs 14.7,
        # L2 split4 5.3 vs 8.1 ms), and the backward scatters g/split-fold
        # fewer rows. Exact for any geometry via the runtime group-fit
        # quad fallback. (Round-2 history: the lane-layout hat epilogue made
        # split-channel patch a train-only win; the transposed kernel
        # removed that asymmetry.)
        if cfg is not None and (H + 2) * (W + 2) <= _ROW_THRESH:
            return {"mode": "patch", **cfg, "fb_align": 0}
        if cfg is not None:
            # Past the row cliff (eval-res level 0: 999K-row/256MB table)
            # the g-shared patch gathers STILL beat the aligned-block path
            # — D/g-fold fewer slow-regime rows: 19.4 vs 33.6 ms/view at
            # 1152x864, scripts/probe_blockT.py. Group spans fit less often
            # at eval res (g=8 below ~20mm baselines, g=4 through ~50mm),
            # so the runtime unfit-geometry fallback must be the block
            # path, not a past-the-cliff quad table.
            a = block_align(C, H, W, itemsize)
            if a > 1:
                return {"mode": "patch", **cfg, "fb_align": a}
    if sampling != "quad":
        a = block_align(C, H, W, itemsize)
        if a > 1:
            return {"mode": "block", "align": a}
    return {"mode": "quad"}


@functools.cache
def _warn_window_once() -> None:
    """One-time signal that window sampling is a bounded approximation:
    samples whose depth-group span exceeds the strip window are clamped to
    the window edge with no runtime error (accuracy, not crash)."""
    warnings.warn(
        "sampling='window' clamps samples to the strip window edge when a "
        "depth-group's span exceeds the window; results are exact only "
        "while group spans fit (see ops/plane_sweep.py window notes).",
        stacklevel=3)


def _pack_tables(srcs: Array, cfg):
    """Per-view sampling tables for the configured sampler."""
    if cfg["mode"] == "quad":
        return jax.vmap(jax.vmap(pack_quad))(srcs)
    if cfg["mode"] == "block":
        return jax.vmap(jax.vmap(
            lambda f: pack_blocks(f, cfg["align"])))(srcs)
    if cfg["mode"] == "patch":
        s = cfg["split"]

        def pk(f):
            # Splits FUSED along the lane axis: one (S*128)-lane gather row
            # fetches every split's taps. The gather engine charges per ROW
            # nearly independent of width up to ~1 KB (measured 2026-08-20:
            # 3.7 / 4.8 / 4.9 ns/row at 256 B / 512 B / 1 KB rows), so this
            # halves (S=2) / quarters (S=4) the descriptor count vs
            # per-split gathers of the same bytes.
            cs = f.shape[-1] // s
            return jnp.concatenate([
                pack_patches(f[..., i * cs:(i + 1) * cs],
                             cfg["ph"], cfg["pw"]) for i in range(s)],
                axis=-1)

        return jax.vmap(jax.vmap(pk))(srcs)      # (B, V-1, Ht, Wt, S*Lh)
    return jax.vmap(jax.vmap(
        lambda f: pack_strips(f, cfg["strip_w"], cfg["window_h"])))(srcs)


def _block_view(table: Array, proj_mat: Array, depth_values: Array,
                height: int, width: int, align: int) -> Array:
    """Warp one source view via aligned-block gathers: exact bilinear.

    table: (B, H+2, nxb, 2*(align+1)*C) from pack_blocks. One gather row
    per sample (like quad), but the table has align-x fewer rows, keeping
    the gather engine in its fast regime at large resolutions. The tap
    select inside the block runs as hat weights on constant lane iotas +
    one stacked-identity matmul — the same fast epilogue pattern as the
    quad path, just 2*(align+1)*C wide.
    """
    B = table.shape[0]
    C = table.shape[-1] // (2 * (align + 1))
    D = depth_values.shape[1]
    coords = jax.vmap(
        lambda p, d: project_to_src(p, d, height, width))(proj_mat,
                                                          depth_values)
    x = coords[..., 0].astype(jnp.float32).reshape(B, -1)     # (B, N)
    y = coords[..., 1].astype(jnp.float32).reshape(B, -1)
    o = _block_sample(table, x, y, height, width, align)
    return o.reshape(B, D, height * width, C)


def _block_sample(table: Array, x: Array, y: Array,
                  height: int, width: int, align: int) -> Array:
    """Aligned-block gather + hat-lane epilogue for precomputed coords.

    table: (B, H+2, nxb, 2*(align+1)*C) from pack_blocks; x, y: (B, N) f32
    projected source-pixel coordinates. Returns (B, N, C) float32 bilinear
    samples with grid_sample zeros-padding semantics. Shared by _block_view
    and the patch sampler's past-the-row-cliff fallback branch.
    """
    B, Ht, nxb, L = table.shape
    bw = 2 * (align + 1)
    C = L // bw
    dtype = table.dtype
    vm = (((x > -1.0) & (x < float(width)) &
           (y > -1.0) & (y < float(height)))
          .astype(jnp.float32))[..., None]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    xi = jnp.clip(x0.astype(jnp.int32) + 1, 0, width)
    yi = jnp.clip(y0.astype(jnp.int32) + 1, 0, height)
    xb = xi // align
    idx = yi * nxb + xb                                       # (B, N)

    n_rows = B * Ht * nxb
    if n_rows <= _ROW_THRESH or B == 1:
        flat = table.reshape(n_rows, L)
        fidx = idx + (jnp.arange(B, dtype=jnp.int32) * (Ht * nxb))[:, None]
        rows = jnp.take(flat, fidx.reshape(-1), axis=0).reshape(B, -1, L)
    else:
        # per-element gathers inside one lax.scan (see banded_take.batched_take
        # for the measured unroll-vs-scan rates); the fold gate here is by ROW
        # COUNT because block tables are built to sit under the byte limit.
        def body(_, ti):
            t, i = ti
            return (), jnp.take(t, i, axis=0)

        _, rows = jax.lax.scan(body, (),
                               (table.reshape(B, Ht * nxb, L), idx))

    # tap (dy, dx) at lane (dy*(align+1)+dx)*C + c covers image pixel
    # (yi-1+dy, xb*align-1+dx); bilinear = hat products at those positions
    fx1 = (x - (xb * align - 1).astype(jnp.float32))[..., None]
    fy1 = (y - (yi - 1).astype(jnp.float32))[..., None]
    lane = np.arange(L)
    dxl = jnp.asarray(((lane // C) % (align + 1)).astype(np.float32))
    dyl = jnp.asarray((lane // ((align + 1) * C)).astype(np.float32))
    w = (jnp.maximum(0.0, 1.0 - jnp.abs(fx1 - dxl)) *
         jnp.maximum(0.0, 1.0 - jnp.abs(fy1 - dyl)) * vm)
    prod = rows * w.astype(dtype)
    kmat = jnp.asarray(_identity_stack(C, bw), dtype)
    return jax.lax.dot_general(
        prod, kmat, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _quad_view(table: Array, proj_mat: Array, depth_values: Array,
               height: int, width: int) -> Array:
    """Packed-quad warp of one source view with a HAND-WRITTEN backward.

    Forward is the classic packed-quad single-row-gather + 4-tap combine.
    Autodiff of that forward stores the expanded (N, 4C) tap-weight tensor
    and the d_prod intermediate as residuals — at level 2 (C=32, 128-lane
    rows) that residual traffic made the backward 4x the forward
    (scripts/profile_bwd.py: 73 ms bwd vs 18 ms fwd). The custom VJP keeps
    only the (B, D, hw) coordinates, rebuilds tap weights in the backward,
    and scatters cotangent rows banded (ops/banded_take) where the table
    is past the scatter cliff. Coordinates are gradient-stopped, like
    _patch_view (hypotheses are gradient-stopped by the cascade).
    """
    B, Hq, Wq, C4 = table.shape
    D = depth_values.shape[1]
    coords = jax.vmap(
        lambda p, d: project_to_src(p, d, height, width))(proj_mat,
                                                          depth_values)
    coords = jax.lax.stop_gradient(coords)
    xf = coords[..., 0].astype(jnp.float32).reshape(B, D, height * width)
    yf = coords[..., 1].astype(jnp.float32).reshape(B, D, height * width)
    static = (height, width, D, Hq, Wq, C4, str(table.dtype))
    return _quad_sample(static, table, {"x": xf, "y": yf})


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _quad_sample(static, table: Array, ops) -> Array:
    height, width, D, Hq, Wq, C4 = static[:6]
    B = table.shape[0]
    C = C4 // 4
    hw = height * width
    xy = jnp.stack([ops["x"], ops["y"]], axis=-1)
    w4, y0i, x0i = quad_weights(xy, height, width)
    idx = (y0i * Wq + x0i).reshape(B, -1)
    rows = _patch_gather(table, idx)
    return _tap_reduce(rows, w4.reshape(B, -1, 4)).reshape(B, D, hw, C)


def _quad_sample_fwd(static, table, ops):
    return _quad_sample(static, table, ops), ops


def _quad_sample_bwd(static, ops, g_out):
    height, width, D, Hq, Wq, C4, dtype_str = static
    g_out = g_out.astype(jnp.float32)                        # (B, D, hw, C)
    B = g_out.shape[0]
    C = C4 // 4
    hw = height * width
    xy = jnp.stack([ops["x"], ops["y"]], axis=-1)
    w4, y0i, x0i = quad_weights(xy, height, width)
    w4 = w4.reshape(B, -1, 4)
    idx = (y0i * Wq + x0i).reshape(B, -1)
    kT = jnp.asarray(_identity_stack(C, 4).T, jnp.float32)
    dp = jax.lax.dot_general(
        g_out.reshape(B, D * hw, C), kT,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (B, N, 4C)
    masks = _lane_masks(C)
    w4c = sum(w4[..., q:q + 1] * jnp.asarray(masks[q]) for q in range(4))
    upd = dp * w4c
    valid = jnp.max(w4, axis=-1) > 0
    bcfg = banded_cfg(Hq, Wq, D, height, width)
    if bcfg is not None:
        d_table = banded_scatter_add((D, height, width) + bcfg,
                                     Hq, Wq, idx, valid, upd)
    else:
        fidx = idx + (jnp.arange(B, dtype=jnp.int32) * (Hq * Wq))[:, None]
        d_table = (jnp.zeros((B * Hq * Wq, C4), jnp.float32)
                   .at[fidx.reshape(-1)].add(upd.reshape(-1, C4))
                   .reshape(B, Hq, Wq, C4))
    zero0 = np.zeros((), dtype=jax.dtypes.float0)

    def _cot(leaf):
        if jnp.issubdtype(leaf.dtype, jnp.inexact):
            return jnp.zeros_like(leaf)
        return np.broadcast_to(zero0, leaf.shape)

    return d_table.astype(jnp.dtype(dtype_str)), jax.tree.map(_cot, ops)


_quad_sample.defvjp(_quad_sample_fwd, _quad_sample_bwd)


def _sample_view(tables_v: Array, proj_mat_v: Array, depth_values: Array,
                 height: int, width: int, cfg) -> Array:
    """Warped features of one source view: (B, D, H*W, C).

    Patch mode returns the table dtype (bf16 on TPU — the Pallas epilogue
    stores rounded samples to halve its HBM boundary traffic); the other
    modes return float32. Consumers upcast in-register before
    accumulating.
    """
    if cfg["mode"] == "quad":
        return _quad_view(tables_v, proj_mat_v, depth_values, height, width)
    if cfg["mode"] == "block":
        return _block_view(tables_v, proj_mat_v, depth_values, height,
                           width, cfg["align"])
    if cfg["mode"] == "patch":
        return _patch_view(tables_v, proj_mat_v, depth_values, height,
                           width, cfg["ph"], cfg["pw"], cfg["groups"],
                           cfg["split"], cfg.get("fb_align", 0))
    return _window_view(tables_v, proj_mat_v, depth_values, height, width,
                        cfg["strip_w"], cfg["window_h"], cfg["depth_group"])


def batched_variance_cost_volume(feats: Array, proj_mats: Array,
                                 depth_values: Array,
                                 remat: bool = True,
                                 sampling: str = "auto") -> Array:
    """Variance cost volume over V views: E[f^2] - E[f]^2, batch-native.

    The reference view participates as an un-warped volume broadcast over
    depth, exactly as in the reference (/root/reference/models/mvsnet.py:137-141).

    feats: (B, V, H, W, C); proj_mats: (B, V-1, 3, 4);
    depth_values: (B, D, H, W) -> (B, D, H, W, C).
    sampling: "quad" (exact, one gather row per sample), "window" (shared
    window gathers, 3-5x fewer rows, exact while group spans fit the
    window), or "auto" (window where feasible).
    """
    B, V, H, W, C = feats.shape
    D = depth_values.shape[1]
    dtype = feats.dtype
    ref, srcs = feats[:, 0], feats[:, 1:]
    cfg = _resolve_sampling(sampling, C, D, H, W, dtype.itemsize)
    tables = _pack_tables(srcs, cfg)

    def build(tables, proj_mats, depth_values, ref):
        reff = ref.reshape(B, 1, H * W, C).astype(jnp.float32)
        s = jnp.broadcast_to(reff, (B, D, H * W, C))
        sq = s * s
        for v in range(V - 1):
            o = _sample_view(tables[:, v], proj_mats[:, v], depth_values,
                             H, W, cfg)
            # The patch sampler returns the table dtype (bf16 on TPU);
            # upcast in-register — the cast fuses into the accumulation,
            # keeping the E[f]/E[f^2] sums exact f32 over rounded samples.
            o = o.astype(jnp.float32)
            s = s + o
            sq = sq + o * o
        var = sq / V - (s / V) ** 2
        return var.astype(dtype).reshape(B, D, H, W, C)

    if remat:
        build = jax.checkpoint(build)
    return build(tables, proj_mats, depth_values, ref)


def batched_groupwise_cost_volume(feats: Array, proj_mats: Array,
                                  depth_values: Array, groups: int,
                                  remat: bool = True,
                                  sampling: str = "auto") -> Array:
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
    cfg = _resolve_sampling(sampling, C, D, H, W, dtype.itemsize)
    tables = _pack_tables(srcs, cfg)

    def build(tables, proj_mats, depth_values, ref):
        reff = ref.reshape(B, 1, H * W, C).astype(jnp.float32)
        gm = jnp.asarray(_group_mean_matrix(C, groups))
        acc = jnp.zeros((B, D, H * W, groups), jnp.float32)
        for v in range(V - 1):
            o = _sample_view(tables[:, v], proj_mats[:, v], depth_values,
                             H, W, cfg)
            prod = o.astype(jnp.float32) * reff
            acc = acc + jax.lax.dot_general(
                prod, gm, dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        corr = acc / (V - 1)
        return corr.astype(dtype).reshape(B, D, H, W, groups)

    if remat:
        build = jax.checkpoint(build)
    return build(tables, proj_mats, depth_values, ref)


def _maybe_barrier(cfg, *arrays):
    """Isolate the cost-volume build from surrounding layout/fusion choices.

    The aligned-block sampler's wide dot operand invites XLA to propagate
    layouts/fusions from FeatureNet/CostRegNet into the warp stage; in the
    composed cascade that measured 939 ms/view vs ~420 for the same stages
    compiled in isolation (scripts/probe_block_full.py). An
    optimization_barrier around the build restores the isolated behavior.
    """
    barrier = os.environ.get("CASMVS_CV_BARRIER", "auto")
    use = (barrier == "1"
           or (barrier == "auto" and cfg is not None
               and (cfg.get("mode") == "block"
                    or cfg.get("fb_align", 0) > 0)))
    if not use:
        return arrays if len(arrays) > 1 else arrays[0]
    out = jax.lax.optimization_barrier(arrays)
    return out if len(arrays) > 1 else out[0]


@functools.partial(jax.jit, static_argnames=("groups", "remat", "sampling"))
def build_cost_volume(feats: Array, proj_mats: Array, depth_values: Array,
                      groups: int = 1, remat: bool = True,
                      sampling: str = "auto") -> Array:
    """Batched cost volume dispatcher.

    feats: (B, V, H, W, C); proj_mats: (B, V-1, 3, 4);
    depth_values: (B, D, H, W). Returns (B, D, H, W, C or G).
    """
    cfg = _resolve_sampling(sampling, feats.shape[-1],
                            depth_values.shape[1], feats.shape[2],
                            feats.shape[3], feats.dtype.itemsize)
    feats, proj_mats, depth_values = _maybe_barrier(
        cfg, feats, proj_mats, depth_values)
    if groups == 1:
        vol = batched_variance_cost_volume(feats, proj_mats, depth_values,
                                           remat, sampling)
    else:
        vol = batched_groupwise_cost_volume(feats, proj_mats, depth_values,
                                            groups, remat, sampling)
    return _maybe_barrier(cfg, vol)
