"""Row-gather with a BANDED scatter-add backward for large quad tables.

Why this exists (all numbers measured on v5e, scripts/probe_scatter.py /
probe_scatter2.py): the TPU scatter engine — the VJP of a row gather — has
the same rate cliff as the gather engine but keyed on the scatter TARGET
row count and with lower thresholds: ~7.7 ns/update at <= ~26K target rows,
~16.7 ns at >= ~31K, ~90 ns past ~1.3M, independent of row width (32..128
lanes) and dtype. At DTU train resolution the quad sampling tables of
cascade levels 1 and 0 have 82.5K and 329K rows, so the default
``jnp.take`` VJP runs the warp backward at the slow rate (~18 ns/row,
~446 ms of a 675 ms train step).

The fix: plane-sweep gather indices are STRUCTURED — a tile of consecutive
reference-image rows and consecutive depth hypotheses maps into a bounded
band of source-table rows (the epipolar drift across a tile is small). The
custom backward here tiles the updates statically by (depth-group,
ref-row-block), computes each tile's dynamic band start (min valid index,
floored to a table-row boundary), scatters into a band-sized buffer that
sits UNDER the cliff, and accumulates the band into the full gradient
table with a dynamic-slice read-modify-write. Out-of-image samples carry
exactly-zero cotangents (their bilinear weights are all zero, so the
cotangent of their gathered row is zero), so they are clipped into the
band without affecting correctness; genuine band overflows of VALID
samples trigger an exact monolithic-scatter fallback via ``lax.cond``.
Measured end-to-end at level-0 geometry: 8.8-9.2 ns/update, 23 ms vs
41 ms monolithic (1.78x), with the fallback verified exact.

The forward is byte-identical to the plain gather path in
``plane_sweep`` (batch-folded single gather when the folded table stays
under the gather fast-regime byte limit, else one gather per batch
element). The production quad/patch samplers now carry their own custom
VJPs (plane_sweep._quad_sample / _patch_sample) built on
:func:`banded_scatter_add`; this wrapper remains the standalone
gather-with-banded-backward primitive.

Reference behavior being accelerated: the backward of the reference's
``F.grid_sample`` inside ``homo_warp`` (/root/reference/models/modules.py:87-89).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.patch_epilogue import _on_tpu

Array = jax.Array

# Scatter-rate cliff by TARGET row count (scripts/probe_scatter2.py fine
# sweep: 7.8 ns/upd at 26K rows, 16.9 ns at 31K).
_SCATTER_FAST_ROWS = 26_000
# Gather fold limit — must match plane_sweep._FOLD_LIMIT so the forward is
# byte-identical with the default path.
_GATHER_FOLD_LIMIT = 24 * 1024 * 1024


def batched_take(table: Array, idx: Array) -> Array:
    """Per-batch-element row gather: (B, R, L) table, (B, N) idx -> (B, N, L).

    Small tables fold into ONE gather over the concatenated rows (fast
    regime, no loop). Past the fold byte limit the folded table falls off
    the gather-rate cliff (12-13 ns/row), so large tables gather per batch
    element — inside ONE lax.scan, not a Python unroll: the unroll emitted
    O(B) gather+stack HLO ops, ran 7-9 ns/row (the stack copy), inverted
    bench batch scaling (27.8 maps/s at B=1 vs 22.5 at B=4, round 3) and
    blew the B=8 compile budget. The scan measures a flat 4.1-4.2 ns/row
    at B=2..8 with constant-size HLO (scripts/probe_batch_scale.py).
    Reverse-differentiable (scan), though production samplers wrap it in
    custom VJPs.
    """
    B, R, L = table.shape
    if table.size * table.dtype.itemsize <= _GATHER_FOLD_LIMIT or B == 1:
        flat = table.reshape(B * R, L)
        fidx = idx + (jnp.arange(B, dtype=jnp.int32) * R)[:, None]
        return jnp.take(flat, fidx.reshape(-1), axis=0).reshape(B, -1, L)

    def body(_, ti):
        t, i = ti
        return (), jnp.take(t, i, axis=0)

    _, rows = jax.lax.scan(body, (), (table, idx))
    return rows


# Gather fast-regime row budget (PERF_NOTES "Gather engine": rates collapse
# from ~3-5 to ~11-12 ns/row past ~340K source rows). Mirrors
# plane_sweep._ROW_THRESH; duplicated to avoid a circular import.
_GATHER_FAST_ROWS = 340_000


def gather_band_cfg(R: int, Wt: int, H: int, lane_bytes: int = 256):
    """Static banding parameters for the FORWARD gather, or None.

    Banding only pays when the source table is past the gather fast
    regime. Two measured slow regimes (v5e):

    * past the ~340K ROW budget — eval-res L0: 999K-row/256B tables
      gather at 12.1 ns/row; banded (tile 96, band 128) 3.84 ms vs
      12.05 mono (scripts/probe_banded_gather.py);
    * WIDE rows past the byte budget — eval-res L1: 251K rows x 512 B
      (128 MB) gathers at 14.0 ns/row; banded (tile 48, band 96)
      3.65 vs 6.98 ms (scripts/probe_banded_l1.py).

    Fast tables must stay monolithic: eval-res L2 (63K x 1KB) gathers
    at its floor already and banding LOSES (1.72 vs 1.06 ms), and the
    bench-res L0 table (330K x 256B / 84 MB) is measured fast. Too-thin
    bands overflow on real geometry and correctly fall back. Returns
    (tile_rows, band_rows).
    """
    # "0" = off, "1" = force-enable on any backend (tests), default =
    # TPU only: the thresholds are v5e gather-engine measurements; on
    # CPU/GPU the banded path is strictly extra memory traffic.
    env = os.environ.get("CASMVS_BANDED_GATHER", "auto")
    if env == "0" or (env != "1" and not _on_tpu()):
        return None
    wide_slow = R > 150_000 and lane_bytes > 256
    if R <= _GATHER_FAST_ROWS and not wide_slow:
        return None
    grid = ((48, 96), (24, 64), (16, 48), (8, 32)) if lane_bytes > 256 \
        else ((96, 128), (32, 64), (16, 64), (8, 64))
    for tile_rows, band_rows in grid:
        # the band must fit inside the table (short-but-wide geometries
        # can otherwise pick band_rows > Ht and trip the trace-time
        # assert in banded_gather_rows instead of degrading to mono)
        if H % tile_rows == 0 and band_rows * Wt <= R:
            return tile_rows, band_rows
    return None


def banded_gather_rows(table: Array, idx: Array, valid: Array, ng: int,
                       H: int, W: int, Wt: int, tile_rows: int,
                       band_rows: int) -> Array:
    """Row gather from a past-the-cliff table via per-tile band slices.

    table: (B, R, L) with R = Ht*Wt source rows; idx: (B, ng*H*W) row
    indices laid out (group, ref-row-major pixels); valid: (B, ng*H*W)
    bool — False rows may gather arbitrary band content (their bilinear
    weights are zero downstream), but only VALID rows constrain the band.
    A tile whose valid rows escape its band triggers an exact
    monolithic-gather fallback for the whole batch element (lax.cond).
    Returns (B, ng*H*W, L) in table.dtype.
    """
    B, R, L = table.shape
    bz = band_rows * Wt
    m = tile_rows * W
    nt = idx.shape[1] // m
    # Enforce the documented layout contract: idx is (group, ref-row-major
    # pixels), so the tiles must cover it exactly, group-aligned.
    assert bz <= R and nt * m == idx.shape[1] \
        and nt == ng * (H // tile_rows), (bz, R, nt, m, ng, H, idx.shape)
    big = jnp.int32(np.iinfo(np.int32).max)

    def one(t, i, v):
        it = i.reshape(nt, m)
        vt = v.reshape(nt, m)
        mn = jnp.min(jnp.where(vt, it, big), axis=1)
        start = jnp.clip(mn // Wt * Wt, 0, R - bz)
        local = it - start[:, None]
        overflow = jnp.any(vt & ((local < 0) | (local >= bz)))
        local = jnp.clip(local, 0, bz - 1)

        def tile(_, x):
            s, loc = x
            band = jax.lax.dynamic_slice(t, (s, 0), (bz, L))
            return (), jnp.take(band, loc, axis=0)

        def fast(_):
            _, rows = jax.lax.scan(tile, (), (start, local))
            return rows.reshape(-1, L)

        def slow(_):
            return jnp.take(t, i, axis=0)

        return jax.lax.cond(overflow, slow, fast, None)

    if B == 1:
        return one(table[0], idx[0], valid[0])[None]

    def body(_, x):
        t, i, v = x
        return (), one(t, i, v)

    _, rows = jax.lax.scan(body, (), (table, idx, valid))
    return rows


def banded_cfg(Hq: int, Wq: int, D: int, H: int, W: int):
    """Static banding parameters for a level, or None to use a monolithic
    scatter.

    Returns (tile_rows, band_rows, d_split): reference-image rows per tile,
    source-table rows per band (band_rows * Wq scatter-target rows, kept
    under the cliff), and the number of depth-axis groups (bounding the
    epipolar drift per tile so bands hold on real geometry).

    Policy from the round-3 tile sweep (scripts/probe_scatter3.py, v5e,
    DTU train-res geometry): banding wins only when each tile's updates
    amortize the band read-modify-write — updates/tile >= band targets.
    That keeps the round-2 quad wins (L0 quad: 8 hypotheses x 16 rows =
    82K upd vs 25.6K band targets, 23 vs 41 ms mono) and routes the patch
    backward at L0 (ng=1: 10K upd/tile, banding measured 12.2 vs mono
    10.8 ms) to the monolithic path. Within that, the largest tile with
    2x drift headroom wins: tr=64 at L2 (2.66 vs 3.61 ms mono), tr=32 at
    L1 (8.70 vs 9.82 at the old tr=16). Batch-unrolling the monolithic
    scatter does not help (probe_scatter3b: fold ~= unroll).
    """
    if os.environ.get("CASMVS_BANDED_BWD", "1") == "0":
        return None
    if Hq * Wq <= 8_192:
        return None                       # tiny tables: mono is fine
    band_rows = min(Hq, (_SCATTER_FAST_ROWS // Wq) // 8 * 8)
    if band_rows < 32:
        return None                       # band too thin to cover any drift
    # Depth groups of <= 8 consecutive hypotheses: the cascade's recentered
    # windows drift sub-pixel per hypothesis, so 8 stay well inside a band.
    d_split = D // 8 if (D % 8 == 0 and D > 8) else 1
    gd = D // d_split
    for tile_rows in (64, 32, 16, 8):
        if H % tile_rows or 2 * tile_rows > band_rows:
            continue
        if gd * tile_rows * W >= band_rows * Wq:   # amortize the band RMW
            return tile_rows, band_rows, d_split
    return None


def _banded_grad_one(idx_b: Array, valid_b: Array, g_b: Array, D: int,
                     H: int, W: int, Hq: int, Wq: int, tile_rows: int,
                     band_rows: int, d_split: int) -> Array:
    """Banded scatter-add of one batch element's cotangents.

    idx_b: (N,) int32 table-row targets, N = D*H*W; valid_b: (N,) bool
    (False rows carry zero cotangent); g_b: (N, L). Returns (Hq*Wq, L) f32.
    """
    L = g_b.shape[-1]
    n_tiles = H // tile_rows
    gd = D // d_split
    nt = d_split * n_tiles
    bz = band_rows * Wq
    m = gd * tile_rows * W                # updates per tile

    def tiled(a):
        a = a.reshape((d_split, gd, n_tiles, tile_rows, W) + a.shape[1:])
        a = jnp.moveaxis(a, 2, 1)         # (d_split, n_tiles, gd, tr, W, ...)
        return a.reshape((nt, m) + a.shape[5:])

    idx_t = tiled(idx_b)                  # (nt, m)
    val_t = tiled(valid_b)                # (nt, m)
    g_t = tiled(g_b.astype(jnp.float32))  # (nt, m, L)

    big = jnp.int32(np.iinfo(np.int32).max)
    min_valid = jnp.min(jnp.where(val_t, idx_t, big), axis=1)   # (nt,)
    start_row = jnp.clip(min_valid // Wq, 0, Hq - 1)            # (nt,)
    start = start_row * Wq
    local = idx_t - start[:, None]
    overflow = jnp.any(val_t & ((local < 0) | (local >= bz)))
    local = jnp.clip(local, 0, bz - 1)    # invalid samples: zero g, any slot

    def one_tile(t, table):
        loc = jax.lax.dynamic_index_in_dim(local, t, 0, keepdims=False)
        u = jax.lax.dynamic_index_in_dim(g_t, t, 0, keepdims=False)
        band = jnp.zeros((bz, L), jnp.float32).at[loc].add(u)
        s = jax.lax.dynamic_index_in_dim(start, t, 0, keepdims=False)
        cur = jax.lax.dynamic_slice(table, (s, 0), (bz, L))
        return jax.lax.dynamic_update_slice(table, cur + band, (s, 0))

    def fast(_):
        table = jnp.zeros((Hq * Wq + bz, L), jnp.float32)       # band guard
        table = jax.lax.fori_loop(0, nt, one_tile, table)
        return table[:Hq * Wq]

    def slow(_):
        return (jnp.zeros((Hq * Wq, L), jnp.float32)
                .at[idx_b].add(g_b.astype(jnp.float32)))

    return jax.lax.cond(overflow, slow, fast, None)


def banded_scatter_add(geom, Hq: int, Wq: int, idx: Array, valid: Array,
                       updates: Array) -> Array:
    """Batched banded scatter-add: the backward half of take_quad_banded,
    exposed for custom VJPs that build their own cotangent rows (e.g. the
    patch sampler's hand-written backward, plane_sweep._patch_view).

    geom: static (D, H, W, tile_rows, band_rows, d_split) as in banded_cfg;
    idx: (B, N) int32 table-row targets; valid: (B, N) bool (False rows
    must carry zero updates); updates: (B, N, L). Returns (B, Hq, Wq, L)
    float32 accumulated gradients.
    """
    D, H, W, tile_rows, band_rows, d_split = geom
    B = idx.shape[0]
    L = updates.shape[-1]

    # lax.scan over batch, not a Python unroll: same per-element work, but
    # constant-size HLO and no O(B * Hq*Wq*L) stack copy at the end (the
    # gather-side measurement and rationale live on batched_take above).
    def body(_, x):
        i, v, u = x
        return (), _banded_grad_one(i, v, u.reshape(-1, L), D, H, W,
                                    Hq, Wq, tile_rows, band_rows, d_split)

    _, grads = jax.lax.scan(body, (), (idx, valid, updates))
    return grads.reshape(B, Hq, Wq, L)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def take_quad_banded(geom, tables: Array, idx: Array,
                     valid: Array) -> Array:
    """Gather quad/table rows with the banded backward.

    geom: static (D, H, W, tile_rows, band_rows, d_split).
    tables: (B, Hq, Wq, L); idx: (B, N) per-batch-local row indices,
    N = D*H*W; valid: (B, N) bool, False where ALL the sample's bilinear
    taps have zero weight (such rows receive exactly-zero cotangents).
    Returns rows (B, N, L) in tables.dtype.
    """
    B, Hq, Wq, L = tables.shape
    return batched_take(tables.reshape(B, Hq * Wq, L), idx)


def _tqb_fwd(geom, tables, idx, valid):
    return take_quad_banded(geom, tables, idx, valid), (tables, idx, valid)


def _tqb_bwd(geom, res, g):
    tables, idx, valid = res
    B, Hq, Wq, L = tables.shape
    g = g.reshape(B, -1, L)
    gt = banded_scatter_add(geom, Hq, Wq, idx, valid, g).astype(tables.dtype)
    zero = np.zeros((), dtype=jax.dtypes.float0)
    return (gt,
            np.broadcast_to(zero, idx.shape),
            np.broadcast_to(zero, valid.shape))


take_quad_banded.defvjp(_tqb_fwd, _tqb_bwd)
