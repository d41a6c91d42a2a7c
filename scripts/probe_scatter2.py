"""Scatter probe round 2: locate the row-count cliff precisely and measure
a BANDED scatter (probe_scatter.py found: fast ~7.7 ns/upd at <=21K target
rows, slow ~16 ns/upd at >=47K, independent of lanes/dtype).

Banded scatter = the warp-backward restructuring: updates are statically
tiled by ref-image row block; each tile's updates target a small dynamic
band of the source table (the warp maps ref-row tiles to bounded src-row
bands), so each scatter's target is under the cliff. Measures the
end-to-end banded pipeline: per-tile dynamic band start (device min),
local-index rebase, small scatters, dynamic read-modify-write accumulation
back into the full-size gradient table.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from casmvsnet_pl_tpu.utils.devtime import device_time

print("backend:", jax.default_backend(), flush=True)
rng = np.random.RandomState(0)


def mk_updates(n_target_rows, lanes, n_updates):
    base = np.arange(n_updates, dtype=np.int64) % n_target_rows
    jit = rng.randint(-3, 4, size=n_updates)
    idx = jnp.asarray(
        np.clip(base + jit * 1153, 0, n_target_rows - 1).astype(np.int32))
    upd = jnp.asarray(rng.rand(n_updates, lanes).astype(np.float32)) \
        .astype(jnp.bfloat16)
    return idx, upd


def probe(tag, n_target_rows, lanes, n_updates, iters=8):
    idx, upd = mk_updates(n_target_rows, lanes, n_updates)
    table = jnp.zeros((n_target_rows, lanes), jnp.bfloat16)

    def f(tb, ix, ct):
        g = jax.grad(lambda t: jnp.sum(
            jnp.take(t, ix, axis=0).astype(jnp.float32)
            * ct.astype(jnp.float32)))(tb)
        return jnp.sum(g.astype(jnp.float32))

    dt = device_time(f, table, idx, upd, iters=iters)
    ns = dt * 1e9 / n_updates
    print(f"{tag:44s} tgt={n_target_rows/1e3:7.1f}K rows  "
          f"{dt*1e3:8.2f} ms  {ns:6.2f} ns/upd", flush=True)
    return ns


print("\n-- fine cliff sweep (32 lanes, 2.62M upd) --", flush=True)
for rows in (2_500, 5_000, 10_000, 21_000, 26_000, 31_000, 36_000, 41_000):
    probe(f"rows={rows}", rows, 32, 2_621_440)


# ---------------------------------------------------------------------------
# banded scatter: L0 train-res geometry
#   table: (H+2)(W+2) cells = 514*642 = 330K rows x 32 lanes
#   updates: D=8 x H x W per (b, v); idx ~ warp: src_cell(y, x) approx
#   (y + drift(d), x + shift) -> update u at (d, y, x) targets row
#   (y + dy) * 642 + (x + dx) with small data-dependent dy.
# ---------------------------------------------------------------------------
H, W, D = 512, 640, 8
CW = W + 2               # cells per src row
N_ROWS = (H + 2) * CW
LANES = 32


def mk_warp_updates():
    """Updates laid out (D, H, W): target rows follow a warp-like map."""
    y = np.arange(H)[None, :, None]
    x = np.arange(W)[None, None, :]
    d = np.arange(D)[:, None, None]
    dy = np.round(0.08 * y + 0.6 * d + 3.0).astype(np.int64)   # slope 1.08
    dx = np.round(0.05 * x + 1.7 * d).astype(np.int64)
    sy = np.clip(y + dy, 0, H + 1)
    sx = np.clip(x + dx, 0, W + 1)
    idx = (sy * CW + sx).astype(np.int32).reshape(D, H, W)
    upd = rng.rand(D, H, W, LANES).astype(np.float32)
    return jnp.asarray(idx), jnp.asarray(upd).astype(jnp.bfloat16)


def banded(idx, upd, tile_rows, band_src_rows):
    """Exact banded scatter-add -> (N_ROWS, LANES) f32 gradient table."""
    n_tiles = H // tile_rows
    bz = band_src_rows * CW
    idx_t = idx.reshape(D, n_tiles, tile_rows, W)
    upd_t = upd.reshape(D, n_tiles, tile_rows, W, LANES)

    # per-tile dynamic band start (sublane-aligned src row)
    start = (jnp.min(idx_t, axis=(0, 2, 3)) // CW) * CW        # (n_tiles,)
    local = idx_t - start[None, :, None, None]
    overflow = jnp.any((local < 0) | (local >= bz))

    def one_tile(t, table):
        loc = jax.lax.dynamic_index_in_dim(
            jnp.moveaxis(local, 1, 0), t, 0, keepdims=False)   # (D,tr,W)
        u = jax.lax.dynamic_index_in_dim(
            jnp.moveaxis(upd_t, 1, 0), t, 0, keepdims=False)
        band = jnp.zeros((bz, LANES), jnp.float32)
        band = band.at[loc.reshape(-1)].add(
            u.reshape(-1, LANES).astype(jnp.float32))
        s = jax.lax.dynamic_index_in_dim(start, t, 0, keepdims=False)
        cur = jax.lax.dynamic_slice(table, (s, 0), (bz, LANES))
        return jax.lax.dynamic_update_slice(table, cur + band, (s, 0))

    def fast(_):
        table = jnp.zeros((N_ROWS + bz, LANES), jnp.float32)   # pad tail
        table = jax.lax.fori_loop(0, n_tiles, one_tile, table)
        return table[:N_ROWS]

    def slow(_):
        return (jnp.zeros((N_ROWS, LANES), jnp.float32)
                .at[idx.reshape(-1)].add(
                    upd.reshape(-1, LANES).astype(jnp.float32)))

    return jax.lax.cond(overflow, slow, fast, None)


def monolithic(idx, upd):
    return (jnp.zeros((N_ROWS, LANES), jnp.float32)
            .at[idx.reshape(-1)].add(
                upd.reshape(-1, LANES).astype(jnp.float32)))


idx, upd = mk_warp_updates()
# round-1 result: bands of 64/96/128 src rows (41-82K target rows) sit ABOVE
# the ~26K-row cliff -> only 1.2x.  The fine sweep puts the cliff between 26K
# and 31K target rows, i.e. band <= 40 src rows (40*642 = 25.7K).
CONFIGS = ((16, 16), (16, 24), (16, 32), (32, 32), (32, 40), (16, 64))

# correctness first (tiny check on device)
ref = monolithic(idx, upd)
for tr, br in CONFIGS:
    got = banded(idx, upd, tr, br)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"banded tile={tr} band={br}: max err vs monolithic = {err}",
          flush=True)

print("\n-- banded vs monolithic, L0 geometry (2.62M upd) --", flush=True)


def t(label, fn, *a, iters=8):
    dt = device_time(fn, *a, iters=iters)
    print(f"{label:44s} {dt*1e3:8.2f} ms  "
          f"{dt*1e9/(D*H*W):6.2f} ns/upd", flush=True)


t("monolithic 330K", lambda i, u: jnp.sum(monolithic(i, u)), idx, upd)
for tr, br in CONFIGS:
    t(f"banded tile={tr} band={br} ({br*CW/1e3:.0f}K tgt)",
      lambda i, u, a=tr, b=br: jnp.sum(banded(i, u, a, b)), idx, upd)
print("done", flush=True)
