"""Probe: BANDED forward gather at eval-res L0 (round-5 task 3).

At 1152x864 the L0 patch table has ~999K rows / 256 MB bf16 — past every
measured gather budget, so rows gather at the ~11-12 ns/row slow regime
(PERF_NOTES "Gather engine"). But plane-sweep indices are structured: a
tile of consecutive ref-image rows maps into a bounded band of source
table rows (same observation the banded scatter backward exploits,
ops/banded_take.py). This probe gathers per ref-row tile from a
dynamically-positioned band slice of the table that sits UNDER the
cliff, and measures whether the fast-regime rate + slice copies beat the
monolithic slow-regime gather.

Variants: mono (batched_take), banded at tile_rows x band_rows grid,
each with and without an optimization_barrier forcing the band slice to
materialize (if XLA fuses the slice into the gather the operand stays
table-sized and the rate may not recover).

Usage: python scripts/probe_banded_gather.py [baseline_mm]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp
import numpy as np

from probe_patch import rig_proj


def main():
    from casmvsnet_pl_tpu.ops import plane_sweep as ps
    from casmvsnet_pl_tpu.ops.banded_take import batched_take
    from casmvsnet_pl_tpu.ops.geometry import project_to_src
    from casmvsnet_pl_tpu.utils.devtime import device_time

    B, D, C = 1, 8, 8
    H, W = 864, 1152
    hw = H * W
    Ht, Wt = H + 2, W + 2
    L = 128
    baseline = float(sys.argv[1]) if len(sys.argv) > 1 else 12.0
    rng = np.random.RandomState(0)
    ref, src = rig_proj(baseline, W, H)
    rel = (src @ np.linalg.inv(ref))[:3].astype(np.float32)
    proj = jnp.asarray(np.tile(rel, (B, 1, 1)))
    base = 650.0 + (np.arange(D, dtype=np.float32) - D / 2) * 2.65
    depths = jnp.asarray(np.tile(base[:, None, None],
                                 (B, 1, H, W)).astype(np.float32))
    table = jnp.asarray(rng.randn(B, Ht * Wt, L), jnp.bfloat16)

    # Realistic group-shared indices: g=8 covers all D=8 at this rig, so
    # one gathered row per ref pixel (ng=1), exactly the production L0
    # shape. Compute the patch origin like _patch_view does.
    def make_idx(proj, depths):
        coords = jax.vmap(
            lambda p, d: project_to_src(p, d, H, W))(proj, depths)
        x = coords[..., 0].astype(jnp.float32).reshape(B, D, hw)
        y = coords[..., 1].astype(jnp.float32).reshape(B, D, hw)
        valid = ((x > -1.0) & (x < float(W)) & (y > -1.0) & (y < float(H)))
        big = jnp.float32(1e9)
        minx = jnp.min(jnp.where(valid, x, big), axis=1)       # (B, hw)
        miny = jnp.min(jnp.where(valid, y, big), axis=1)
        x_org = jnp.clip(jnp.floor(minx), -1.0, W - 1.0)
        y_org = jnp.clip(jnp.floor(miny), -1.0, H - 1.0)
        xi = x_org.astype(jnp.int32) + 1
        yi = y_org.astype(jnp.int32) + 1
        idx = yi * Wt + xi                                     # (B, hw)
        vg = jnp.any(valid, axis=1)                            # (B, hw)
        return idx, vg

    idx, valid = jax.jit(make_idx)(proj, depths)
    idx, valid = jax.block_until_ready(idx), jax.block_until_ready(valid)
    N = hw

    def mono(table, idx):
        return jnp.sum(batched_take(table, idx).astype(jnp.float32))

    def banded(table, idx, valid, tile_rows, band_rows, barrier):
        t = table[0]
        bz = band_rows * Wt
        m = tile_rows * W
        nt = N // m
        it = idx[0].reshape(nt, m)
        vt = valid[0].reshape(nt, m)
        big = jnp.int32(np.iinfo(np.int32).max)
        mn = jnp.min(jnp.where(vt, it, big), axis=1)
        start = jnp.clip(mn // Wt * Wt, 0, Ht * Wt - bz)
        local = it - start[:, None]
        overflow = jnp.any(vt & ((local < 0) | (local >= bz)))
        local = jnp.clip(local, 0, bz - 1)

        def body(_, x):
            s, loc = x
            band = jax.lax.dynamic_slice(t, (s, 0), (bz, L))
            if barrier:
                band = jax.lax.optimization_barrier(band)
            return (), jnp.take(band, loc, axis=0)

        def fast(_):
            _, rows = jax.lax.scan(body, (), (start, local))
            return rows.reshape(N, L)

        def slow(_):
            return jnp.take(t, idx[0], axis=0)

        rows = jax.lax.cond(overflow, slow, fast, None)
        return jnp.sum(rows.astype(jnp.float32))

    t0 = device_time(mono, table, idx, iters=8)
    print(f"mono gather {N} rows: {t0*1e3:7.2f} ms "
          f"({t0/N*1e9:.2f} ns/row)", flush=True)

    for tr in (32, 64, 96):
        for br in (32, 64, 128):
            if H % tr:
                continue
            for barrier in (False, True):
                def f(t_, i_, v_, tr=tr, br=br, ba=barrier):
                    return banded(t_, i_, v_, tr, br, ba)
                dt = device_time(f, table, idx, valid, iters=8)
                print(f"banded tr={tr:3d} br={br:3d} barrier={barrier}: "
                      f"{dt*1e3:7.2f} ms ({dt/N*1e9:.2f} ns/row)",
                      flush=True)


if __name__ == "__main__":
    main()
