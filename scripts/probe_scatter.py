"""Scatter-add (gather-VJP) rate vs target table rows / lanes / dtype.

PERF_NOTES.md backlog #1: the warp backward runs ~18 ns per scattered row
(446 ms of the 675 ms train step). Question: does the scatter rate have the
same table-ROW-COUNT cliff as the gather engine (~2.4 ns/row under ~340K
source rows, ~11-12 above)? If yes, scattering into aligned-BLOCK tables
(A-x fewer target rows) should restore the fast rate and block-mode
training becomes the default.

Sweeps target-table rows x lanes x dtype at a fixed update count, then the
exact per-level geometries of the train-res backward.
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


def probe(tag, n_target_rows, lanes, n_updates, dtype=jnp.bfloat16,
          iters=8, mode="grad"):
    mb = n_target_rows * lanes * dtype.dtype.itemsize / 1e6
    base = np.arange(n_updates, dtype=np.int64) % n_target_rows
    jit = rng.randint(-3, 4, size=n_updates)
    idx = jnp.asarray(
        np.clip(base + jit * 1153, 0, n_target_rows - 1).astype(np.int32))
    upd = jnp.asarray(rng.rand(n_updates, lanes).astype(np.float32)) \
        .astype(dtype)
    table = jnp.zeros((n_target_rows, lanes), dtype)

    if mode == "grad":
        # the real thing: VJP of jnp.take, exactly what the train step runs
        def f(tb, ix, ct):
            g = jax.grad(
                lambda t: jnp.sum(jnp.take(t, ix, axis=0).astype(
                    jnp.float32) * ct.astype(jnp.float32)))(tb)
            return jnp.sum(g.astype(jnp.float32))
    else:
        def f(tb, ix, ct):
            g = tb.at[ix].add(ct)
            return jnp.sum(g.astype(jnp.float32))

    dt = device_time(f, table, idx, upd, iters=iters)
    ns = dt * 1e9 / n_updates
    print(f"{tag:40s} tgt={n_target_rows/1e3:7.0f}K rows x{lanes:4d} "
          f"({mb:6.1f}MB {dtype.dtype.name}) upd={n_updates/1e6:5.2f}M "
          f"{dt*1e3:8.2f} ms  {ns:6.2f} ns/upd", flush=True)
    return ns


N_UPD = 2_621_440  # level-0/1 train-res updates per (view, batch-elem)

print("\n-- cliff sweep: fixed 2.62M updates, 32 lanes, bf16 --", flush=True)
for rows in (20_000, 83_000, 165_000, 330_000, 660_000, 1_320_000):
    probe(f"sweep rows={rows}", rows, 32, N_UPD)

print("\n-- lane sweep at 330K target rows --", flush=True)
for lanes in (32, 64, 128):
    probe(f"lanes={lanes}", 330_000, lanes, N_UPD)

print("\n-- dtype: f32 updates --", flush=True)
probe("f32 330K x32", 330_000, 32, N_UPD, dtype=jnp.float32)
probe("f32 21K x128", 21_000, 128, 983_040, dtype=jnp.float32)

print("\n-- exact per-level train-res geometries (bf16, quad tables) --",
      flush=True)
# level: (table rows (H+2)(W+2) at level res, lanes 4C, updates D*hw)
probe("L0 quad C=8", 514 * 642, 32, 8 * 512 * 640)
probe("L1 quad C=16", 258 * 322, 64, 32 * 256 * 320)
probe("L2 quad C=32", 130 * 162, 128, 48 * 128 * 160)

print("\n-- block-table targets (A-x fewer rows, 128 lanes) --", flush=True)
# L0 C=8: A=7 -> rows/7; row width 2*(A+1)*C = 128 lanes
probe("L0 block A=7", 514 * 642 // 7, 128, 8 * 512 * 640)
# L1 C=16: A=3 -> rows/3; width 2*4*16=128
probe("L1 block A=3", 258 * 322 // 3, 128, 32 * 256 * 320)

print("\n-- .at[].add vs grad-of-take (sanity, one point) --", flush=True)
probe("atadd 330K x32", 330_000, 32, N_UPD, mode="atadd")
print("done", flush=True)
