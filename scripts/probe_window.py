"""Probe: gather rate for window-packed tables (one row serves a whole
depth-group) at L0/L1 configs.

The quad path charges one gather row per (pixel, depth, view). If a table
row instead holds a KHxKW patch covering all taps of Gd consecutive depth
hypotheses, the row count drops Gd-x — IF the gather rate survives the
KHxKW/4-times-larger table. This probe measures exactly that rate, with
coherent raster-order indices (what a real warp produces).
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
dtype = jnp.bfloat16
rng = np.random.RandomState(0)


def t(label, fn, *a, iters=12):
    dt = device_time(fn, *a, iters=iters)
    print(f"{label:58s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def probe(tag, H, W, C, taps, n_rows_gathered, iters=12):
    """Gather n_rows_gathered rows of taps*C lanes from an (H*W)-row table."""
    lanes = taps * C
    table = jnp.asarray(
        rng.rand(H * W, lanes).astype(np.float32)).astype(dtype)
    mb = H * W * lanes * 2 / 1e6
    # coherent raster indices with small jitter (epipolar offset)
    base = np.arange(n_rows_gathered, dtype=np.int64) % (H * W)
    jit = rng.randint(-3, 4, size=n_rows_gathered)
    idx = jnp.asarray(np.clip(base + jit * W, 0, H * W - 1).astype(np.int32))

    def f(tb, ix):
        return jnp.sum(jnp.take(tb, ix, axis=0).astype(jnp.float32))

    dt = device_time(f, table, idx, iters=iters)
    ns = dt * 1e9 / n_rows_gathered
    print(f"{tag:44s} table={mb:7.1f}MB lanes={lanes:4d} "
          f"rows={n_rows_gathered/1e6:5.2f}M  {dt*1e3:7.2f} ms  "
          f"{ns:5.2f} ns/row", flush=True)
    return dt


# L0: H=512 W=640 C=8. Current quad: 4C=32 lanes, rows=B*D*hw per view.
hw = 512 * 640
B, D = 2, 8
probe("L0 quad 2x2 (current, per-batch calls x1)", 513, 641, 8, 4, D * hw)
probe("L0 win 2x8 Gd=8 (1 row/pixel)", 513, 648, 8, 16, B * hw)
probe("L0 win 3x5 Gd=4 (2 rows/pixel)", 514, 645, 8, 15, 2 * B * hw)
probe("L0 win 3x8 Gd=8 192 lanes", 514, 648, 8, 24, B * hw)

# L1: H=256 W=320 C=16. Current: 64 lanes, rows=B*D*hw.
hw1 = 256 * 320
D1 = 32
probe("L1 quad 2x2 (current, folded)", 2 * 257, 321, 16, 4, B * D1 * hw1)
probe("L1 win 3x5 Gd=2 240 lanes", 258, 325, 16, 15, B * (D1 // 2) * hw1)
probe("L1 win 3x8 Gd=4 384 lanes", 258, 328, 16, 24, B * (D1 // 4) * hw1)
probe("L1 win 2x8 Gd=4 256 lanes", 257, 328, 16, 16, B * (D1 // 4) * hw1)
print("done", flush=True)
