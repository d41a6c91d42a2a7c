"""Scatter-add rate vs target-table geometry: does the gather engine's
row-count cliff apply to the gather-VJP scatter (the training-step
bottleneck, ~18 ns/row measured indirectly via profile_bwd.py)?"""
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


def probe(tag, t_rows, lanes, n, dtype=jnp.float32, iters=8):
    upd = jnp.asarray(rng.rand(n, lanes).astype(np.float32)).astype(dtype)
    base = np.arange(n, dtype=np.int64) % t_rows
    jit = rng.randint(-3, 4, size=n)
    idx = jnp.asarray(np.clip(base + jit * 640, 0, t_rows - 1).astype(np.int32))

    def f(u, ix):
        tb = jnp.zeros((t_rows, lanes), u.dtype)
        tb = tb.at[ix].add(u)
        return jnp.sum(tb.astype(jnp.float32)[::97])

    dt = device_time(f, upd, idx, iters=iters)
    ns = dt * 1e9 / n
    print(f"{tag:46s} rows={t_rows/1e3:6.0f}K lanes={lanes:4d} "
          f"N={n/1e6:4.1f}M  {dt*1e3:7.2f} ms  {ns:5.2f} ns/upd", flush=True)


N = 5 * 1024 * 1024
probe("quad-L0-train f32", 330_000, 32, N)
probe("block-A7 f32", 143_000, 128, N // 4 * 4)
probe("tiny-table f32", 20_000, 128, N)
probe("L1-fold f32 64-lane", 165_000, 64, N * 2)
probe("quad-L0-train bf16", 330_000, 32, N, jnp.bfloat16)
print("done", flush=True)
