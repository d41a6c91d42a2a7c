"""Gather rates at the DTU evaluation resolution (1152x864): do the quad
tables fall off the table-size cliff, and do 128-lane window strip tables
stay in the fast regime?"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from casmvsnet_pl_tpu.ops.plane_sweep import build_cost_volume
from casmvsnet_pl_tpu.utils.devtime import device_time

print("backend:", jax.default_backend(), flush=True)
dtype = jnp.bfloat16
rng = np.random.RandomState(0)


def t(label, fn, *a, iters=8):
    dt = device_time(fn, *a, iters=iters)
    print(f"{label:56s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def probe_raw(tag, rows_h, lanes, n_rows, iters=8):
    table = jnp.asarray(
        rng.rand(rows_h, lanes).astype(np.float32)).astype(dtype)
    mb = rows_h * lanes * 2 / 1e6
    base = np.arange(n_rows, dtype=np.int64) % rows_h
    jit = rng.randint(-3, 4, size=n_rows)
    idx = jnp.asarray(np.clip(base + jit * 1153, 0, rows_h - 1).astype(np.int32))

    def f(tb, ix):
        return jnp.sum(jnp.take(tb, ix, axis=0).astype(jnp.float32))

    dt = device_time(f, table, idx, iters=iters)
    ns = dt * 1e9 / n_rows
    print(f"{tag:44s} table={mb:7.1f}MB lanes={lanes:4d} "
          f"rows={n_rows/1e6:5.2f}M  {dt*1e3:7.2f} ms  {ns:5.2f} ns/row",
          flush=True)


H, W = 864, 1152
hw = H * W
# eval-res raw gather rates
probe_raw("ER L0 quad 32-lane", (H + 1) * (W + 1), 32, 8 * hw)
probe_raw("ER L1 quad 64-lane", (H // 2 + 1) * (W // 2 + 1), 64,
          32 * (hw // 4))
probe_raw("ER L2 quad 128-lane", (H // 4 + 1) * (W // 4 + 1), 128,
          48 * (hw // 16))
probe_raw("ER L0 win 128-lane strip16", (H + 4) * (W + 1), 128, 4 * hw)

# integrated L0 at eval res: quad vs window
B, V, D, C = 1, 5, 8, 8
feats = jnp.asarray(rng.rand(B, V, H, W, C).astype(np.float32)).astype(dtype)
proj_np = np.tile(np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32),
                  (B, V - 1, 1, 1))
proj_np[..., 0, 3] = 300.0
proj_np[..., 1, 3] = 40.0
proj = jnp.asarray(proj_np)
dv = jnp.asarray(
    (425.0 + 2.65 * np.arange(D, dtype=np.float32))[None, :, None, None]
    * np.ones((B, D, H, W), np.float32))
for mode in ("quad", "window"):
    t(f"ER L0 integrated {mode} (V=5)",
      lambda fe, pr, d, m=mode: jnp.sum(build_cost_volume(
          fe, pr, d, groups=1, remat=False, sampling=m).astype(jnp.float32)),
      feats, proj, dv)
print("done", flush=True)
