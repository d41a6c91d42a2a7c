"""Ablate the warp+cost pipeline at each cascade level to locate the cost.

Stages per level (batch 2, bench config):
  coords   : project_to_src only
  gather   : flat row-gather of packed-quad rows at those coords (no weights)
  sample   : full grid_sample_quad (gather + tap reduce)
  cost     : full build_cost_volume (both views + variance)

Plus synthetic gather-rate probes across table sizes and row widths.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from casmvsnet_pl_tpu.ops.geometry import project_to_src
from casmvsnet_pl_tpu.ops.grid_sample import grid_sample_quad, pack_quad
from casmvsnet_pl_tpu.ops.plane_sweep import build_cost_volume
from casmvsnet_pl_tpu.utils.devtime import device_time

print("backend:", jax.default_backend(), flush=True)
dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
rng = np.random.RandomState(0)
B, V = 2, 3


def t(label, fn, *a, iters=12):
    dt = device_time(fn, *a, iters=iters)
    print(f"{label:46s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


levels = [(2, 48, 128, 160, 32), (1, 32, 256, 320, 16), (0, 8, 512, 640, 8)]
for (l, D, h, w, C) in levels:
    feats = jnp.asarray(rng.rand(B, V, h, w, C).astype(np.float32)).astype(dtype)
    proj_np = np.tile(np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32),
                      (B, V - 1, 1, 1))
    proj_np[..., 0, 3] = 3.0
    proj = jnp.asarray(proj_np)
    dv = jnp.asarray(
        (425.0 + 2.65 * np.arange(D, dtype=np.float32))[None, :, None, None]
        * np.ones((B, D, h, w), np.float32))

    def coords_fn(pr, d):
        c = jax.vmap(lambda p, dd: project_to_src(p, dd, h, w))(pr[:, 0], d)
        return jnp.sum(c)

    t(f"L{l} coords (1 view)", coords_fn, proj, dv)

    quad = jax.vmap(jax.vmap(pack_quad))(feats[:, 1:])   # (B, V-1, h+1, w+1, 4C)

    def gather_fn(q, pr, d):
        c = jax.vmap(lambda p, dd: project_to_src(p, dd, h, w))(pr[:, 0], d)
        Hq, Wq, C4 = q.shape[-3:]
        flat = q[:, 0].reshape(B * Hq * Wq, C4)
        x0 = jnp.clip(jnp.floor(c[..., 0]).astype(jnp.int32) + 1, 0, Wq - 1)
        y0 = jnp.clip(jnp.floor(c[..., 1]).astype(jnp.int32) + 1, 0, Hq - 1)
        idx = (y0 * Wq + x0).reshape(B, -1)
        idx = idx + (jnp.arange(B, dtype=jnp.int32) * (Hq * Wq))[:, None]
        rows = jnp.take(flat, idx.reshape(-1), axis=0)
        return jnp.sum(rows.astype(jnp.float32))

    t(f"L{l} coords+gather (1 view)", gather_fn, quad, proj, dv)

    def sample_fn(q, pr, d):
        c = jax.vmap(lambda p, dd: project_to_src(p, dd, h, w))(pr[:, 0], d)
        s = grid_sample_quad(q[:, 0], c, h, w)
        return jnp.sum(s.astype(jnp.float32))

    t(f"L{l} full sample (1 view)", sample_fn, quad, proj, dv)

    def cost_fn(fe, pr, d):
        return jnp.sum(build_cost_volume(fe, pr, d, groups=1,
                                         remat=False).astype(jnp.float32))

    t(f"L{l} build_cost_volume (2 views)", cost_fn, feats, proj, dv)
    print(flush=True)

# --- synthetic gather-rate probes -----------------------------------------
print("gather-rate probes (10.5M rows each):", flush=True)
N = 10_500_000
for (rows_n, width) in [(1 << 14, 32), (1 << 18, 32), (1 << 21, 32),
                        (1 << 14, 128), (1 << 18, 128), (1 << 21, 128)]:
    table = jnp.asarray(rng.rand(rows_n, width).astype(np.float32)).astype(dtype)
    idx = jnp.asarray(rng.randint(0, rows_n, N).astype(np.int32))

    def g(tab, ix):
        return jnp.sum(jnp.take(tab, ix, axis=0).astype(jnp.float32))

    mb = rows_n * width * 2 / 1e6
    dt = device_time(g, table, idx, iters=8)
    print(f"  table {mb:7.1f} MB rows {width:3d} lanes: "
          f"{dt * 1e3:7.2f} ms -> {dt / N * 1e9:5.2f} ns/row", flush=True)

# sequential (coherent) indices
idx_seq = jnp.asarray((np.arange(N) % (1 << 18)).astype(np.int32))
table = jnp.asarray(rng.rand(1 << 18, 32).astype(np.float32)).astype(dtype)
dt = device_time(lambda t_, i_: jnp.sum(jnp.take(t_, i_, axis=0).astype(jnp.float32)),
                 table, idx_seq, iters=8)
print(f"  coherent idx, 16.8MB table 32 lanes: {dt * 1e3:7.2f} ms -> "
      f"{dt / N * 1e9:5.2f} ns/row", flush=True)
print("done", flush=True)
