"""A/B: L1 quad gathers folded (one 21 MB table) vs per-batch unrolled
(two 10.6 MB tables), plus bwd smoke for the conv-based pack tables."""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from casmvsnet_pl_tpu.ops import plane_sweep as ps
from casmvsnet_pl_tpu.utils.devtime import device_time

print("backend:", jax.default_backend(), flush=True)
dtype = jnp.bfloat16
rng = np.random.RandomState(0)
B, V, D, h, w, C = 2, 3, 32, 256, 320, 16
feats = jnp.asarray(rng.rand(B, V, h, w, C).astype(np.float32)).astype(dtype)
proj_np = np.tile(np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32),
                  (B, V - 1, 1, 1))
proj_np[..., 0, 3] = 300.0
proj_np[..., 1, 3] = 40.0
proj = jnp.asarray(proj_np)
dv = jnp.asarray(
    (425.0 + 2.65 * np.arange(D, dtype=np.float32))[None, :, None, None]
    * np.ones((B, D, h, w), np.float32))


def t(label, fn, *a, iters=12):
    dt = device_time(fn, *a, iters=iters)
    print(f"{label:52s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


for lim in (24 * 1024 * 1024, 1):
    ps._FOLD_LIMIT = lim
    t(f"L1 fwd fold_limit={lim >> 20}MB",
      lambda fe, pr, d: jnp.sum(ps.batched_variance_cost_volume(
          fe, pr, d, remat=False).astype(jnp.float32)), feats, proj, dv)
ps._FOLD_LIMIT = 24 * 1024 * 1024

# bwd smoke through the conv-based pack tables (quad path)
def g(fe):
    return jnp.sum(ps.batched_variance_cost_volume(
        fe, proj, dv, remat=False).astype(jnp.float32) ** 2)

t("L1 fwd+bwd quad (conv pack)", lambda fe: jnp.sum(
    jax.grad(g)(fe).astype(jnp.float32)), feats)
print("done", flush=True)
