"""A/B: integrated build_cost_volume quad vs window sampling at L0 config."""
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
B, V, D, h, w, C = 2, 3, 8, 512, 640, 8
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


for mode in ("quad", "window"):
    t(f"L0 fwd {mode}",
      lambda fe, pr, d, m=mode: jnp.sum(build_cost_volume(
          fe, pr, d, groups=1, remat=False, sampling=m).astype(jnp.float32)),
      feats, proj, dv)

for mode in ("quad", "window"):
    def f(fe, pr, d, m=mode):
        def loss(fe):
            return jnp.sum(build_cost_volume(
                fe, pr, d, groups=1, remat=False,
                sampling=m).astype(jnp.float32) ** 2)
        return jax.grad(loss)(fe)
    t(f"L0 fwd+bwd {mode}", f, feats, proj, dv)

# numerical agreement on TPU (bf16)
q = build_cost_volume(feats, proj, dv, groups=1, remat=False, sampling="quad")
wv = build_cost_volume(feats, proj, dv, groups=1, remat=False,
                       sampling="window")
d_ = jnp.max(jnp.abs(q.astype(jnp.float32) - wv.astype(jnp.float32)))
print("tpu bf16 max abs diff:", float(d_), flush=True)
print("done", flush=True)
