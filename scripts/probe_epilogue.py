"""Validate + time the fused cost-epilogue kernels on TPU.

Checks kernel-vs-XLA-formulation equality (fwd + vjp) at each cascade level
config, then times the new build_cost_volume per level.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import kernel_cost_epilogue as ce
from casmvsnet_pl_tpu.ops.plane_sweep import build_cost_volume
from casmvsnet_pl_tpu.utils.devtime import device_time

print("backend:", jax.default_backend(), flush=True)
dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
rng = np.random.RandomState(0)
B, V = 2, 3

# ---- correctness at a small supported shape --------------------------------
Bc, Dc, hwc, Cc = 2, 4, 2048, 16
ref = jnp.asarray(rng.randn(Bc, hwc, Cc).astype(np.float32)).astype(dtype)
rows = tuple(jnp.asarray(rng.randn(Bc, Dc, hwc, 4 * Cc).astype(np.float32))
             .astype(dtype) for _ in range(2))
ws = tuple(jnp.asarray(rng.rand(Bc, Dc, hwc, 4).astype(np.float32))
           for _ in range(2))

for name, fn_k, fn_x in [
    ("variance",
     lambda *a: ce.variance_epilogue(a[0], a[1:3], a[3:5], jnp.float32),
     lambda *a: ce._var_xla(a[0], a[1:3], a[3:5], jnp.float32)),
    ("groupwise",
     lambda *a: ce.groupwise_epilogue(a[0], a[1:3], a[3:5], 8, jnp.float32),
     lambda *a: ce._gw_xla(a[0], a[1:3], a[3:5], 8, jnp.float32)),
]:
    args = (ref, *rows, *ws)
    out_k = jax.jit(fn_k)(*args)
    out_x = jax.jit(fn_x)(*args)
    err = float(jnp.max(jnp.abs(out_k.astype(jnp.float32)
                                - out_x.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(out_x.astype(jnp.float32)))) + 1e-9
    print(f"{name} fwd max-abs-err {err:.3e} (rel {err / scale:.3e})",
          flush=True)

    def loss_k(*a):
        return jnp.sum(fn_k(*a).astype(jnp.float32) ** 2)

    def loss_x(*a):
        return jnp.sum(fn_x(*a).astype(jnp.float32) ** 2)

    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2, 3, 4)))(*args)
    gx = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2, 3, 4)))(*args)
    for i, (a, b) in enumerate(zip(gk, gx)):
        e = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                  - b.astype(jnp.float32))))
        s = float(jnp.max(jnp.abs(b.astype(jnp.float32)))) + 1e-9
        print(f"  {name} grad[{i}] max-abs-err {e:.3e} (rel {e / s:.3e})",
              flush=True)

# ---- perf per level ---------------------------------------------------------
proj_np = np.tile(np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32),
                  (B, V - 1, 1, 1))
proj_np[..., 0, 3] = 3.0
proj = jnp.asarray(proj_np)
for (l, D, h, w, C) in [(2, 48, 128, 160, 32), (1, 32, 256, 320, 16),
                        (0, 8, 512, 640, 8)]:
    feats = jnp.asarray(rng.rand(B, V, h, w, C).astype(np.float32)).astype(dtype)
    dv = jnp.asarray(
        (425.0 + 2.65 * np.arange(D, dtype=np.float32))[None, :, None, None]
        * np.ones((B, D, h, w), np.float32))
    dt = device_time(
        lambda fe, pr, d: build_cost_volume(fe, pr, d, groups=1, remat=False),
        feats, proj, dv, iters=12)
    print(f"L{l} build_cost_volume NEW {dt * 1e3:8.2f} ms", flush=True)
print("done", flush=True)
