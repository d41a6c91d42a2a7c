"""A/B: integrated batched_variance_cost_volume vs probe_epi4's build_matmul
at the L1 config — find the regression."""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from casmvsnet_pl_tpu.ops import plane_sweep as ps
from casmvsnet_pl_tpu.ops.geometry import project_to_src
from casmvsnet_pl_tpu.ops.grid_sample import pack_quad, quad_weights
from casmvsnet_pl_tpu.utils.devtime import device_time

print("backend:", jax.default_backend(), flush=True)
dtype = jnp.bfloat16
rng = np.random.RandomState(0)
B, V, D, h, w, C = 2, 3, 32, 256, 320, 16
hw = h * w
feats = jnp.asarray(rng.rand(B, V, h, w, C).astype(np.float32)).astype(dtype)
proj_np = np.tile(np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32),
                  (B, V - 1, 1, 1))
proj_np[..., 0, 3] = 3.0
proj = jnp.asarray(proj_np)
dv = jnp.asarray(
    (425.0 + 2.65 * np.arange(D, dtype=np.float32))[None, :, None, None]
    * np.ones((B, D, h, w), np.float32))


def t(label, fn, *a, iters=12):
    dt = device_time(fn, *a, iters=iters)
    print(f"{label:52s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


t("integrated batched_variance (direct)",
  lambda fe, pr, d: jnp.sum(ps.batched_variance_cost_volume(
      fe, pr, d, remat=False).astype(jnp.float32)), feats, proj, dv)

t("integrated build_cost_volume (nested jit)",
  lambda fe, pr, d: jnp.sum(ps.build_cost_volume(
      fe, pr, d, groups=1, remat=False).astype(jnp.float32)), feats, proj, dv)


def build_matmul(fe, pr, d):
    ref, srcs = fe[:, 0], fe[:, 1:]
    quads = jax.vmap(jax.vmap(pack_quad))(srcs)
    K = jnp.asarray(np.tile(np.eye(C, dtype=np.float32), (4, 1)))
    reff = ref.reshape(B, 1, hw, C).astype(jnp.float32)
    s = jnp.broadcast_to(reff, (B, D, hw, C))
    sq = s * s
    eye = np.eye(4, dtype=np.float32)
    masks = [jnp.asarray(np.repeat(eye[q], C)) for q in range(4)]
    for v in range(V - 1):
        coords = jax.vmap(lambda p, dd: project_to_src(p, dd, h, w))(
            pr[:, v], d)
        Hq, Wq = h + 1, w + 1
        w4, y0i, x0i = quad_weights(coords, h, w)
        idx = (y0i * Wq + x0i).reshape(B, -1)
        idx = idx + (jnp.arange(B, dtype=jnp.int32) * (Hq * Wq))[:, None]
        rows = jnp.take(quads[:, v].reshape(B * Hq * Wq, 4 * C),
                        idx.reshape(-1), axis=0).reshape(B, -1, 4 * C)
        w4f = w4.reshape(B, -1, 4)
        w4c = sum((w4f[..., q:q + 1] * masks[q]) for q in range(4))
        prod = rows * w4c.astype(dtype)
        o = jnp.einsum("bnk,kc->bnc", prod, K.astype(dtype),
                       preferred_element_type=jnp.float32)
        o = o.reshape(B, D, hw, C)
        s = s + o
        sq = sq + o * o
    var = sq / V - (s / V) ** 2
    return var.astype(dtype)


t("probe-style build_matmul",
  lambda fe, pr, d: jnp.sum(build_matmul(fe, pr, d).astype(jnp.float32)),
  feats, proj, dv)
print("done", flush=True)
