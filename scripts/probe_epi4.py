"""XLA-only epilogue formulations: mask-broadcast weights + identity-stack
matmul tap reduce, vs the current slice-based combine.

No Pallas: a plain copy kernel measures only ~85 GB/s on this toolchain
(single auto-pipelined DMA stream), so the epilogue must stay in XLA.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from casmvsnet_pl_tpu.ops.geometry import project_to_src
from casmvsnet_pl_tpu.ops.grid_sample import pack_quad, quad_weights
from casmvsnet_pl_tpu.ops.plane_sweep import build_cost_volume
from casmvsnet_pl_tpu.utils.devtime import device_time

print("backend:", jax.default_backend(), flush=True)
dtype = jnp.bfloat16
rng = np.random.RandomState(0)
B, V = 2, 3
proj_np = np.tile(np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32),
                  (B, V - 1, 1, 1))
proj_np[..., 0, 3] = 3.0
proj = jnp.asarray(proj_np)


def t(label, fn, *a, iters=12):
    try:
        dt = device_time(fn, *a, iters=iters)
        print(f"{label:56s} {dt * 1e3:8.2f} ms", flush=True)
        return dt
    except Exception as e:
        print(f"{label:56s} FAIL {str(e).splitlines()[0][:90]}", flush=True)
        return None


def masked_w4c(w4, C, dtype):
    """(..., 4) weights -> (..., 4C) via constant lane masks (no shuffles)."""
    eye = np.eye(4, dtype=np.float32)
    masks = [jnp.asarray(np.repeat(eye[q], C)) for q in range(4)]  # (4C,)
    out = sum((w4[..., q:q + 1] * masks[q].astype(jnp.float32))
              for q in range(4))
    return out.astype(dtype)


def gather_rows_folded(quad, coords, h, w):
    """Batch-folded single gather (fast regime at L1/L2)."""
    B, Hq, Wq, C4 = quad.shape
    w4, y0i, x0i = quad_weights(coords, h, w)
    idx = (y0i * Wq + x0i).reshape(B, -1)
    idx = idx + (jnp.arange(B, dtype=jnp.int32) * (Hq * Wq))[:, None]
    rows = jnp.take(quad.reshape(B * Hq * Wq, C4), idx.reshape(-1), axis=0)
    return rows.reshape(B, -1, C4), w4.reshape(B, -1, 4)


def build_matmul(feats, pr, d, h, w, C, o_dtype):
    Bq, Vq = feats.shape[:2]
    D = d.shape[1]
    ref, srcs = feats[:, 0], feats[:, 1:]
    quads = jax.vmap(jax.vmap(pack_quad))(srcs)
    K = jnp.asarray(np.tile(np.eye(C, dtype=np.float32), (4, 1)))  # (4C, C)
    reff = ref.reshape(Bq, 1, h * w, C).astype(jnp.float32)
    s = jnp.broadcast_to(reff, (Bq, D, h * w, C))
    sq = s * s
    for v in range(Vq - 1):
        coords = jax.vmap(lambda p, dd: project_to_src(p, dd, h, w))(
            pr[:, v], d)
        rows, w4 = gather_rows_folded(quads[:, v], coords, h, w)
        w4c = masked_w4c(w4, C, dtype)                    # (B, N, 4C)
        prod = rows * w4c
        o = jnp.einsum("bnk,kc->bnc", prod, K.astype(o_dtype),
                       preferred_element_type=jnp.float32)
        o = o.reshape(Bq, D, h * w, C)
        s = s + o
        sq = sq + o * o
    var = sq / Vq - (s / Vq) ** 2
    return var.astype(dtype)


def build_matmul_reshape_reduce(feats, pr, d, h, w, C):
    """Control: reshape (N, 4, C) + sum instead of the matmul."""
    Bq, Vq = feats.shape[:2]
    D = d.shape[1]
    ref, srcs = feats[:, 0], feats[:, 1:]
    quads = jax.vmap(jax.vmap(pack_quad))(srcs)
    reff = ref.reshape(Bq, 1, h * w, C).astype(jnp.float32)
    s = jnp.broadcast_to(reff, (Bq, D, h * w, C))
    sq = s * s
    for v in range(Vq - 1):
        coords = jax.vmap(lambda p, dd: project_to_src(p, dd, h, w))(
            pr[:, v], d)
        rows, w4 = gather_rows_folded(quads[:, v], coords, h, w)
        w4c = masked_w4c(w4, C, dtype)
        prod = (rows * w4c).astype(jnp.float32)
        o = prod.reshape(Bq, -1, 4, C).sum(axis=2)
        o = o.reshape(Bq, D, h * w, C)
        s = s + o
        sq = sq + o * o
    var = sq / Vq - (s / Vq) ** 2
    return var.astype(dtype)


for (l, D, h, w, C) in [(1, 32, 256, 320, 16), (2, 48, 128, 160, 32),
                        (0, 8, 512, 640, 8)]:
    feats = jnp.asarray(rng.rand(B, V, h, w, C).astype(np.float32)).astype(dtype)
    dv = jnp.asarray(
        (425.0 + 2.65 * np.arange(D, dtype=np.float32))[None, :, None, None]
        * np.ones((B, D, h, w), np.float32))
    if l == 1:
        t(f"L{l} current build (control)",
          lambda fe, pr, d: build_cost_volume(fe, pr, d, groups=1,
                                              remat=False), feats, proj, dv)
    t(f"L{l} matmul-epilogue f32-o",
      lambda fe, pr, d, h=h, w=w, C=C: jnp.sum(
          build_matmul(fe, pr, d, h, w, C, jnp.float32).astype(jnp.float32)),
      feats, proj, dv)
    t(f"L{l} matmul-epilogue bf16-o",
      lambda fe, pr, d, h=h, w=w, C=C: jnp.sum(
          build_matmul(fe, pr, d, h, w, C, dtype).astype(jnp.float32)),
      feats, proj, dv)
    t(f"L{l} reshape-reduce",
      lambda fe, pr, d, h=h, w=w, C=C: jnp.sum(
          build_matmul_reshape_reduce(fe, pr, d, h, w, C)
          .astype(jnp.float32)),
      feats, proj, dv)
print("done", flush=True)
