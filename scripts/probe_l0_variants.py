"""A/B gather formulations for the L0 warp (the slowest stage).

All variants are EXACT reformulations of bilinear sampling; they differ only
in how the gather table is packed (working-set size vs row count):

  quad    : (H+1,W+1,4C) table, 1 gather/sample   [current, 21 MB/batch]
  vpair   : (H+1,W+1,2C) vertical pairs, 2 gathers [10.5 MB/batch]
  chalf   : quad split into two 2C channel groups, 2 gathers [10.5 MB/batch]
  raw     : (H,W,C) unpacked, 4 gathers            [5.3 MB/batch]
  perb    : per-batch-element quad gathers (unrolled over B)

Also ablates the variance-accumulation overhead at L2.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from casmvsnet_pl_tpu.ops.geometry import project_to_src
from casmvsnet_pl_tpu.ops.grid_sample import pack_quad
from casmvsnet_pl_tpu.utils.devtime import device_time

print("backend:", jax.default_backend(), flush=True)
dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
rng = np.random.RandomState(0)


def t(label, fn, *a, iters=12):
    dt = device_time(fn, *a, iters=iters)
    print(f"{label:44s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def coords_of(proj, dv, h, w):
    return jax.vmap(lambda p, d: project_to_src(p, d, h, w))(proj, dv)


def weights_and_floors(c, h, w):
    x, y = c[..., 0], c[..., 1]
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    wx1, wy1 = x - x0f, y - y0f
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1
    vx0 = (x0f >= 0) & (x0f < w)
    vx1 = (x0f + 1 >= 0) & (x0f + 1 < w)
    vy0 = (y0f >= 0) & (y0f < h)
    vy1 = (y0f + 1 >= 0) & (y0f + 1 < h)
    return (x0f.astype(jnp.int32), y0f.astype(jnp.int32),
            jnp.where(vy0 & vx0, wy0 * wx0, 0.0),
            jnp.where(vy0 & vx1, wy0 * wx1, 0.0),
            jnp.where(vy1 & vx0, wy1 * wx0, 0.0),
            jnp.where(vy1 & vx1, wy1 * wx1, 0.0),
            jnp.where(vy0, wy0, 0.0), jnp.where(vy1, wy1, 0.0),
            jnp.where(vx0, wx0, 0.0), jnp.where(vx1, wx1, 0.0))


B, V = 2, 3
h, w, C, D = 512, 640, 8, 8
feats = jnp.asarray(rng.rand(B, V, h, w, C).astype(np.float32)).astype(dtype)
proj_np = np.tile(np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32),
                  (B, V - 1, 1, 1))
proj_np[..., 0, 3] = 3.0
proj = jnp.asarray(proj_np)
dv = jnp.asarray(
    (425.0 + 2.65 * np.arange(D, dtype=np.float32))[None, :, None, None]
    * np.ones((B, D, h, w), np.float32))

src = feats[:, 1]                                   # (B, h, w, C) one view
quad = jax.vmap(pack_quad)(src)                     # (B, h+1, w+1, 4C)


def f_quad(q, pr, d):
    c = coords_of(pr[:, 0], d, h, w)
    Hq, Wq = q.shape[1:3]
    x0, y0, w00, w01, w10, w11, *_ = weights_and_floors(c, h, w)
    xq = jnp.clip(x0 + 1, 0, Wq - 1)
    yq = jnp.clip(y0 + 1, 0, Hq - 1)
    idx = (yq * Wq + xq).reshape(B, -1) + \
        (jnp.arange(B, dtype=jnp.int32) * (Hq * Wq))[:, None]
    rows = jnp.take(q.reshape(B * Hq * Wq, 4 * C), idx.reshape(-1), axis=0)
    taps = (w00, w01, w10, w11)
    out = sum(rows[:, i * C:(i + 1) * C] *
              taps[i].reshape(-1, 1).astype(dtype) for i in range(4))
    return jnp.sum(out.astype(jnp.float32))


t("L0 quad (current)", f_quad, quad, proj, dv)


def pack_vpair(f):
    H, W, Cc = f.shape
    p = jnp.pad(f, ((1, 2), (1, 2), (0, 0)))
    return jnp.concatenate([p[:H + 1], p[1:H + 2]], axis=-1)  # (H+1,W+2,2C)


vp = jax.vmap(pack_vpair)(src)                      # (B, h+1, w+3.., 2C)


def f_vpair(q, pr, d):
    c = coords_of(pr[:, 0], d, h, w)
    Hq, Wq = q.shape[1:3]
    x0, y0, w00, w01, w10, w11, wy0, wy1, wx0, wx1 = weights_and_floors(c, h, w)
    yq = jnp.clip(y0 + 1, 0, Hq - 1)
    xq0 = jnp.clip(x0 + 1, 0, Wq - 1)
    xq1 = jnp.clip(x0 + 2, 0, Wq - 1)
    base = (jnp.arange(B, dtype=jnp.int32) * (Hq * Wq))[:, None]
    flat = q.reshape(B * Hq * Wq, 2 * C)
    i0 = ((yq * Wq + xq0).reshape(B, -1) + base).reshape(-1)
    i1 = ((yq * Wq + xq1).reshape(B, -1) + base).reshape(-1)
    r0 = jnp.take(flat, i0, axis=0)                 # (N, 2C) taps (y0,x0),(y1,x0)
    r1 = jnp.take(flat, i1, axis=0)
    out = (r0[:, :C] * w00.reshape(-1, 1).astype(dtype)
           + r0[:, C:] * w10.reshape(-1, 1).astype(dtype)
           + r1[:, :C] * w01.reshape(-1, 1).astype(dtype)
           + r1[:, C:] * w11.reshape(-1, 1).astype(dtype))
    return jnp.sum(out.astype(jnp.float32))


t("L0 vpair 2-gather", f_vpair, vp, proj, dv)


def f_chalf(q, pr, d):
    c = coords_of(pr[:, 0], d, h, w)
    Hq, Wq = q.shape[1:3]
    x0, y0, w00, w01, w10, w11, *_ = weights_and_floors(c, h, w)
    xq = jnp.clip(x0 + 1, 0, Wq - 1)
    yq = jnp.clip(y0 + 1, 0, Hq - 1)
    idx = ((yq * Wq + xq).reshape(B, -1) +
           (jnp.arange(B, dtype=jnp.int32) * (Hq * Wq))[:, None]).reshape(-1)
    top = jnp.take(q[..., :2 * C].reshape(B * Hq * Wq, 2 * C), idx, axis=0)
    bot = jnp.take(q[..., 2 * C:].reshape(B * Hq * Wq, 2 * C), idx, axis=0)
    out = (top[:, :C] * w00.reshape(-1, 1).astype(dtype)
           + top[:, C:] * w01.reshape(-1, 1).astype(dtype)
           + bot[:, :C] * w10.reshape(-1, 1).astype(dtype)
           + bot[:, C:] * w11.reshape(-1, 1).astype(dtype))
    return jnp.sum(out.astype(jnp.float32))


t("L0 quad channel-halves 2-gather", f_chalf, quad, proj, dv)


def f_raw(s, pr, d):
    c = coords_of(pr[:, 0], d, h, w)
    x0, y0, w00, w01, w10, w11, *_ = weights_and_floors(c, h, w)
    flat = s.reshape(B * h * w, C)
    base = (jnp.arange(B, dtype=jnp.int32) * (h * w))[:, None]

    def tap(yy, xx, wt):
        idx = ((jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1))
               .reshape(B, -1) + base).reshape(-1)
        return jnp.take(flat, idx, axis=0) * wt.reshape(-1, 1).astype(dtype)

    out = (tap(y0, x0, w00) + tap(y0, x0 + 1, w01) +
           tap(y0 + 1, x0, w10) + tap(y0 + 1, x0 + 1, w11))
    return jnp.sum(out.astype(jnp.float32))


t("L0 raw 4-gather", f_raw, src, proj, dv)


def f_perb(q, pr, d):
    c = coords_of(pr[:, 0], d, h, w)
    Hq, Wq = q.shape[1:3]
    x0, y0, w00, w01, w10, w11, *_ = weights_and_floors(c, h, w)
    xq = jnp.clip(x0 + 1, 0, Wq - 1)
    yq = jnp.clip(y0 + 1, 0, Hq - 1)
    idx = (yq * Wq + xq).reshape(B, -1)
    acc = 0.0
    for b in range(B):
        rows = jnp.take(q[b].reshape(Hq * Wq, 4 * C), idx[b], axis=0)
        taps = (w00, w01, w10, w11)
        out = sum(rows[:, i * C:(i + 1) * C] *
                  taps[i].reshape(B, -1)[b].reshape(-1, 1).astype(dtype)
                  for i in range(4))
        acc = acc + jnp.sum(out.astype(jnp.float32))
    return acc


t("L0 per-batch quad gathers", f_perb, quad, proj, dv)

# ---- L2 variance-accumulation ablation ------------------------------------
print(flush=True)
h2, w2, C2, D2 = 128, 160, 32, 48
feats2 = jnp.asarray(rng.rand(B, V, h2, w2, C2).astype(np.float32)).astype(dtype)
dv2 = jnp.asarray(
    (425.0 + 2.65 * np.arange(D2, dtype=np.float32))[None, :, None, None]
    * np.ones((B, D2, h2, w2), np.float32))

from casmvsnet_pl_tpu.ops.plane_sweep import (batched_variance_cost_volume,
                                              warp_src_quad_batched)


def f_var_full(fe, pr, d):
    return jnp.sum(batched_variance_cost_volume(fe, pr, d, remat=False)
                   .astype(jnp.float32))


t("L2 variance full (2 views)", f_var_full, feats2, proj, dv2)


def f_var_bf16(fe, pr, d):
    ref, srcs = fe[:, 0], fe[:, 1:]
    src_quads = jax.vmap(jax.vmap(pack_quad))(srcs)
    ref_vol = jnp.broadcast_to(ref[:, None], (B, D2, h2, w2, C2))
    s, sq = ref_vol, ref_vol * ref_vol
    for v in range(V - 1):
        wv = warp_src_quad_batched(src_quads[:, v], pr[:, v], d, h2, w2)
        s = s + wv
        sq = sq + wv * wv
    var = sq / V - (s / V) ** 2
    return jnp.sum(var.astype(jnp.float32))


t("L2 variance bf16 accum", f_var_bf16, feats2, proj, dv2)


def f_sum_only(fe, pr, d):
    ref, srcs = fe[:, 0], fe[:, 1:]
    src_quads = jax.vmap(jax.vmap(pack_quad))(srcs)
    s = jnp.broadcast_to(ref[:, None].astype(jnp.float32), (B, D2, h2, w2, C2))
    for v in range(V - 1):
        wv = warp_src_quad_batched(src_quads[:, v], pr[:, v], d, h2, w2)
        s = s + wv.astype(jnp.float32)
    return jnp.sum(s.astype(jnp.float32))


t("L2 sum-only f32 accum (no squares)", f_sum_only, feats2, proj, dv2)
print("done", flush=True)
