"""Ablate the window-path stages at L0 config: table build, gathers,
weight expansion, dot epilogue."""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from casmvsnet_pl_tpu.ops.geometry import project_to_src
from casmvsnet_pl_tpu.ops.grid_sample import pack_strips
from casmvsnet_pl_tpu.ops import plane_sweep as ps
from casmvsnet_pl_tpu.utils.devtime import device_time

print("backend:", jax.default_backend(), flush=True)
dtype = jnp.bfloat16
rng = np.random.RandomState(0)
B, D, h, w, C = 2, 8, 512, 640, 8
S, K, hw = 16, 4, h * w
SC = S * C
feat = jnp.asarray(rng.rand(B, h, w, C).astype(np.float32)).astype(dtype)
proj_np = np.tile(np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32),
                  (B, 1, 1))
proj_np[..., 0, 3] = 300.0
proj_np[..., 1, 3] = 40.0
proj = jnp.asarray(proj_np)
dv = jnp.asarray(
    (425.0 + 2.65 * np.arange(D, dtype=np.float32))[None, :, None, None]
    * np.ones((B, D, h, w), np.float32))


def t(label, fn, *a, iters=12):
    dt = device_time(fn, *a, iters=iters)
    print(f"{label:56s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def origins(proj, dv):
    coords = jax.vmap(lambda p, d: project_to_src(p, d, h, w))(proj, dv)
    x = coords[..., 0].astype(jnp.float32).reshape(B, 1, D, hw)
    y = coords[..., 1].astype(jnp.float32).reshape(B, 1, D, hw)
    valid = (x > -1.0) & (x < float(w)) & (y > -1.0) & (y < float(h))
    big = jnp.float32(1e9)
    minx = jnp.min(jnp.where(valid, x, big), axis=2)
    miny = jnp.min(jnp.where(valid, y, big), axis=2)
    x_org = jnp.clip(jnp.floor(minx), -1.0, w - 1.0)
    y_org = jnp.clip(jnp.floor(miny), -1.0, h - 1.0)
    return x, y, valid, x_org, y_org


# 1) table build alone
t("pack_strips", lambda f: jnp.sum(
    jax.vmap(lambda g: pack_strips(g, S, K))(f).astype(jnp.float32)[:, ::97,
                                                                    ::97]),
  feat)

# 2) coords+origins alone
t("coords+origins", lambda p, d: sum(
    jnp.sum(z.astype(jnp.float32)) for z in origins(p, d)[3:]), proj, dv)

# 3) gathers alone (table prebuilt OUTSIDE the timed fn? can't — keep in;
#    subtract (1)+(2))
def gathers_only(f, p, d):
    tb = jax.vmap(lambda g: pack_strips(g, S, K))(f)
    Ht, Wt = tb.shape[1], tb.shape[2]
    _, _, _, x_org, y_org = origins(p, d)
    xi = x_org.astype(jnp.int32) + 1
    yi = y_org.astype(jnp.int32) + 1
    flat = tb.reshape(B, Ht * Wt, SC)
    acc = jnp.float32(0)
    for j in range(K):
        idx = (yi + j) * Wt + xi
        r = jnp.stack([jnp.take(flat[b], idx[b].reshape(-1), axis=0)
                       for b in range(B)])
        acc = acc + jnp.sum(r.astype(jnp.float32))
    return acc


t("table+origins+gathers", gathers_only, feat, proj, dv)


# 4) full window view
def full(f, p, d):
    tb = jax.vmap(lambda g: pack_strips(g, S, K))(f)
    o = ps._window_view(tb, p, d, h, w, S, K, 8)
    return jnp.sum(o)


t("full _window_view", full, feat, proj, dv)


# 5) weights-only variant: skip gathers, multiply weights into a CONSTANT
#    rows tensor (measures weight expansion + dot cost)
def weights_only(f, p, d):
    x, y, valid, x_org, y_org = origins(p, d)
    fx1 = jnp.clip(x.reshape(B, 1, D, hw) - x_org[:, :, None, :], 0.0,
                   S - 1.0)[..., None]
    fy1 = jnp.clip(y.reshape(B, 1, D, hw) - y_org[:, :, None, :], 0.0,
                   K - 1.0)[..., None]
    vm1 = valid.astype(jnp.float32)[..., None]
    kl = jnp.asarray(np.repeat(np.arange(S, dtype=np.float32), C))
    rows0 = jnp.sum(f.astype(jnp.float32)) * 1e-9 + jnp.ones(
        (B, 1, 1, hw, SC), dtype)
    prod = None
    for j in range(K):
        w_j = (jnp.maximum(0.0, 1.0 - jnp.abs(fx1 - kl)) *
               jnp.maximum(0.0, 1.0 - jnp.abs(fy1 - j)) * vm1)
        term = rows0 * w_j.astype(dtype)
        prod = term if prod is None else prod + term
    kmat = jnp.asarray(ps._identity_stack(C, S), dtype)
    o = jax.lax.dot_general(prod.reshape(B, D * hw, SC), kmat,
                            dimension_numbers=(((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return jnp.sum(o)


t("weights+dot only (const rows)", weights_only, feat, proj, dv)
print("done", flush=True)
