"""A/B at eval resolution: integrated quad vs aligned-block cost volumes
per level, plus table-build and gather-only ablations."""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from casmvsnet_pl_tpu.ops import plane_sweep as ps
from casmvsnet_pl_tpu.ops.grid_sample import pack_blocks
from casmvsnet_pl_tpu.utils.devtime import device_time

print("backend:", jax.default_backend(), flush=True)
dtype = jnp.bfloat16
rng = np.random.RandomState(0)


def t(label, fn, *a, iters=8):
    dt = device_time(fn, *a, iters=iters)
    print(f"{label:56s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


B = 1
V = int(os.environ.get("PROBE_VIEWS", "3"))
for (tag, D, h, w, C) in [("ER-L0", 8, 864, 1152, 8),
                          ("ER-L1", 32, 432, 576, 16)]:
    feats = jnp.asarray(
        rng.rand(B, V, h, w, C).astype(np.float32)).astype(dtype)
    proj_np = np.tile(
        np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32),
        (B, V - 1, 1, 1))
    proj_np[..., 0, 3] = 300.0
    proj_np[..., 1, 3] = 40.0
    proj = jnp.asarray(proj_np)
    dv = jnp.asarray(
        (425.0 + 2.65 * np.arange(D, dtype=np.float32))[None, :, None, None]
        * np.ones((B, D, h, w), np.float32))
    a = ps.block_align(C, h, w)
    print(f"{tag}: align={a}", flush=True)

    for mode in ("quad", "auto"):
        t(f"{tag} integrated {mode}",
          lambda fe, pr, d, m=mode: jnp.sum(ps.build_cost_volume(
              fe, pr, d, groups=1, remat=False,
              sampling=m).astype(jnp.float32)), feats, proj, dv)

    # table build alone
    t(f"{tag} pack_blocks A={a}",
      lambda f: jnp.sum(jax.vmap(lambda g: pack_blocks(g, a))(
          f[:, 1]).astype(jnp.float32)[:, ::33, ::33]), feats)

    # gathers alone from a prebuilt block table
    table = jax.vmap(lambda g: pack_blocks(g, a))(feats[:, 1])
    Ht, nxb, L = table.shape[1:]
    idxs = jnp.asarray(
        rng.randint(0, Ht * nxb, size=(D * h * w,)).astype(np.int32))
    t(f"{tag} block gather only ({Ht * nxb / 1e3:.0f}K rows, {L} lanes)",
      lambda tb, ix: jnp.sum(jnp.take(tb.reshape(-1, L), ix,
                                      axis=0).astype(jnp.float32)),
      table, idxs)
print("done", flush=True)
