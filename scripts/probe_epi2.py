"""Isolate gather vs epilogue-kernel cost at L1/L2 configs; try D-blocking."""
from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import kernel_cost_epilogue as ce
from casmvsnet_pl_tpu.ops.geometry import project_to_src
from casmvsnet_pl_tpu.ops.grid_sample import pack_quad
from casmvsnet_pl_tpu.ops.plane_sweep import _gather_rows_all_views
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
    dt = device_time(fn, *a, iters=iters)
    print(f"{label:46s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def dblk_kernel(ref_ref, *args, n_views: int, C: int, Dblk: int):
    rows_refs = args[:n_views]
    w_refs = args[n_views:2 * n_views]
    out_ref = args[2 * n_views]
    ref = ref_ref[0].astype(jnp.float32)                  # (T, C)
    for di in range(Dblk):
        s = ref
        sq = ref * ref
        for v in range(n_views):
            o = ce._taps(rows_refs[v][0, di], w_refs[v][0, di], C)
            s = s + o
            sq = sq + o * o
        inv_v = 1.0 / (n_views + 1)
        m = s * inv_v
        out_ref[0, di] = (sq * inv_v - m * m).astype(out_ref.dtype)


def variance_dblk(ref, rows, ws, Dblk, T):
    B, D, hw, C4 = rows[0].shape
    C = C4 // 4
    grid = (B, hw // T, D // Dblk)
    ref_spec = pl.BlockSpec((1, T, C), lambda b, p, d: (b, p, 0),
                            memory_space=pltpu.VMEM)
    rows_spec = pl.BlockSpec((1, Dblk, T, 4 * C),
                             lambda b, p, d: (b, d, p, 0),
                             memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, Dblk, T, 4), lambda b, p, d: (b, d, p, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, Dblk, T, C), lambda b, p, d: (b, d, p, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(dblk_kernel, n_views=len(rows), C=C, Dblk=Dblk),
        grid=grid,
        in_specs=[ref_spec] + [rows_spec] * len(rows) + [w_spec] * len(ws),
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, D, hw, C), dtype),
    )(ref, *rows, *ws)


for (l, D, h, w, C) in [(1, 32, 256, 320, 16), (2, 48, 128, 160, 32)]:
    hw = h * w
    feats = jnp.asarray(rng.rand(B, V, h, w, C).astype(np.float32)).astype(dtype)
    dv = jnp.asarray(
        (425.0 + 2.65 * np.arange(D, dtype=np.float32))[None, :, None, None]
        * np.ones((B, D, h, w), np.float32))
    ref = feats[:, 0].reshape(B, hw, C)
    src_quads = jax.vmap(jax.vmap(pack_quad))(feats[:, 1:])

    def gathers(sq, pr, d):
        rows, ws = _gather_rows_all_views(sq, pr, d, h, w)
        return (sum(jnp.sum(r.astype(jnp.float32)) for r in rows)
                + sum(jnp.sum(x) for x in ws))

    t(f"L{l} gathers only (2 views, per-batch)", gathers, src_quads, proj, dv)

    # materialize rows/ws once for kernel-only timing
    rows, ws = jax.jit(lambda sq, pr, d: _gather_rows_all_views(
        sq, pr, d, h, w))(src_quads, proj, dv)
    rows = tuple(rows)
    ws = tuple(ws)

    t(f"L{l} epilogue kernel only (T=1024)",
      lambda r0, r1, w0, w1, rf: jnp.sum(ce.variance_epilogue(
          rf, (r0, r1), (w0, w1), dtype).astype(jnp.float32)),
      rows[0], rows[1], ws[0], ws[1], ref)

    for Dblk, T in [(4, 1024), (8, 1024), (8, 2048), (D, 2048)]:
        if D % Dblk:
            continue
        try:
            t(f"L{l} epilogue Dblk={Dblk} T={T}",
              lambda r0, r1, w0, w1, rf, Dblk=Dblk, T=T: jnp.sum(
                  variance_dblk(rf, (r0, r1), (w0, w1), Dblk, T)
                  .astype(jnp.float32)),
              rows[0], rows[1], ws[0], ws[1], ref)
        except Exception as e:
            print(f"L{l} Dblk={Dblk} T={T}: FAIL "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
print("done", flush=True)
