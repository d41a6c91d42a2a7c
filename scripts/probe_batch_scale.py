"""Probe: batch scaling of the sampling-table gather (VERDICT r3 item 2).

bench r3 measured maps/s 27.8 (B=1) / 22.5 (B=4) / 27.0 (B=8) and the B=8
compile blew the driver's budget. Prime suspect: past _FOLD_LIMIT the
gathers are Python-unrolled per batch element (O(B) HLO ops). This probe
isolates the L0 patch-table gather (the largest: 330K rows x 128 lanes
bf16 = 84.5 MB/element) and compares formulations:

  unroll : current production path — B separate gathers + stack
  fold   : one gather over the (B*rows) concatenated table (past the
           row cliff for B >= 2 by construction)
  scan   : lax.fori_loop over batch, dynamic_index_in_dim table view,
           dynamic_update_slice output — constant-size HLO
  vmapped: jax.vmap of jnp.take — one gather HLO with batch dims

Reports per-variant device ms, ns/row, and compile seconds at
B in {1, 2, 4, 8}. Run on the real TPU (axon).
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from casmvsnet_pl_tpu.utils.devtime import device_time

H, W = 512, 640
Ht, Wt = H + 2, W + 2
L = 128
NG = 1                      # L0 patch: D=8, g=8 -> ng=1
N = NG * H * W              # gathered rows per batch element


def make(B, rng):
    table = jnp.asarray(rng.standard_normal((B, Ht * Wt, L)),
                        jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, Ht * Wt, (B, N)), jnp.int32)
    return table, idx


def g_unroll(table, idx):
    B = table.shape[0]
    return jnp.stack([jnp.take(table[b], idx[b], axis=0)
                      for b in range(B)])


def g_fold(table, idx):
    B = table.shape[0]
    flat = table.reshape(-1, L)
    fidx = idx + (jnp.arange(B, dtype=jnp.int32) * (Ht * Wt))[:, None]
    return jnp.take(flat, fidx.reshape(-1), axis=0).reshape(B, -1, L)


def g_scan(table, idx):
    B = table.shape[0]
    out = jnp.zeros((B, N, L), table.dtype)

    def body(b, out):
        t = jax.lax.dynamic_index_in_dim(table, b, 0, keepdims=False)
        r = jnp.take(t, jax.lax.dynamic_index_in_dim(idx, b, 0, False),
                     axis=0)
        return jax.lax.dynamic_update_slice(out, r[None], (b, 0, 0))

    return jax.lax.fori_loop(0, B, body, out)


def g_vmap(table, idx):
    return jax.vmap(lambda t, i: jnp.take(t, i, axis=0))(table, idx)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    variants = [("unroll", g_unroll), ("fold", g_fold),
                ("scan", g_scan), ("vmap", g_vmap)]
    for B in (1, 2, 4, 8):
        table, idx = make(B, rng)
        rows = B * N
        for name, fn in variants:
            t0 = time.perf_counter()
            try:
                ms = device_time(fn, table, idx, iters=8) * 1e3
            except Exception as e:
                print(f"B={B} {name:7s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
                continue
            wall = time.perf_counter() - t0
            print(f"B={B} {name:7s} {ms:7.2f} ms  "
                  f"{ms * 1e6 / rows:6.2f} ns/row  (probe wall {wall:.0f}s)",
                  flush=True)


def g_scan2(table, idx):
    """lax.scan formulation (reverse-differentiable, ys auto-stacked)."""
    B = table.shape[0]

    def body(_, b):
        t = jax.lax.dynamic_index_in_dim(table, b, 0, keepdims=False)
        i = jax.lax.dynamic_index_in_dim(idx, b, 0, keepdims=False)
        return (), jnp.take(t, i, axis=0)

    _, rows = jax.lax.scan(body, (), jnp.arange(B, dtype=jnp.int32))
    return rows


def main2():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    for B in (2, 4, 8):
        table, idx = make(B, rng)
        rows = B * N
        ms = device_time(g_scan2, table, idx, iters=8) * 1e3
        print(f"B={B} scan2   {ms:7.2f} ms  {ms * 1e6 / rows:6.2f} ns/row",
              flush=True)


if __name__ == "__main__":
    main2() if "--scan2" in sys.argv else main()
