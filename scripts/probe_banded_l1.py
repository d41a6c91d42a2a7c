"""Probe: gather regime of the eval-res L1/L2 patch tables + banded fix.

L1 at 1152x864: table (434x578) = 251K rows x 256 lanes (split-2 fused,
512 B bf16 rows, 128 MB) — under the 340K ROW budget but far past the
21 MB byte budget; the measured regime is unknown (PERF_NOTES: a
250K-row/32MB 64-lane table was slow, 128-lane tables stayed fast at
85 MB). idx = ng*hw = 498K rows/view. L2: (218x290) = 63K rows x 512
lanes (1 KB rows, 64 MB), 187K gathered rows/view.

Measures mono vs banded (band slice per ref-row tile) at both shapes.
Usage: python scripts/probe_banded_l1.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp
import numpy as np

from casmvsnet_pl_tpu.ops.banded_take import banded_gather_rows
from casmvsnet_pl_tpu.utils.devtime import device_time

rng = np.random.RandomState(0)


def run(name, H, W, ng, L, tile_band_list):
    Ht, Wt = H + 2, W + 2
    R = Ht * Wt
    hw = H * W
    table = jnp.asarray(rng.randn(1, R, L), jnp.bfloat16)
    # structured warp-like indices: small per-pixel drift + per-group shift
    y = np.clip(np.arange(H)[:, None] + rng.randint(-3, 4, (H, W)), 0, Ht - 1)
    x = np.clip(np.arange(W)[None, :] + rng.randint(-3, 4, (H, W)), 0, Wt - 1)
    idx1 = (y * Wt + x).astype(np.int32).reshape(-1)
    idx = np.concatenate([np.clip(idx1 + g * Wt, 0, R - 1)
                          for g in range(ng)])[None]
    valid = np.ones((1, ng * hw), bool)
    idx, valid = jnp.asarray(idx), jnp.asarray(valid)
    N = ng * hw

    def mono(t, i):
        return jnp.sum(jnp.take(t[0], i[0], axis=0).astype(jnp.float32))

    dt = device_time(mono, table, idx, iters=8)
    print(f"{name} mono   {N} rows x {L} lanes: {dt*1e3:7.2f} ms "
          f"({dt/N*1e9:.2f} ns/row)", flush=True)

    for tr, br in tile_band_list:
        if H % tr:
            continue

        def banded(t, i, v, tr=tr, br=br):
            return jnp.sum(banded_gather_rows(t, i, v, ng, H, W, Wt,
                                              tr, br).astype(jnp.float32))

        dt = device_time(banded, table, idx, valid, iters=8)
        print(f"{name} banded tr={tr:3d} br={br:3d}: {dt*1e3:7.2f} ms "
              f"({dt/N*1e9:.2f} ns/row)", flush=True)


def main():
    run("L1 432x576 ng=2", 432, 576, 2, 256,
        [(48, 96), (27, 64), (16, 48)])
    run("L2 216x288 ng=3", 216, 288, 3, 512,
        [(72, 128), (24, 64)])
    # bench-res L1: 83K rows x 512 B (42 MB) — between the measured fast
    # (63K x 1KB) and slow (251K x 512B) regimes
    run("L1 256x320 ng=2", 256, 320, 2, 256,
        [(32, 64), (16, 48)])


if __name__ == "__main__":
    main()
