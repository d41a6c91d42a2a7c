"""Why does warp+cost scale super-linearly with batch (B4/B1 = 5.3-6.5x
vs the <=4x expectation; bench 29.2 maps/s at B=1 vs 23.5 at B=4)?

The per-batch-element gathers run inside one lax.scan past _FOLD_LIMIT
(ops/banded_take.batched_take). Isolated, the scan measures 4.1-4.2
ns/row flat in B — so either the scan behaves differently COMPOSED
(materialized rows break the gather->epilogue fusion), or the regression
is elsewhere in the sampler. This probe times the full production
build_cost_volume at B in {1, 4} under three gather implementations:

  prod      batched_take as shipped (B=1 folds, B=4 scans)
  fold      always fold: ONE gather over (B*R, L) with offset indices
            (table row count 4x -> possibly past the ~340K-row rate cliff)
  nogather  rows replaced by a broadcast of row 0 (same shapes, no random
            access) — upper bound on "everything except the gather"

Run: python -u scripts/probe_scanfold.py [--levels 0,1] [--batches 1,4]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="0,1")
    ap.add_argument("--batches", default="1,4")
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from casmvsnet_pl_tpu.ops import plane_sweep as ps
    from casmvsnet_pl_tpu.utils.devtime import device_time

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_tpu_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    print("backend:", jax.default_backend(), flush=True)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    H0, W0, V = 512, 640, 3
    levels = {0: (8, H0, W0, 8), 1: (32, H0 // 2, W0 // 2, 16),
              2: (48, H0 // 4, W0 // 4, 32)}
    rng = np.random.RandomState(0)

    def take_fold(table, idx):
        B, R, L = table.shape
        flat = table.reshape(B * R, L)
        fidx = idx + (jnp.arange(B, dtype=jnp.int32) * R)[:, None]
        return jnp.take(flat, fidx.reshape(-1), axis=0).reshape(B, -1, L)

    def take_none(table, idx):
        B, R, L = table.shape
        N = idx.shape[1]
        return jnp.broadcast_to(table[:, :1, :], (B, N, L))

    prod_take = ps.batched_take

    for lv in [int(x) for x in args.levels.split(",")]:
        D, h, w, C = levels[lv]
        for B in [int(x) for x in args.batches.split(",")]:
            feats = jnp.asarray(
                rng.rand(B, V, h, w, C).astype(np.float32)).astype(dtype)
            proj_np = np.tile(
                np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32),
                (B, V - 1, 1, 1))
            proj_np[..., 0, 3] = 3.0
            proj = jnp.asarray(proj_np)
            dv = jnp.asarray(
                (425.0 + 2.65 * np.arange(D, dtype=np.float32))
                [None, :, None, None] * np.ones((B, D, h, w), np.float32))
            for name, impl in [("prod", prod_take), ("fold", take_fold),
                               ("nogather", take_none)]:
                if name != "prod" and B == 1:
                    continue          # B=1 already folds in prod
                ps.batched_take = impl
                try:
                    fn = lambda fe, pr, d: ps.build_cost_volume(
                        fe, pr, d, groups=1, remat=False)
                    dt = device_time(fn, feats, proj, dv, iters=args.iters)
                    print(f"L{lv} B={B} {name:<10}{dt*1e3:9.2f} ms "
                          f"({dt*1e3/B:6.2f} /map)", flush=True)
                finally:
                    ps.batched_take = prod_take
    print("done", flush=True)


if __name__ == "__main__":
    main()
