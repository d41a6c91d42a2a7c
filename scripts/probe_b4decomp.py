"""Decompose the batch-4 warp+cost regression (probe_scanfold showed the
gather is NOT it: nogather == prod at B=4).

Times the production pieces of batched_variance_cost_volume separately at
B in {1, 4}:
  pack        _pack_tables (patch table build, one-hot conv)
  view        _sample_view on a pre-packed table (coords+gather+epilogue)
  combine     the variance accumulation given pre-materialized warped
              volumes (f32 s/sq chain + var, cast)
  full        batched_variance_cost_volume as shipped

Run: python -u scripts/probe_b4decomp.py [--levels 0,1] [--batches 1,4]
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

    def t(label, fn, *a):
        dt = device_time(fn, *a, iters=args.iters)
        print(label + f"{dt*1e3:9.2f} ms", flush=True)
        return dt

    for lv in [int(x) for x in args.levels.split(",")]:
        D, h, w, C = levels[lv]
        hw = h * w
        cfg = ps._resolve_sampling("auto", C, D, h, w, 2)
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
            srcs = feats[:, 1:]
            lbl = f"L{lv} B={B} "

            t(lbl + "pack      ", lambda s: ps._pack_tables(s, cfg), srcs)

            tables = jax.block_until_ready(ps._pack_tables(srcs, cfg))
            t(lbl + "view      ",
              lambda tb, pr, d: ps._sample_view(tb[:, 0], pr[:, 0], d,
                                                h, w, cfg),
              tables, proj, dv)

            o1 = ps._sample_view(tables[:, 0], proj[:, 0], dv, h, w, cfg)
            o2 = ps._sample_view(tables[:, 1], proj[:, 1], dv, h, w, cfg)
            ref = feats[:, 0]
            o1, o2, ref = jax.block_until_ready((o1, o2, ref))

            def combine(o1, o2, ref):
                reff = ref.reshape(B, 1, hw, C).astype(jnp.float32)
                s = jnp.broadcast_to(reff, (B, D, hw, C))
                sq = s * s
                s = s + o1
                sq = sq + o1 * o1
                s = s + o2
                sq = sq + o2 * o2
                var = sq / V - (s / V) ** 2
                return var.astype(dtype).reshape(B, D, h, w, C)

            t(lbl + "combine   ", combine, o1, o2, ref)

            t(lbl + "full      ",
              lambda fe, pr, d: ps.build_cost_volume(fe, pr, d, groups=1,
                                                     remat=False),
              feats, proj, dv)
    print("done", flush=True)


if __name__ == "__main__":
    main()
