"""Staged TPU diagnostic: time compile + run of each pipeline component.

Usage: python scripts/diag_tpu.py [--stage all|feature|warp|costreg|cascade]
Prints progress line-by-line (unbuffered) so hangs are attributable.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(label, fn, *args):
    print(f"[{label}] tracing/compiling...", flush=True)
    import jax
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    t1 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    t2 = time.perf_counter()
    for _ in range(4):
        out = fn(*args)
    jax.block_until_ready(out)
    t3 = time.perf_counter()
    print(f"[{label}] compile+run={t1 - t0:.1f}s steady={(t3 - t2) / 4 * 1e3:.1f}ms",
          flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", default="all")
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--W", type=int, default=640)
    p.add_argument("--views", type=int, default=3)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--remat", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    B, V, H, W = args.batch, args.views, args.H, args.W
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32))

    stage = args.stage

    if stage in ("all", "feature"):
        from casmvsnet_pl_tpu.models import FeatureNet
        net = FeatureNet(dtype=dtype)
        var = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), dtype))
        f = jax.jit(lambda x: net.apply(var, x))
        feats = timed(f"feature {B*V}x{H}x{W}", f,
                      imgs.reshape(B * V, H, W, 3).astype(dtype))
    if stage in ("all", "warp"):
        from casmvsnet_pl_tpu.ops.plane_sweep import build_cost_volume
        for (D, h, w, C) in [(48, H // 4, W // 4, 32), (32, H // 2, W // 2, 16),
                             (8, H, W, 8)]:
            feats = jnp.asarray(rng.rand(B, V, h, w, C).astype(np.float32)).astype(dtype)
            proj = jnp.asarray(
                np.tile(np.hstack([np.eye(3), np.ones((3, 1))]).astype(np.float32),
                        (B, V - 1, 1, 1)))
            dv = jnp.asarray(
                (425.0 + 2.65 * np.arange(D, dtype=np.float32))[None, :, None, None]
                * np.ones((B, D, h, w), np.float32))
            f = jax.jit(lambda fe, pr, d: build_cost_volume(
                fe, pr, d, groups=1, remat=args.remat))
            timed(f"warp+var D{D} {h}x{w} C{C}", f, feats, proj, dv)
    if stage in ("all", "costreg"):
        from casmvsnet_pl_tpu.models import CostRegNet
        for (D, h, w, C) in [(48, H // 4, W // 4, 32), (32, H // 2, W // 2, 16),
                             (8, H, W, 8)]:
            net = CostRegNet(dtype=dtype)
            var = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, C), dtype))
            vol = jnp.asarray(rng.rand(B, D, h, w, C).astype(np.float32)).astype(dtype)
            f = jax.jit(lambda v: net.apply(var, v))
            timed(f"costreg D{D} {h}x{w} C{C}", f, vol)
    if stage in ("all", "cascade"):
        from casmvsnet_pl_tpu.models import CascadeMVSNet
        model = CascadeMVSNet(dtype=dtype, remat=args.remat)
        proj = np.tile(np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32),
                       (B, V - 1, 3, 1, 1))
        proj[..., 0, 3] = rng.randn(B, V - 1, 3)
        proj = jnp.asarray(proj)
        var = model.init(jax.random.PRNGKey(0), imgs[:, :, :64, :64], proj,
                         425.0, 2.65)
        f = jax.jit(lambda im, pr: model.apply(var, im, pr, 425.0, 2.65)["depth_0"])
        timed(f"cascade {B}x{V}x{H}x{W}", f, imgs, proj)
    print("done", flush=True)


if __name__ == "__main__":
    main()
