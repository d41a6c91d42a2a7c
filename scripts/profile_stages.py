"""Per-stage device-time breakdown of the cascade forward at bench config.

Times each pipeline stage with devtime.device_time (in-jit fori_loop), so
numbers are real device ms, not dispatch. Run on the TPU:

    python -u scripts/profile_stages.py [--batch 2]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--W", type=int, default=640)
    p.add_argument("--views", type=int, default=3)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--groups", type=int, default=1)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from casmvsnet_pl_tpu.utils import init_on_cpu
    from casmvsnet_pl_tpu.utils.devtime import device_time

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_tpu_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    print("backend:", jax.default_backend(), flush=True)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    B, V, H, W = args.batch, args.views, args.H, args.W
    rng = np.random.RandomState(0)

    def t(label, fn, *a):
        dt = device_time(fn, *a, iters=args.iters)
        print(f"{label:42s} {dt * 1e3:8.2f} ms", flush=True)
        return dt

    total = 0.0

    # ---- FeatureNet over B*V images -------------------------------------
    from casmvsnet_pl_tpu.models import FeatureNet
    net = FeatureNet(dtype=dtype)
    fvar = init_on_cpu(net, jax.random.PRNGKey(0),
                       np.zeros((1, 64, 64, 3), np.float32).astype(dtype))
    x = jnp.asarray(rng.rand(B * V, H, W, 3).astype(np.float32)).astype(dtype)
    total += t(f"feature {B*V}x{H}x{W}", lambda v, x: net.apply(v, x), fvar, x)

    # ---- per-level warp+cost and costreg ---------------------------------
    from casmvsnet_pl_tpu.ops.plane_sweep import build_cost_volume
    from casmvsnet_pl_tpu.models.cascade import CascadeMVSNet

    levels = [(2, 48, H // 4, W // 4, 32), (1, 32, H // 2, W // 2, 16),
              (0, 8, H, W, 8)]
    proj_np = np.tile(np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32),
                      (B, V - 1, 1, 1))
    proj_np[..., 0, 3] = 3.0
    for (l, D, h, w, C) in levels:
        feats = jnp.asarray(rng.rand(B, V, h, w, C).astype(np.float32)).astype(dtype)
        proj = jnp.asarray(proj_np)
        dv = jnp.asarray(
            (425.0 + 2.65 * np.arange(D, dtype=np.float32))[None, :, None, None]
            * np.ones((B, D, h, w), np.float32))
        total += t(f"warp+cost L{l} D{D} {h}x{w} C{C}",
                   lambda fe, pr, d: build_cost_volume(
                       fe, pr, d, groups=args.groups, remat=False),
                   feats, proj, dv)

    model = CascadeMVSNet(dtype=dtype, num_groups=args.groups, remat=False)
    imgs = jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32))
    proj5 = jnp.asarray(np.tile(proj_np[:, :, None], (1, 1, 3, 1, 1)))
    mvar = init_on_cpu(model, jax.random.PRNGKey(0),
                       np.asarray(imgs[:, :, :64, :64]), np.asarray(proj5),
                       425.0, 2.65)

    # costreg per level using the real (folded) path the cascade uses
    from casmvsnet_pl_tpu.models import cost_reg as crmod
    print("cost_reg module symbols:", [s for s in dir(crmod) if "Cost" in s],
          flush=True)
    for (l, D, h, w, C) in levels:
        Cin = args.groups if args.groups > 1 else C
        netc = crmod.CostRegNetFolded(dtype=dtype) \
            if hasattr(crmod, "CostRegNetFolded") else crmod.CostRegNet(dtype=dtype)
        cvar = init_on_cpu(netc, jax.random.PRNGKey(0),
                           np.zeros((1, 8, 16, 16, Cin), np.float32)
                           .astype(dtype))
        vol = jnp.asarray(rng.rand(B, D, h, w, Cin).astype(np.float32)).astype(dtype)
        total += t(f"costreg L{l} D{D} {h}x{w} C{Cin}",
                   lambda v, x: netc.apply(v, x), cvar, vol)

    print(f"{'sum of stages':42s} {total * 1e3:8.2f} ms", flush=True)

    # ---- full cascade -----------------------------------------------------
    dt = t(f"FULL cascade {B}x{V}x{H}x{W}",
           lambda v, im, pr: model.apply(v, im, pr, 425.0, 2.65)["depth_0"],
           mvar, imgs, proj5)
    print(f"maps/s = {B / dt:.2f}", flush=True)


if __name__ == "__main__":
    main()
