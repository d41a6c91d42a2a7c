"""Probe: patch-sampling forward vs backward at L0 train-res geometry.

profile_train_step measured patch LOSING end-to-end (612.6 vs 599.4 ms)
despite the isolated forward win (13.5 vs 18.4 ms/view). This probe
separates cost-volume forward and grad-of-sum (fwd+bwd) for quad vs patch
to locate the backward regression (suspects: the stored (N,128) hat-weight
tensor read back in backward; the 128-lane scatter into the 333K-row patch
table; cond-induced materialization).

Usage: python scripts/probe_patch3.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from probe_patch import rig_proj


def main():
    import jax
    import jax.numpy as jnp
    from casmvsnet_pl_tpu.ops import plane_sweep as ps
    from casmvsnet_pl_tpu.utils.devtime import device_time

    B, V, D, C = 2, 3, 8, 8
    H, W = 512, 640
    baseline = float(sys.argv[1]) if len(sys.argv) > 1 else 50.0
    print(f"baseline={baseline} (g=8 fits below ~30mm at d0=650; "
          f"g=4 below ~100)", flush=True)
    rng = np.random.RandomState(0)
    ref, src = rig_proj(baseline, W, H)
    rel = (src @ np.linalg.inv(ref))[:3].astype(np.float32)
    proj = jnp.asarray(np.tile(rel, (B, V - 1, 1, 1)))
    base = 650.0 + (np.arange(D, dtype=np.float32) - D / 2) * 2.65
    depths = jnp.asarray(np.tile(base[:, None, None],
                                 (B, 1, H, W)).astype(np.float32))
    feats = jnp.asarray(rng.randn(B, V, H, W, C), jnp.bfloat16)
    n = B * D * H * W * (V - 1)

    for mode in ("quad", "patch"):
        def fwd(feats, proj, depths, mode=mode):
            return jnp.sum(ps.build_cost_volume(
                feats, proj, depths, remat=False, sampling=mode))

        t = device_time(fwd, feats, proj, depths, iters=16)
        print(f"L0 CV fwd  {mode:6s}: {t*1e3:7.2f} ms "
              f"({t/n*1e9:.2f} ns/sample)", flush=True)

        def fwdbwd(feats, proj, depths, mode=mode):
            g = jax.grad(lambda f: jnp.sum(ps.build_cost_volume(
                f, proj, depths, remat=False, sampling=mode)))(feats)
            return jnp.sum(g.astype(jnp.float32))

        t = device_time(fwdbwd, feats, proj, depths, iters=8)
        print(f"L0 CV f+b  {mode:6s}: {t*1e3:7.2f} ms "
              f"({t/n*1e9:.2f} ns/sample)", flush=True)


if __name__ == "__main__":
    main()
