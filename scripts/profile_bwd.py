"""Backward-pass breakdown at bench config: which stage dominates training?

Times grad-of-sum for each stage in isolation (fwd+bwd) so the backward
cost = reported - forward-only number from profile_stages.py.
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
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from casmvsnet_pl_tpu.utils.devtime import device_time

    print("backend:", jax.default_backend(), flush=True)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    B, V, H, W = args.batch, 3, 512, 640
    rng = np.random.RandomState(0)

    def t(label, fn, *a):
        dt = device_time(fn, *a, iters=args.iters)
        print(f"{label:46s} {dt * 1e3:8.2f} ms", flush=True)
        return dt

    from casmvsnet_pl_tpu.models import FeatureNet
    from casmvsnet_pl_tpu.ops.plane_sweep import build_cost_volume
    from casmvsnet_pl_tpu.models import cost_reg as crmod

    # feature fwd+bwd
    net = FeatureNet(dtype=dtype)
    fvar = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), dtype))
    x = jnp.asarray(rng.rand(B * V, H, W, 3).astype(np.float32)).astype(dtype)

    def floss(v, x):
        out = net.apply(v, x)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in out.values())

    t("feature fwd+bwd", lambda v, x: jnp.sum(
        jax.grad(floss)(v, x)["params"]["conv0_0"]["conv"]["kernel"]), fvar, x)

    # warp+cost fwd+bwd per level (grad wrt feats)
    levels = [(2, 48, H // 4, W // 4, 32), (1, 32, H // 2, W // 2, 16),
              (0, 8, H, W, 8)]
    proj_np = np.tile(
        np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32),
        (B, V - 1, 1, 1))
    proj_np[..., 0, 3] = 3.0
    for (l, D, h, w, C) in levels:
        feats = jnp.asarray(
            rng.rand(B, V, h, w, C).astype(np.float32)).astype(dtype)
        proj = jnp.asarray(proj_np)
        dv = jnp.asarray(
            (425.0 + 2.65 * np.arange(D, dtype=np.float32))[None, :, None,
                                                            None]
            * np.ones((B, D, h, w), np.float32))

        def closs(fe, pr, d):
            return jnp.sum(build_cost_volume(fe, pr, d, groups=1,
                                             remat=False)
                           .astype(jnp.float32) ** 2)

        t(f"warp+cost L{l} fwd+bwd", lambda fe, pr, d: jnp.sum(
            jax.grad(closs)(fe, pr, d).astype(jnp.float32)), feats, proj, dv)

    # costreg fwd+bwd per level
    for (l, D, h, w, C) in levels:
        netc = (crmod.CostRegNetFolded if D <= 32
                else crmod.CostRegNet)(dtype=dtype)
        cvar = netc.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 8, 16, 16, C), dtype))
        vol = jnp.asarray(
            rng.rand(B, D, h, w, C).astype(np.float32)).astype(dtype)

        def rloss(v, x):
            return jnp.sum(netc.apply(v, x).astype(jnp.float32) ** 2)

        t(f"costreg L{l} fwd+bwd", lambda v, x: jnp.sum(
            jax.grad(rloss, argnums=1)(v, x).astype(jnp.float32)), cvar, vol)


if __name__ == "__main__":
    main()
