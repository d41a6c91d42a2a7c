"""Probe: composed-cascade forward A/B, quad(auto) vs patch sampling.

Isolated L0 cost volumes measure patch much faster (probe_patch3: f+b 90
vs 146 ms at g=8 geometry), yet the composed train step measures patch
~19 ms SLOWER (profile_train_step). This probe bisects: composed forward
only, same PlaneScene as the profile/bench.

Usage: python scripts/probe_patch4.py [auto|patch|window] ...
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from casmvsnet_pl_tpu.data.synthetic import PlaneScene
    from casmvsnet_pl_tpu.models import CascadeMVSNet
    from casmvsnet_pl_tpu.utils.devtime import device_time

    B, H, W, V = 2, 512, 640, 3
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    scene = PlaneScene(img_wh=(W, H), n_views=V, z0=460.0, baseline=12.0,
                       focal=600.0, slope_x=0.2)
    imgs, proj, _ = scene.model_inputs()
    imgs = jnp.asarray(np.repeat(imgs, B, axis=0))
    proj = jnp.asarray(np.repeat(proj, B, axis=0))

    do_grad = os.environ.get("PROBE_GRAD", "0") == "1"
    for mode in (sys.argv[1:] or ["auto", "patch"]):
        model = CascadeMVSNet(dtype=dtype, sampling=mode)
        variables = model.init(jax.random.PRNGKey(0), imgs[:, :, :64, :64],
                               proj, 425.0, 2.65)

        def fwd(variables, imgs, proj):
            out = model.apply(variables, imgs, proj, 425.0, 2.65)
            return out["depth_0"], out["confidence_2"]

        if do_grad:
            def loss(variables, imgs, proj):
                # train=False: BN inference stats (immutable apply); the
                # backward A/B only cares about the sampling-path delta
                out = model.apply(variables, imgs, proj, 425.0, 2.65)
                return (jnp.mean(out["depth_0"].astype(jnp.float32)) +
                        jnp.mean(out["depth_1"].astype(jnp.float32)) +
                        jnp.mean(out["depth_2"].astype(jnp.float32)))

            def fwdbwd(variables, imgs, proj):
                g = jax.grad(loss)(variables, imgs, proj)
                # depend on EVERY grad leaf or XLA dead-code-eliminates the
                # pruned parts of the backward
                return sum(jnp.sum(l.astype(jnp.float32))
                           for l in jax.tree.leaves(g))

            t = device_time(fwdbwd, variables, imgs, proj, iters=8)
            print(f"cascade f+b sampling={mode:6s}: {t*1e3:7.2f} ms",
                  flush=True)
        else:
            t = device_time(fwd, variables, imgs, proj, iters=16)
            print(f"cascade fwd sampling={mode:6s}: {t*1e3:7.2f} ms "
                  f"({B/t:.2f} maps/s)", flush=True)


if __name__ == "__main__":
    main()
