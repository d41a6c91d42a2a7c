"""Probe: is the cost-volume optimization_barrier still needed at eval res?

The barrier isolated the aligned-BLOCK sampler's layout choices (939 ->
411 ms/view, round 3). Eval-res now runs patch sampling with banded
gathers; block mode survives only as the runtime fallback branch. This
times the FULL composed cascade at 1152x864x5 with CASMVS_CV_BARRIER
forced 0 vs the auto (on) policy.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

barrier = sys.argv[1] if len(sys.argv) > 1 else "0"
os.environ["CASMVS_CV_BARRIER"] = barrier

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp


def main():
    from casmvsnet_pl_tpu.data.synthetic import PlaneScene
    from casmvsnet_pl_tpu.models import CascadeMVSNet
    from casmvsnet_pl_tpu.utils import init_on_cpu
    from casmvsnet_pl_tpu.utils.devtime import device_time

    W, H, V = 1152, 864, 5
    scene = PlaneScene(img_wh=(W, H), n_views=V, z0=460.0, baseline=12.0,
                       focal=900.0, slope_x=0.2)
    imgs, proj, _ = scene.model_inputs()
    model = CascadeMVSNet(dtype=jnp.bfloat16)
    variables = init_on_cpu(model, jax.random.PRNGKey(0),
                            imgs[:1, :, :64, :64], proj[:1], 425.0, 2.65)

    def fwd(imgs, proj):
        o = model.apply(variables, imgs, proj, 425.0, 2.65)
        return o["depth_0"], o["confidence_2"]

    dt = device_time(fwd, jnp.asarray(imgs), jnp.asarray(proj), iters=8)
    print(f"barrier={barrier}: FULL eval-res cascade {dt*1e3:.2f} ms/view",
          flush=True)


if __name__ == "__main__":
    main()
