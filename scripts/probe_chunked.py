"""Probe: chunked_apply vs plain batched forward at B in {4, 8}.

Round-5 task 1 (VERDICT.md): batch >= 4 loses ~20%/map to VMEM
working-set spill. This probe measured the FIRST chunked_apply variant
(batched feature net + lax.map of the cascade-after-features) for chunk
in {1, 2} against the plain batched forward and the batch-1 reference.
HISTORY: the split-handoff variant measured here (27.0 maps/s at B=4)
lost ~4 ms/iter to layout handoffs; probe_chunked2.py's full-forward
scan won (29.4) and is what chunked_apply ships today.

Run alone on the TPU (no concurrent processes).
"""
import os
import sys

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax.numpy as jnp  # noqa: E402

from casmvsnet_pl_tpu.models import CascadeMVSNet, chunked_apply  # noqa: E402
from casmvsnet_pl_tpu.utils import init_on_cpu  # noqa: E402
from casmvsnet_pl_tpu.utils.devtime import device_time  # noqa: E402


def main():
    H, W, V = 512, 640, 3
    from bench import make_inputs
    dtype = jnp.bfloat16
    model = CascadeMVSNet(dtype=dtype, remat=False)
    imgs1, proj1 = make_inputs(1, H, W, V)
    variables = init_on_cpu(model, jax.random.PRNGKey(0),
                            imgs1[:1, :, :64, :64], proj1[:1], 425.0, 2.65)

    def run(batch, mode, chunk=1, iters=12):
        imgs_np, proj_np = make_inputs(batch, H, W, V)
        imgs, proj = jnp.asarray(imgs_np), jnp.asarray(proj_np)
        if mode == "batched":
            def fwd(imgs, proj):
                o = model.apply(variables, imgs, proj, 425.0, 2.65)
                return o["depth_0"], o["confidence_2"]
        else:
            def fwd(imgs, proj):
                o = chunked_apply(model, variables, imgs, proj, 425.0, 2.65,
                                  chunk=chunk)
                return o["depth_0"], o["confidence_2"]
        dt = device_time(fwd, imgs, proj, iters=iters)
        mps = batch / dt
        print(f"B={batch} {mode}{f' c={chunk}' if mode == 'chunked' else '':6s}"
              f" {dt * 1e3:8.2f} ms  {mps:6.2f} maps/s", flush=True)
        return mps

    run(1, "batched")
    for b in (4, 8):
        run(b, "batched")
        run(b, "chunked", chunk=1)
        run(b, "chunked", chunk=2)


if __name__ == "__main__":
    main()
