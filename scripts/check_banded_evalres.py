"""Correctness gate: banded forward gather ON vs OFF in the COMPOSED
cascade at eval resolution (1152x864x5, bf16, auto sampling).

The unit tests pin banded_gather_rows against jnp.take on small shapes;
this check runs the full production inference graph both ways on the TPU
and compares depth/confidence outputs bit-for-bit-ish (bf16 forward ->
exact equality expected up to nothing: the banded path gathers the SAME
rows unless a band overflows, in which case it falls back to the exact
monolithic gather).

Run alone on the TPU.
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


def main():
    from casmvsnet_pl_tpu.data.synthetic import PlaneScene
    from casmvsnet_pl_tpu.models import CascadeMVSNet
    from casmvsnet_pl_tpu.utils import init_on_cpu

    W, H, V = 1152, 864, 5
    scene = PlaneScene(img_wh=(W, H), n_views=V, z0=460.0, baseline=12.0,
                       focal=900.0, slope_x=0.2)
    imgs, proj, _ = scene.model_inputs()
    model = CascadeMVSNet(dtype=jnp.bfloat16)
    variables = init_on_cpu(model, jax.random.PRNGKey(0),
                            imgs[:1, :, :64, :64], proj[:1], 425.0, 2.65)

    def fwd(imgs, proj):
        return model.apply(variables, jnp.asarray(imgs), jnp.asarray(proj),
                           425.0, 2.65)

    outs = {}
    for flag in ("1", "0"):
        os.environ["CASMVS_BANDED_GATHER"] = flag
        # new jit per flag: the env gate is read at trace time
        outs[flag] = jax.device_get(jax.jit(fwd)(imgs, proj))
        print(f"banded={flag}: depth_0 mean "
              f"{np.mean(outs[flag]['depth_0']):.4f}", flush=True)

    for k in outs["1"]:
        a, b = outs["1"][k], outs["0"][k]
        diff = np.max(np.abs(a.astype(np.float64) - b.astype(np.float64)))
        print(f"{k:14s} max|banded - mono| = {diff:.6g}", flush=True)
        assert diff <= 1e-3, (k, diff)
    print("banded eval-res A/B check PASSED", flush=True)


if __name__ == "__main__":
    main()
