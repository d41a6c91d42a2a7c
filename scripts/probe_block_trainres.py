"""Does aligned-block sampling + barrier beat quad at TRAINING resolution
(640x512) too? Full-cascade A/B by overriding the row threshold."""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("CASMVS_CV_BARRIER", "auto")

import jax
import jax.numpy as jnp

from casmvsnet_pl_tpu.data.synthetic import PlaneScene
from casmvsnet_pl_tpu.models import CascadeMVSNet
from casmvsnet_pl_tpu.ops import plane_sweep as ps
from casmvsnet_pl_tpu.utils.devtime import device_time

print("backend:", jax.default_backend(), "barrier:",
      os.environ.get("CASMVS_CV_BARRIER", "auto"), flush=True)
W, H, V, B = 640, 512, 3, 2
dtype = jnp.bfloat16

scene = PlaneScene(img_wh=(W, H), n_views=V, z0=460.0, baseline=12.0,
                   focal=600.0, slope_x=0.2)
imgs, proj, _ = scene.model_inputs()
imgs = jnp.asarray(np.repeat(np.asarray(imgs), B, axis=0))
proj = jnp.asarray(np.repeat(np.asarray(proj), B, axis=0))


def run(tag):
    model = CascadeMVSNet(dtype=dtype, remat=False, sampling="auto")
    variables = model.init(jax.random.PRNGKey(0), imgs[:, :, :64, :64],
                           proj, 425.0, 2.65)

    def forward(imgs, proj):
        out = model.apply(variables, imgs, proj, 425.0, 2.65)
        return out["depth_0"], out["confidence_2"]

    dt = device_time(forward, imgs, proj, iters=12)
    print(f"train-res full fwd [{tag}]: {dt * 1e3:.1f} ms "
          f"({B / dt:.2f} maps/s)", flush=True)


run(f"quad (thresh={ps._ROW_THRESH})")
ps._ROW_THRESH = 50_000          # force block at every blockable level
run("block L0+L1 forced")
print("done", flush=True)
