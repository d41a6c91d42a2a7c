"""Full-cascade eval-res A/B with block sampling enabled per-level, to
find which level's block integration regresses the whole graph."""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from casmvsnet_pl_tpu.data.synthetic import PlaneScene
from casmvsnet_pl_tpu.models import CascadeMVSNet
from casmvsnet_pl_tpu.ops import plane_sweep as ps
from casmvsnet_pl_tpu.utils.devtime import device_time

print("backend:", jax.default_backend(), flush=True)
W, H, V = 1152, 864, 5
dtype = jnp.bfloat16

scene = PlaneScene(img_wh=(W, H), n_views=V, z0=460.0, baseline=12.0,
                   focal=1000.0, slope_x=0.2)
imgs, proj, _ = scene.model_inputs()
imgs, proj = jnp.asarray(imgs), jnp.asarray(proj)

_real_block_align = ps.block_align


def run(tag, allow):
    ps.block_align = (lambda C, h, w, itemsize=2:
                      _real_block_align(C, h, w, itemsize)
                      if C in allow else 1)
    model = CascadeMVSNet(dtype=dtype, remat=False, sampling="auto")
    variables = model.init(jax.random.PRNGKey(0), imgs[:, :, :64, :64],
                           proj, 425.0, 2.65)

    def forward(imgs, proj):
        out = model.apply(variables, imgs, proj, 425.0, 2.65)
        return out["depth_0"], out["confidence_2"]

    dt = device_time(forward, imgs, proj, iters=6)
    print(f"full fwd [{tag}]: {dt * 1e3:.1f} ms/view", flush=True)


import os
only = os.environ.get("PROBE_ONLY", "")
if only == "both":
    run("block L0+L1", {8, 16})
else:
    run("block L0 only (C=8)", {8})
    run("block L1 only (C=16)", {16})
    run("block L0+L1", {8, 16})
ps.block_align = _real_block_align
print("done", flush=True)
