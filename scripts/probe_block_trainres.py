"""Aligned-block / patch sampling A/B at TRAINING resolution (640x512).

VERDICT r1 item 5: the round-1 in-process A/B was invalidated by the jit
cache — run ONE variant per process invocation instead:

    python scripts/probe_block_trainres.py base        # auto: quad L0..L2
    python scripts/probe_block_trainres.py l1block     # L1 -> 128-lane block
    python scripts/probe_block_trainres.py patch       # L0 -> patch
    python scripts/probe_block_trainres.py patch_l1block

L1 quad at train res measures ~2.84 ns/row from a 10.6 MB / 83K-row folded
table (near the cliff edge); A=3 block packing cuts the table to 27.8K
rows — candidate for the last ~2 ms/view of gather rate at level 1.
"""
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

mode = sys.argv[1] if len(sys.argv) > 1 else "base"
print("backend:", jax.default_backend(), "mode:", mode, flush=True)
W, H, V, B = 640, 512, 3, 2
dtype = jnp.bfloat16

if "l1block" in mode:
    _orig_align = ps.block_align

    def _forced_align(C, H, W, itemsize=2):
        if C == 16:
            return 3                       # full 128-lane rows at level 1
        return _orig_align(C, H, W, itemsize)

    ps.block_align = _forced_align

sampling = "patch" if mode.startswith("patch") else "auto"

scene = PlaneScene(img_wh=(W, H), n_views=V, z0=460.0, baseline=12.0,
                   focal=600.0, slope_x=0.2)
imgs, proj, _ = scene.model_inputs()
imgs = jnp.asarray(np.repeat(np.asarray(imgs), B, axis=0))
proj = jnp.asarray(np.repeat(np.asarray(proj), B, axis=0))

model = CascadeMVSNet(dtype=dtype, remat=False, sampling=sampling)
variables = model.init(jax.random.PRNGKey(0), imgs[:, :, :64, :64],
                       proj, 425.0, 2.65)


def forward(imgs, proj):
    out = model.apply(variables, imgs, proj, 425.0, 2.65)
    return out["depth_0"], out["confidence_2"]


dt = device_time(forward, imgs, proj, iters=12)
print(f"train-res full fwd [{mode}]: {dt * 1e3:.1f} ms "
      f"({B / dt:.2f} maps/s)", flush=True)
