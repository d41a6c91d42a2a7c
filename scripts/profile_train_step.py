"""End-to-end training-step device time at the reference config
(DTU 640x512, batch 2, 3 views, Adam) on the real TPU."""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from casmvsnet_pl_tpu.data.synthetic import PlaneScene
from casmvsnet_pl_tpu.engine.trainer import MVSTrainer
from casmvsnet_pl_tpu.models import CascadeMVSNet
from casmvsnet_pl_tpu.utils.devtime import device_time
from casmvsnet_pl_tpu.utils.optimizers import OptimConfig

print("backend:", jax.default_backend(), flush=True)
B, H, W, V = 2, 512, 640, 3
dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

import argparse

p = argparse.ArgumentParser()
p.add_argument("--sampling", default="auto")
p.add_argument("--remat", action="store_true")
args = p.parse_args()

scene = PlaneScene(img_wh=(W, H), n_views=V, z0=460.0, baseline=12.0,
                   focal=600.0, slope_x=0.2)
imgs, proj, depth_pyr = scene.model_inputs()
imgs = np.repeat(imgs, B, axis=0)
proj = np.repeat(proj, B, axis=0)

depths, masks = {}, {}
for l in range(3):
    d = np.repeat(np.asarray(depth_pyr[f"level_{l}"]), B, axis=0)
    depths[f"level_{l}"] = jnp.asarray(d)
    masks[f"level_{l}"] = jnp.asarray(np.ones_like(d, bool))
batch = {
    "imgs": jnp.asarray(imgs), "proj_mats": jnp.asarray(proj),
    "init_depth_min": jnp.full((B,), 425.0, jnp.float32),
    "depth_interval": jnp.full((B,), 2.65, jnp.float32),
    "depths": depths, "masks": masks,
}

model = CascadeMVSNet(dtype=dtype, remat=args.remat, sampling=args.sampling)
cfg = OptimConfig(optimizer="adam", lr=1e-3)
trainer = MVSTrainer(model, cfg, steps_per_epoch=100)
state = trainer.init_state(batch)


def step(state, batch):
    new_state, logs = trainer.train_step(state, batch)
    return new_state.params, logs["train/loss"]


dt = device_time(step, state, batch, iters=8)
print(f"train_step sampling={args.sampling} remat={args.remat}: "
      f"{dt * 1e3:.1f} ms ({B / dt:.2f} samples/s)", flush=True)
