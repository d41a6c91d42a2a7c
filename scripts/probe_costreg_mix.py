"""Per-level A/B: CostRegNetFolded (dense banded kernels, full lanes, D/3x
FLOP inflation) vs CostRegNet (tap-unrolled 3D convs, 3*Co lanes, no
inflation). The right choice may flip with D (band fraction 3/D)."""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from casmvsnet_pl_tpu.models import cost_reg as crmod
from casmvsnet_pl_tpu.utils.devtime import device_time

print("backend:", jax.default_backend(), flush=True)
dtype = jnp.bfloat16
rng = np.random.RandomState(0)
B = 2


def t(label, fn, *a, iters=12):
    dt = device_time(fn, *a, iters=iters)
    print(f"{label:52s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


for (l, D, h, w, C) in [(2, 48, 128, 160, 32), (1, 32, 256, 320, 16),
                        (0, 8, 512, 640, 8)]:
    vol = jnp.asarray(rng.rand(B, D, h, w, C).astype(np.float32)).astype(dtype)
    for name, cls in [("folded", crmod.CostRegNetFolded),
                      ("unfolded", crmod.CostRegNet)]:
        net = cls(dtype=dtype)
        var = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, C),
                                                        dtype))
        t(f"costreg L{l} D{D} {h}x{w} C{C} {name}",
          lambda v, x, net=net: jnp.sum(net.apply(v, x).astype(jnp.float32)),
          var, vol)
print("done", flush=True)
