"""A/B: pack_quad as 4-piece lane concat vs one-hot 2x2 patch conv."""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from casmvsnet_pl_tpu.ops.grid_sample import _extract_patches
from casmvsnet_pl_tpu.utils.devtime import device_time

print("backend:", jax.default_backend(), flush=True)
dtype = jnp.bfloat16
rng = np.random.RandomState(0)


def pack_concat(feat):
    H, W, C = feat.shape
    p = jnp.pad(feat, ((1, 2), (1, 2), (0, 0)))
    q00 = p[:H + 1, :W + 1]
    q01 = p[:H + 1, 1:W + 2]
    q10 = p[1:H + 2, :W + 1]
    q11 = p[1:H + 2, 1:W + 2]
    return jnp.concatenate([q00, q01, q10, q11], axis=-1)


def pack_conv(feat):
    p = jnp.pad(feat, ((1, 1), (1, 1), (0, 0)))
    return _extract_patches(p[None], 2, 2)[0]


def t(label, fn, *a, iters=16):
    dt = device_time(fn, *a, iters=iters)
    print(f"{label:46s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


for (tag, h, w, C) in [("L0 512x640 C8", 512, 640, 8),
                       ("L1 256x320 C16", 256, 320, 16),
                       ("L2 128x160 C32", 128, 160, 32)]:
    feat = jnp.asarray(
        rng.rand(4, h, w, C).astype(np.float32)).astype(dtype)  # B*V-ish
    for (name, fn) in [("concat", pack_concat), ("conv", pack_conv)]:
        t(f"{tag} {name} x4", lambda f, fn=fn: jnp.sum(
            jax.vmap(fn)(f).astype(jnp.float32)), feat)
print("done", flush=True)
