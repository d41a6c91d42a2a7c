"""Probe: width-fold the tap-unrolled 3D conv's 2D core (L2 costreg).

conv3x3x3 lowers to a 2D conv with N = 3*Co lanes (ops/conv3d.py); at
CostRegNet's conv0 (Ci=32 -> Co=8, N=24) that is 19% lane occupancy.
The width fold that fixed the feature net applies to the inner 2D conv
unchanged (stride-1 taps only). This times the stride-1 costreg convs at
L2 bench/eval shapes, plain vs W-folded, before any model wiring.
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

from casmvsnet_pl_tpu.ops.conv3d import conv2d_wfolded
from casmvsnet_pl_tpu.utils.devtime import device_time

rng = np.random.RandomState(0)


def main():
    dtype = jnp.bfloat16
    # (name, D, H, W, Ci, Co): stride-1 convs of the L2 CostRegNet at
    # bench res (128x160) and eval res (216x288)
    cases = [
        ("bench L2 conv0 D48", 48, 128, 160, 32, 8),
        ("bench L2 conv2 D24", 24, 64, 80, 16, 16),
        ("eval  L2 conv0 D48", 48, 216, 288, 32, 8),
    ]
    for name, D, H, W, Ci, Co in cases:
        x = jnp.asarray(rng.randn(D, H, W, Ci), dtype)   # B*D folded batch
        k3 = rng.randn(3, 3, 3, Ci, Co).astype(np.float32) * 0.1
        k2 = jnp.asarray(np.concatenate([k3[0], k3[1], k3[2]], axis=-1))

        def plain(x):
            return jax.lax.conv_general_dilated(
                x, k2.astype(dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        t0 = device_time(plain, x, iters=24)
        line = f"{name:22s} plain {t0*1e3:7.3f} ms"
        for F in (2, 4, 8):
            if W % F:
                continue

            def folded(x, F=F):
                return conv2d_wfolded(x, k2, F)

            tf = device_time(folded, x, iters=24)
            line += f" | F={F} {tf*1e3:7.3f}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
