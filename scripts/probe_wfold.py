"""Probe: width-folded 3x3 stride-1 convs for small channel counts.

Feature-net decomposition (scripts/probe_feature.py, v5e, 2026-08-20):
smooth0+smooth1 = 2.25 ms of the 5.54 ms isolated net — full-res 3x3
convs with Cout in {8, 16} run at ~1% MFU because the output minor dim
wastes 94% of the 128 MXU lanes.

Width-folding: (H, W, C) -> (H, W/F, F*C) is a FREE reshape (identical
row-major layout), and the 3x3 conv becomes a 3x3 conv over (H, Wb)
whose dense (F*Ci -> F*Co) kernel embeds the width taps as a band —
F/3 x more FLOPs, full lane occupancy (the same trade as the D-folded
CostRegNet, ops/conv3d.py). This probe times smooth0/smooth1/conv0_1/
conv1_1 shapes, unfolded vs F in {4, 8, 16}, and checks exactness.
"""
from __future__ import annotations

import functools
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

from casmvsnet_pl_tpu.ops.conv3d import conv2d_wfolded as conv_wfolded
from casmvsnet_pl_tpu.utils.devtime import device_time


def conv_plain(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    rng = np.random.RandomState(0)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    cases = [
        ("smooth0 512x640 32->8", 3, 512, 640, 32, 8),
        ("smooth1 256x320 32->16", 3, 256, 320, 32, 16),
        ("conv0_1 512x640 8->8", 3, 512, 640, 8, 8),
        ("conv1_1 256x320 16->16", 3, 256, 320, 16, 16),
        ("conv2_1 128x160 32->32", 3, 128, 160, 32, 32),
    ]
    for name, B, H, W, Ci, Co in cases:
        x = jnp.asarray(rng.randn(B, H, W, Ci), dtype)
        k = jnp.asarray(rng.randn(3, 3, Ci, Co).astype(np.float32) * 0.1)
        # exactness (f32, small slice)
        ref = np.asarray(conv_plain(x[:1, :64, :64].astype(jnp.float32),
                                    k))
        got = np.asarray(conv_wfolded(x[:1, :64, :64].astype(jnp.float32),
                                      k, 8))
        err = np.abs(ref - got).max()
        assert err < 1e-4, (name, err)
        t0 = device_time(lambda x: conv_plain(x, k), x, iters=24)
        line = f"{name:26s} plain {t0*1e3:7.3f} ms"
        for F in (4, 8, 16):
            if W % F or F * Co > 256:
                continue
            tf = device_time(lambda x, F=F: conv_wfolded(x, k, F), x,
                             iters=24)
            line += f" | F={F} {tf*1e3:7.3f}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
