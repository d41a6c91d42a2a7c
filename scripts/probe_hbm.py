"""Raw HBM bandwidth vs buffer size on this chip.

probe_b4decomp showed a PURE ELEMENTWISE op chain (the variance combine)
running ~3x below the 819 GB/s HBM bound at batch 4 (3.01 ms for ~860 MB
of traffic) while hitting the bound at batch 1 (0.37 ms / ~215 MB). If
the effective copy rate itself degrades with buffer size, every stage's
superlinear batch scaling (pack 8.6x, view 5.0x, combine 8.1x, folded
costreg 5x) has one hardware/runtime explanation and the fix is traffic
reduction / chunking, not op-level tuning.

Measures y = x * a + b (read N bytes f32 + write N bytes) at sizes from
32 MB to 1.3 GB, flat and 2D-shaped.

Run: python -u scripts/probe_hbm.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from casmvsnet_pl_tpu.utils.devtime import device_time

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
print("backend:", jax.default_backend(), flush=True)

MB = 1024 * 1024
for mb in (32, 84, 168, 336, 672, 1344):
    n = mb * MB // 4
    # 2D shape with a 128-multiple minor dim (layout-friendly)
    cols = 1024
    rows = n // cols
    x = jnp.ones((rows, cols), jnp.float32)

    def axpb(x):
        return x * 1.0001 + 0.5

    dt = device_time(axpb, x, iters=64 if mb <= 336 else 16)
    gbs = 2 * rows * cols * 4 / max(dt, 1e-9) / 1e9
    print(f"{mb:6d} MB f32 axpb: {dt*1e3:8.3f} ms  {gbs:7.1f} GB/s",
          flush=True)

# bf16 variant at the two interesting sizes
for mb in (168, 672):
    n = mb * MB // 2
    cols = 1024
    rows = n // cols
    x = jnp.ones((rows, cols), jnp.bfloat16)

    def axpb16(x):
        return x * jnp.bfloat16(1.01) + jnp.bfloat16(0.5)

    dt = device_time(axpb16, x, iters=32)
    gbs = 2 * rows * cols * 2 / max(dt, 1e-9) / 1e9
    print(f"{mb:6d} MB bf16 axpb: {dt*1e3:8.3f} ms  {gbs:7.1f} GB/s",
          flush=True)
print("done", flush=True)
