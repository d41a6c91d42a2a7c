"""Per-layer timing of FeatureNet at bench config (3 views, 512x640, bf16).

The round-4 batch-1 budget puts feature extraction at 7.28 ms for ~17
GFLOP (~2.3 TFLOP/s = ~1.2% of MXU peak): tiny channel counts (3..32)
waste the 128-lane minor dim. This probe times each conv stage in
isolation to find where the milliseconds actually go before any rewrite,
and A/B's candidate fixes:
  - s2d: exact space-to-depth rewrite of the 5x5/s2 convs
    (Conv(k=5,s=2) == Conv(k=3,s=1) on 2x2-space-to-depth input with
    rearranged weights -- standard TPU stem trick).
  - fused bottom-up: whole net vs sum of stages (XLA fusion check).

Run: python -u scripts/probe_feature.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from casmvsnet_pl_tpu.models.feature_net import FeatureNet
from casmvsnet_pl_tpu.utils.devtime import device_time

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

B, H, W = 3, 512, 640     # bench batch 1 => 3 views through the net
dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
print("backend:", jax.default_backend(), flush=True)

rng = jax.random.PRNGKey(0)
x = jnp.asarray(np.random.rand(B, H, W, 3), dtype)

net = FeatureNet(dtype=dtype)
variables = jax.jit(net.init)(rng, x)


def t(label, fn, *args):
    dt = device_time(jax.jit(fn), *args, iters=32)
    print(f"{label:<44}{dt*1e3:9.3f} ms", flush=True)
    return dt


# whole net
t("FULL FeatureNet", lambda v, x: net.apply(v, x), variables, x)

# per-stage: re-run the net but return early at each stage so XLA DCEs
# the rest; differences give incremental per-stage cost.
p = variables["params"]
bs = variables.get("batch_stats", {})


# Manual re-implementation of the forward using the trained params so we
# can cut at arbitrary points (FeatureNet has no capture arg).
from casmvsnet_pl_tpu.models.blocks import ConvBnAct  # noqa: E402


def partial_net(x, n_stages):
    """Apply the first n_stages ConvBnAct stages of the bottom-up path."""
    stages = [
        ("conv0_0", 8, 3, 1, 1), ("conv0_1", 8, 3, 1, 1),
        ("conv1_0", 16, 5, 2, 2), ("conv1_1", 16, 3, 1, 1),
        ("conv1_2", 16, 3, 1, 1),
        ("conv2_0", 32, 5, 2, 2), ("conv2_1", 32, 3, 1, 1),
        ("conv2_2", 32, 3, 1, 1),
    ]
    h = x
    for name, ch, k, s, pad in stages[:n_stages]:
        sub = {"params": p[name]}
        if name in bs:
            sub["batch_stats"] = bs[name]
        m = ConvBnAct(ch, kernel_size=k, stride=s, pad=pad, dtype=dtype)
        h = m.apply(sub, h, False)
    return h


prev = 0.0
for n in range(1, 9):
    dt = device_time(jax.jit(lambda x, n=n: partial_net(x, n)), x, iters=32)
    names = ["conv0_0", "conv0_1", "conv1_0", "conv1_1", "conv1_2",
             "conv2_0", "conv2_1", "conv2_2"]
    print(f"cum {n} ({names[n-1]:<8})  {dt*1e3:8.3f} ms   "
          f"(+{(dt-prev)*1e3:6.3f})", flush=True)
    prev = dt

# top-down pieces on realistic inputs
from casmvsnet_pl_tpu.ops.geometry import upsample2x  # noqa: E402

c0 = partial_net(x, 2)
c1 = partial_net(x, 5)
c2 = partial_net(x, 8)
c0, c1, c2 = jax.block_until_ready((c0, c1, c2))

import flax.linen as nn  # noqa: E402


def topdown(c0, c1, c2):
    feat2 = c2 @ jnp.asarray(p["toplayer"]["kernel"][0, 0], dtype) + \
        jnp.asarray(p["toplayer"]["bias"], dtype)
    lat1 = c1 @ jnp.asarray(p["lat1"]["kernel"][0, 0], dtype) + \
        jnp.asarray(p["lat1"]["bias"], dtype)
    lat0 = c0 @ jnp.asarray(p["lat0"]["kernel"][0, 0], dtype) + \
        jnp.asarray(p["lat0"]["bias"], dtype)
    feat1 = upsample2x(feat2) + lat1
    feat0 = upsample2x(feat1) + lat0
    return feat0, feat1, feat2


t("topdown (laterals + 2x upsamples)", topdown, c0, c1, c2)

f0, f1, f2 = jax.block_until_ready(topdown(c0, c1, c2))


def smooth(f0, f1):
    s1 = jax.lax.conv_general_dilated(
        f1, jnp.asarray(p["smooth1"]["kernel"], dtype), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    s0 = jax.lax.conv_general_dilated(
        f0, jnp.asarray(p["smooth0"]["kernel"], dtype), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return s0 + jnp.asarray(p["smooth0"]["bias"], dtype), \
        s1 + jnp.asarray(p["smooth1"]["bias"], dtype)


t("smooth0+smooth1 (3x3 reductions)", smooth, f0, f1)

print("done", flush=True)
