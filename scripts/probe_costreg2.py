"""Per-layer breakdown of CostRegNet time at each cascade level.

The composed nets measure 6.4 (L0 folded) / 10.2 (L1 folded) / 5.3 ms
(L2 unfolded) at B=2 train res — but the summed FLOP bound is ~0.7 ms and
the bandwidth bound ~0.6 ms at L0, so something is 5-10x off. This probe
times every layer of the production layout in isolation (conv + inference
BN affine + leaky_relu, like the real blocks) and prints each layer's
dense-FLOP and memory-traffic bounds, so the next optimization targets
the right layer.

Usage: python scripts/probe_costreg2.py [level ...]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from casmvsnet_pl_tpu.ops.conv3d import (conv3x3x3, conv3x3x3_folded,
                                         conv_transpose3x3x3_s2,
                                         conv_transpose3x3x3_s2_folded)
from casmvsnet_pl_tpu.utils.devtime import device_time

print("backend:", jax.default_backend(), flush=True)
dtype = jnp.bfloat16
rng = np.random.RandomState(0)
B = 2
PEAK_TFLOPS = 197.0          # measured v5e bf16 (bench.py docstring)
HBM_GBPS = 819.0             # v5e HBM


def leaky(y):
    return jnp.where(y >= 0, y, 0.01 * y)


def t(label, fn, *a, gflop=None, mb=None, iters=12):
    dt = device_time(fn, *a, iters=iters)
    bound = ""
    if gflop is not None and mb is not None:
        fb = gflop / PEAK_TFLOPS               # ms at MXU peak
        bb = mb / HBM_GBPS                     # ms at HBM peak
        bound = (f"  flop {gflop:7.1f}G ({fb:5.2f} ms)  mem {mb:6.0f}MB "
                 f"({bb:5.2f} ms)  slack {dt * 1e3 / max(fb, bb):5.1f}x")
    print(f"{label:24s} {dt * 1e3:7.2f} ms{bound}", flush=True)
    return dt


def mb_of(*shapes):
    return sum(2 * int(np.prod(s)) for s in shapes) / 1e6   # bf16 bytes


def folded_level(name, D, H, W, C):
    """Per-layer timing of CostRegNetFolded's exact op sequence."""
    print(f"--- {name} folded  D={D} {H}x{W} C={C}  (B={B})", flush=True)
    chans = [(C, 8, 1), (8, 16, 2), (16, 16, 1), (16, 32, 2), (32, 32, 1),
             (32, 64, 2), (64, 64, 1)]
    x = jnp.asarray(rng.rand(B, H, W, D * C).astype(np.float32), dtype)
    total = 0.0
    d, h, w = D, H, W
    skips = {}
    for i, (ci, co, s) in enumerate(chans):
        k = jnp.asarray(rng.randn(3, 3, 3, ci, co).astype(np.float32))
        do = (d + s - 1) // s
        sc = jnp.asarray(rng.rand(do * co).astype(np.float32), dtype)
        sh = jnp.asarray(rng.rand(do * co).astype(np.float32), dtype)

        def layer(x, k, sc, sh, d=d, s=s):
            return leaky(conv3x3x3_folded(x, k, d, s) * sc + sh)

        ho, wo = h // s, w // s
        # dense-kernel FLOPs: the folded kernel is (3,3,d*ci,do*co)
        gf = 2 * 9 * (d * ci) * (do * co) * ho * wo * B / 1e9
        mem = mb_of((B, h, w, d * ci), (B, ho, wo, do * co))
        total += t(f"conv{i} s{s} {d}x{ci}->{do}x{co}", layer, x, k, sc, sh,
                   gflop=gf, mb=mem)
        x = jnp.asarray(rng.rand(B, ho, wo, do * co).astype(np.float32),
                        dtype)
        skips[i] = (d, h, w)
        d, h, w = do, ho, wo
    for i, ci, co in [(7, 64, 32), (9, 32, 16), (11, 16, 8)]:
        k = jnp.asarray(rng.randn(3, 3, 3, ci, co).astype(np.float32))
        do = 2 * d
        sc = jnp.asarray(rng.rand(do * co).astype(np.float32), dtype)
        sh = jnp.asarray(rng.rand(do * co).astype(np.float32), dtype)
        skip = jnp.asarray(rng.rand(B, 2 * h, 2 * w, do * co)
                           .astype(np.float32), dtype)

        def layer(x, k, sc, sh, skip, d=d):
            return skip + leaky(
                conv_transpose3x3x3_s2_folded(x, k, d) * sc + sh)

        gf = 2 * 9 * (d * ci) * (do * co) * 2 * h * 2 * w * B / 1e9
        mem = mb_of((B, h, w, d * ci), 2 * (B, 2 * h, 2 * w, do * co))
        total += t(f"deconv{i} {d}x{ci}->{do}x{co}", layer, x, k, sc, sh,
                   skip, gflop=gf, mb=mem)
        d, h, w = do, 2 * h, 2 * w
        x = jnp.asarray(rng.rand(B, h, w, d * co).astype(np.float32), dtype)
    k = jnp.asarray(rng.randn(3, 3, 3, 8, 1).astype(np.float32))

    def prob(x, k):
        return conv3x3x3_folded(x, k, D, 1) + jnp.float32(0.1)

    gf = 2 * 9 * (D * 8) * D * H * W * B / 1e9
    total += t("prob 8->1", prob, x, k,
               gflop=gf, mb=mb_of((B, H, W, D * 8), (B, H, W, D)))
    print(f"{'sum of layers':24s} {total * 1e3:7.2f} ms", flush=True)


def unfolded_level(name, D, H, W, C):
    """Per-layer timing of CostRegNet's kd-unrolled op sequence."""
    print(f"--- {name} unfolded  D={D} {H}x{W} C={C}  (B={B})", flush=True)
    chans = [(C, 8, 1), (8, 16, 2), (16, 16, 1), (16, 32, 2), (32, 32, 1),
             (32, 64, 2), (64, 64, 1)]
    x = jnp.asarray(rng.rand(B, D, H, W, C).astype(np.float32), dtype)
    total = 0.0
    d, h, w = D, H, W
    for i, (ci, co, s) in enumerate(chans):
        k = jnp.asarray(rng.randn(3, 3, 3, ci, co).astype(np.float32))
        sc = jnp.asarray(rng.rand(co).astype(np.float32), dtype)
        sh = jnp.asarray(rng.rand(co).astype(np.float32), dtype)

        def layer(x, k, sc, sh, s=s):
            return leaky(conv3x3x3(x, k.astype(dtype), s) * sc + sh)

        do, ho, wo = (d + s - 1) // s, h // s, w // s
        # kd-unrolled: one 2D conv ci -> 3*co on every input depth slice
        gf = 2 * 9 * ci * 3 * co * d * ho * wo * B / 1e9
        mem = mb_of((B, d, h, w, ci), (B, do, ho, wo, co))
        total += t(f"conv{i} s{s} C{ci}->{co}", layer, x, k, sc, sh,
                   gflop=gf, mb=mem)
        d, h, w = do, ho, wo
        x = jnp.asarray(rng.rand(B, d, h, w, co).astype(np.float32), dtype)
    for i, ci, co in [(7, 64, 32), (9, 32, 16), (11, 16, 8)]:
        k = jnp.asarray(rng.randn(3, 3, 3, ci, co).astype(np.float32))
        sc = jnp.asarray(rng.rand(co).astype(np.float32), dtype)
        sh = jnp.asarray(rng.rand(co).astype(np.float32), dtype)
        skip = jnp.asarray(rng.rand(B, 2 * d, 2 * h, 2 * w, co)
                           .astype(np.float32), dtype)

        def layer(x, k, sc, sh, skip):
            return skip + leaky(
                conv_transpose3x3x3_s2(x, k.astype(dtype)) * sc + sh)

        gf = 2 * 9 * ci * 3 * co * d * 2 * h * 2 * w * B / 1e9
        mem = mb_of((B, d, h, w, ci), 2 * (B, 2 * d, 2 * h, 2 * w, co))
        total += t(f"deconv{i} C{ci}->{co}", layer, x, k, sc, sh, skip,
                   gflop=gf, mb=mem)
        d, h, w = 2 * d, 2 * h, 2 * w
        x = jnp.asarray(rng.rand(B, d, h, w, co).astype(np.float32), dtype)
    k = jnp.asarray(rng.randn(3, 3, 3, 8, 1).astype(np.float32))

    def prob(x, k):
        return conv3x3x3(x, k.astype(dtype), 1) + jnp.float32(0.1)

    gf = 2 * 9 * 8 * 3 * D * H * W * B / 1e9
    total += t("prob 8->1", prob, x, k,
               gflop=gf, mb=mb_of((B, D, H, W, 8), (B, D, H, W, 1)))
    print(f"{'sum of layers':24s} {total * 1e3:7.2f} ms", flush=True)


def main():
    levels = sys.argv[1:] or ["0", "1", "2"]
    if "0" in levels:
        folded_level("L0", 8, 512, 640, 8)
    if "1" in levels:
        folded_level("L1", 32, 256, 320, 16)
    if "2" in levels:
        unfolded_level("L2", 48, 128, 160, 32)


if __name__ == "__main__":
    main()
