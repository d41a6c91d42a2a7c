"""Probe: close the chunked-batch gap to B=1 parity (round-5 task 1).

probe_chunked measured B=4 chunked(c=1) at 148 ms vs the 4x B=1 bound of
136.6 — ~4 ms/iter of overhead beyond the batched-feature savings. Two
candidate mechanisms, two variants:

  fullscan  lax.map of the ENTIRE forward (feature inside the body): the
            body is exactly the B=1 graph. If this also pays +4 ms/iter,
            the overhead is intrinsic to scan lowering (layout
            conservatism), not the features handoff.
  unroll    python loop over chunks inside one jit, results concatenated:
            no scan — XLA sees nc independent B=1 pipelines and may
            pipeline them (gather engine of chunk k+1 under the MXU work
            of chunk k), at the cost of nc x compile size.

Usage: python scripts/probe_chunked2.py [batches...]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

from casmvsnet_pl_tpu.models import CascadeMVSNet
from casmvsnet_pl_tpu.utils import init_on_cpu
from casmvsnet_pl_tpu.utils.devtime import device_time


def main():
    H, W, V = 512, 640, 3
    batches = [int(a) for a in sys.argv[1:]] or [4, 8]
    from bench import make_inputs
    dtype = jnp.bfloat16
    model = CascadeMVSNet(dtype=dtype, remat=False)
    imgs1, proj1 = make_inputs(1, H, W, V)
    variables = init_on_cpu(model, jax.random.PRNGKey(0),
                            imgs1[:1, :, :64, :64], proj1[:1], 425.0, 2.65)

    def one(im, pr):
        o = model.apply(variables, im, pr, 425.0, 2.65)
        return o["depth_0"], o["confidence_2"]

    def fullscan(imgs, proj):
        d, c = jax.lax.map(lambda x: one(*x),
                           (imgs[:, None], proj[:, None]))
        return d.reshape((-1,) + d.shape[2:]), c.reshape((-1,) + c.shape[2:])

    def unroll(imgs, proj):
        outs = [one(imgs[i:i + 1], proj[i:i + 1])
                for i in range(imgs.shape[0])]
        return (jnp.concatenate([o[0] for o in outs]),
                jnp.concatenate([o[1] for o in outs]))

    for batch in batches:
        imgs_np, proj_np = make_inputs(batch, H, W, V)
        imgs, proj = jnp.asarray(imgs_np), jnp.asarray(proj_np)
        for name, fn in (("fullscan", fullscan), ("unroll", unroll)):
            dt = device_time(fn, imgs, proj, iters=12)
            print(f"B={batch} {name:9s} {dt * 1e3:8.2f} ms  "
                  f"{batch / dt:6.2f} maps/s", flush=True)


if __name__ == "__main__":
    main()
