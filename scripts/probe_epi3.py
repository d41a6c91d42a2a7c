"""Tune the variance-epilogue kernel: tile size, vmem limit, dim semantics."""
from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kernel_cost_epilogue import _taps
from casmvsnet_pl_tpu.utils.devtime import device_time

print("backend:", jax.default_backend(), flush=True)
dtype = jnp.bfloat16
rng = np.random.RandomState(0)


def t(label, fn, *a, iters=12):
    try:
        dt = device_time(fn, *a, iters=iters)
        print(f"{label:52s} {dt * 1e3:8.2f} ms", flush=True)
        return dt
    except Exception as e:
        print(f"{label:52s} FAIL {str(e).splitlines()[0][:90]}", flush=True)
        return None


def var_kernel(ref_ref, r0, r1, w0, w1, out_ref, *, C):
    ref = ref_ref[0].astype(jnp.float32)
    s = ref
    sq = ref * ref
    for rr, wr in ((r0, w0), (r1, w1)):
        o = _taps(rr[0, 0], wr[0, 0], C)
        s = s + o
        sq = sq + o * o
    m = s / 3.0
    out_ref[0, 0] = (sq / 3.0 - m * m).astype(out_ref.dtype)


def make_var(T, vmem_mb=None, dimsem=None):
    def fn(ref, r0, r1, w0, w1):
        B, D, hw, C4 = r0.shape
        C = C4 // 4
        params = {}
        kw = {}
        if vmem_mb or dimsem:
            try:
                if vmem_mb:
                    params["vmem_limit_bytes"] = vmem_mb * 1024 * 1024
                if dimsem:
                    params["dimension_semantics"] = dimsem
                kw["compiler_params"] = pltpu.CompilerParams(**params)
            except TypeError as e:
                print("CompilerParams unsupported:", e, flush=True)
        out = pl.pallas_call(
            functools.partial(var_kernel, C=C),
            grid=(B, hw // T, D),
            in_specs=[pl.BlockSpec((1, T, C), lambda b, p, d: (b, p, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec((1, 1, T, 4 * C), lambda b, p, d: (b, d, p, 0),
                            memory_space=pltpu.VMEM)] * 2
            + [pl.BlockSpec((1, 1, T, 4), lambda b, p, d: (b, d, p, 0),
                            memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((1, 1, T, C), lambda b, p, d: (b, d, p, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, D, hw, C), dtype),
            **kw,
        )(ref, r0, r1, w0, w1)
        return jnp.sum(out.astype(jnp.float32))
    return fn


def copy_kernel(r0, out_ref):
    out_ref[0, 0] = r0[0, 0][:, :out_ref.shape[-1]]


def make_copy(T):
    def fn(r0):
        B, D, hw, C4 = r0.shape
        C = C4 // 4
        out = pl.pallas_call(
            copy_kernel,
            grid=(B, hw // T, D),
            in_specs=[pl.BlockSpec((1, 1, T, 4 * C),
                                   lambda b, p, d: (b, d, p, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, T, C), lambda b, p, d: (b, d, p, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, D, hw, C), dtype),
        )(r0)
        return jnp.sum(out.astype(jnp.float32))
    return fn


# L1 config
B, D, h, w, C = 2, 32, 256, 320, 16
hw = h * w
rows = tuple(jnp.asarray(rng.randn(B, D, hw, 4 * C).astype(np.float32))
             .astype(dtype) for _ in range(2))
ws = tuple(jnp.asarray(rng.rand(B, D, hw, 4).astype(np.float32))
           for _ in range(2))
ref = jnp.asarray(rng.randn(B, hw, C).astype(np.float32)).astype(dtype)

t("L1 copy-kernel T=1024 (step-overhead floor)", make_copy(1024), rows[0])
t("L1 copy-kernel T=8192", make_copy(8192), rows[0])
t("L1 var T=1024 (baseline)", make_var(1024), ref, *rows, *ws)
t("L1 var T=4096", make_var(4096), ref, *rows, *ws)
t("L1 var T=4096 vmem=64MB", make_var(4096, vmem_mb=64), ref, *rows, *ws)
t("L1 var T=8192 vmem=100MB", make_var(8192, vmem_mb=100), ref, *rows, *ws)
t("L1 var T=4096 parallel dims", make_var(
    4096, vmem_mb=64, dimsem=("parallel", "parallel", "arbitrary")),
  ref, *rows, *ws)
t("L1 var T=16384 vmem=100MB", make_var(16384, vmem_mb=100), ref, *rows, *ws)
print("done", flush=True)
