"""Pallas kernel: weighted 4-tap bilinear reduction of packed-quad rows.

The plane-sweep sampler gathers, per sample, one (4C,)-wide row holding the
2x2 bilinear support (ops/grid_sample.py pack_quad). The remaining work is
    out[n, c] = sum_q w[q][n] * rows[n, q*C + c]           (q = 4 taps)
which is trivially bandwidth-bound — XLA lowers the cross-lane-group
combination by materializing a TRANSPOSED f32[C, N] copy through a while
loop (~7.6 ms per 2.6M-sample view on v5e, seen in the compiled HLO).

STATUS: measured SLOWER than XLA's lowering end-to-end on v5e (the
N-on-sublanes rows vs per-sample-scalar weights layout mismatch forces
in-kernel transposes that cost more than XLA's single transposed copy), so
the sampler (ops/grid_sample.py) keeps the XLA slice formulation. Kept as
working, tested Pallas infrastructure with a custom VJP:

    d rows[n, q*C+c] = w[q][n] * g[n, c]
    d w[q][n]        = sum_c rows[n, q*C+c] * g[n, c]

On CPU (tests) the pure-XLA formulation is used — identical math.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_TILE = 1024  # rows per grid step; 1024 x 128 lanes fits VMEM comfortably


def _xla_reduce(rows: Array, w: Array, C: int) -> Array:
    """Reference formulation (used on CPU and as the oracle in tests)."""
    out = sum(rows[:, q * C:(q + 1) * C].astype(jnp.float32)
              * w[q][:, None] for q in range(4))
    return out


def _fwd_kernel(rows_ref, w_ref, out_ref, *, C: int):
    rows = rows_ref[...].astype(jnp.float32)            # (T, 4C)
    wt = w_ref[...].T                                   # (T, 4); tiny transpose
    acc = rows[:, 0:C] * wt[:, 0:1]
    for q in range(1, 4):
        acc += rows[:, q * C:(q + 1) * C] * wt[:, q:q + 1]
    out_ref[...] = acc


def _bwd_kernel(w_ref, rows_ref, g_ref, drows_ref, dw_ref, *, C: int):
    g = g_ref[...]                                      # (T, C) f32
    rows = rows_ref[...].astype(jnp.float32)            # (T, 4C)
    wt = w_ref[...].T                                   # (T, 4)
    parts = []
    dw_cols = []
    for q in range(4):
        parts.append(g * wt[:, q:q + 1])
        dw_cols.append(jnp.sum(rows[:, q * C:(q + 1) * C] * g, axis=1,
                               keepdims=True))          # (T, 1)
    drows_ref[...] = jnp.concatenate(parts, axis=1).astype(drows_ref.dtype)
    dw_ref[...] = jnp.concatenate(dw_cols, axis=1).T    # (4, T)


def _pad_rows(n: int) -> int:
    return (-n) % _TILE


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def weighted_tap_reduce(rows: Array, w: Array, C: int) -> Array:
    """out[n, c] = sum_q w[q, n] * rows[n, q*C+c], float32.

    rows: (N, 4C) any float dtype; w: (4, N) float32. Returns (N, C) f32.
    """
    return _forward(rows, w, C)


def _forward(rows: Array, w: Array, C: int) -> Array:
    if jax.default_backend() != "tpu":
        return _xla_reduce(rows, w, C)
    N = rows.shape[0]
    pad = _pad_rows(N)
    if pad:
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, pad)))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, C=C),
        grid=((N + pad) // _TILE,),
        in_specs=[
            pl.BlockSpec((_TILE, 4 * C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N + pad, C), jnp.float32),
    )(rows, w)
    return out[:N] if pad else out


def _vjp_fwd(rows: Array, w: Array, C: int):
    return _forward(rows, w, C), (rows, w)


def _vjp_bwd(C: int, res, g: Array):
    rows, w = res
    if jax.default_backend() != "tpu":
        drows = jnp.concatenate(
            [g * w[q][:, None] for q in range(4)], axis=1).astype(rows.dtype)
        dw = jnp.stack([
            jnp.sum(rows[:, q * C:(q + 1) * C].astype(jnp.float32) * g, axis=1)
            for q in range(4)])
        return drows, dw
    N = rows.shape[0]
    pad = _pad_rows(N)
    if pad:
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, pad)))
        g = jnp.pad(g, ((0, pad), (0, 0)))
    drows, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, C=C),
        grid=((N + pad) // _TILE,),
        in_specs=[
            pl.BlockSpec((4, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 4 * C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_TILE, 4 * C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N + pad, 4 * C), rows.dtype),
            jax.ShapeDtypeStruct((4, N + pad), jnp.float32),
        ),
    )(w, rows, g)
    if pad:
        drows, dw = drows[:N], dw[:, :N]
    return drows, dw


weighted_tap_reduce.defvjp(_vjp_fwd, _vjp_bwd)
