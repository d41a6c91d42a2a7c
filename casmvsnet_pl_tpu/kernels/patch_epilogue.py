"""Transposed-layout (pixel-lane) patch-sampling epilogue.

The patch sampler (ops/plane_sweep._patch_sample) gathers one ph x pw x C
patch row per GROUP of g consecutive depth hypotheses and extracts each
sample's bilinear value with hat weights. The original epilogue expands
hat weights to the (N, L=ph*pw*C) lane layout: every per-sample scalar
(fx, fy) broadcasts across 128 tap lanes and the output's C<=16 minor dim
occupies a fraction of a vreg — measured ~10-20x off the VPU bound
(PERF_NOTES.md, scripts/probe_patch2.py).

This module computes the same contraction in TRANSPOSED layout — pixels
on lanes, taps/channels on sublanes — so every op is a full-vreg FMA:

    out[j, c, p] = sum_k  w[j, k, p] * rowsT[k*Ch + c, p]
    w[j, k, p]   = hat(fx[j, p] - dx_k) * hat(fy[j, p] - dy_k)

(j: depth-in-group, c: channel, p: pixel, k = dy*pw + dx: patch tap.)
The k-sum unrolls into ph*pw FMAs of (g, Ch, T) blocks. Two
implementations with identical semantics:

  * a Pallas kernel tiled (T pixels) x (one group-row batch) — VERIFIED
    the fast path on v5e (scripts/probe_epi5.py);
  * a pure-XLA loop ("tfma") used on CPU / odd shapes / as oracle.

The backward contraction is symmetric and ships here too:

    d_rowsT[k*Ch + c, p] = sum_j  w[j, k, p] * goT[j, c, p]

Replaces the reference's F.grid_sample CUDA kernel epilogue
(/root/reference/models/modules.py:87-89) for the patch-shared sampler.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _pick_tile(hw: int) -> int | None:
    for t in (512, 256, 128):
        if hw % t == 0:
            return t
    return None


def _on_tpu() -> bool:
    """True when computations are placed on TPU right now.

    ``jax.default_backend()`` alone is wrong inside a
    ``jax.default_device(cpu_device)`` scope (used to keep eager model
    init off the slow axon tunnel): the process backend stays "tpu" but
    ops lower for CPU, where Mosaic kernels cannot compile.
    """
    dd = jax.config.jax_default_device
    if dd is not None:
        # jax_default_device may hold a Device object or a platform string.
        return getattr(dd, "platform", dd) == "tpu"
    return jax.default_backend() == "tpu"


def _use_pallas(hw: int) -> bool:
    return _on_tpu() and _pick_tile(hw) is not None


# ---------------------------------------------------------------------------
# Pure-XLA transposed FMA (CPU path / oracle / odd shapes)
# ---------------------------------------------------------------------------

def _tfma_fwd(rowsT: Array, fx: Array, fy: Array, ph: int, pw: int) -> Array:
    """rowsT (B, ng, L, hw) + fx/fy (B, ng, g, hw) -> (B, ng, g, Ch, hw)."""
    L = rowsT.shape[2]
    Ch = L // (ph * pw)
    g = fx.shape[2]
    B, ng, _, hw = fx.shape
    out = jnp.zeros((B, ng, g, Ch, hw), jnp.float32)
    for dy in range(ph):
        hy = jnp.maximum(0.0, 1.0 - jnp.abs(fy - float(dy)))
        for dx in range(pw):
            hx = jnp.maximum(0.0, 1.0 - jnp.abs(fx - float(dx)))
            w = (hx * hy)[:, :, :, None, :]
            k = dy * pw + dx
            r = rowsT[:, :, None, k * Ch:(k + 1) * Ch, :].astype(jnp.float32)
            out = out + w * r
    return out


def _tfma_bwd(goT: Array, fx: Array, fy: Array, ph: int, pw: int) -> Array:
    """goT (B, ng, g, Ch, hw) + fx/fy (B, ng, g, hw) -> (B, ng, L, hw) f32."""
    B, ng, g, Ch, hw = goT.shape
    parts = []
    for dy in range(ph):
        hy = jnp.maximum(0.0, 1.0 - jnp.abs(fy - float(dy)))
        for dx in range(pw):
            hx = jnp.maximum(0.0, 1.0 - jnp.abs(fx - float(dx)))
            w = (hx * hy)[:, :, :, None, :]                  # (B,ng,g,1,hw)
            parts.append(jnp.sum(w * goT, axis=2))           # (B,ng,Ch,hw)
    return jnp.concatenate(parts, axis=2)                    # (B,ng,L,hw)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def _pallas_fwd_call(ph, pw, g, Ch, T, n_i, n_t, dtype_str, out_dtype_str):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = ph * pw * Ch
    hw = n_t * T
    out_dtype = jnp.dtype(out_dtype_str)

    def kernel(fx_ref, fy_ref, rT_ref, o_ref):
        fx = fx_ref[0]                                        # (g, T)
        fy = fy_ref[0]
        acc = jnp.zeros((g, Ch, T), jnp.float32)
        for dy in range(ph):
            hy = jnp.maximum(0.0, 1.0 - jnp.abs(fy - float(dy)))
            for dx in range(pw):
                hx = jnp.maximum(0.0, 1.0 - jnp.abs(fx - float(dx)))
                w = (hx * hy)[:, None, :]                     # (g, 1, T)
                k = dy * pw + dx
                r = rT_ref[0, k * Ch:(k + 1) * Ch, :].astype(jnp.float32)
                acc = acc + w * r[None]
        # Accumulate f32 in-register; store in out_dtype. A bf16 store
        # halves the write traffic at the Pallas boundary (which always
        # materializes to HBM) — the batch>=2 regime is HBM-bound at a
        # measured ~450 GB/s stream rate (scripts/probe_hbm.py).
        o_ref[0] = acc.astype(out_dtype)

    return pl.pallas_call(
        kernel,
        grid=(n_i, n_t),
        in_specs=[
            pl.BlockSpec((1, g, T), lambda i, t: (i, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, T), lambda i, t: (i, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, T), lambda i, t: (i, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, Ch, T), lambda i, t: (i, 0, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_i, g, Ch, hw), out_dtype),
    )


@functools.lru_cache(maxsize=32)
def _pallas_bwd_call(ph, pw, g, Ch, T, n_i, n_t):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = ph * pw * Ch
    hw = n_t * T

    def kernel(fx_ref, fy_ref, go_ref, o_ref):
        fx = fx_ref[0]                                        # (g, T)
        fy = fy_ref[0]
        go = go_ref[0]                                        # (g, Ch, T)
        for dy in range(ph):
            hy = jnp.maximum(0.0, 1.0 - jnp.abs(fy - float(dy)))
            for dx in range(pw):
                hx = jnp.maximum(0.0, 1.0 - jnp.abs(fx - float(dx)))
                w = (hx * hy)[:, None, :]                     # (g, 1, T)
                k = dy * pw + dx
                o_ref[0, k * Ch:(k + 1) * Ch, :] = jnp.sum(w * go, axis=0)
        return

    return pl.pallas_call(
        kernel,
        grid=(n_i, n_t),
        in_specs=[
            pl.BlockSpec((1, g, T), lambda i, t: (i, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, T), lambda i, t: (i, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, Ch, T), lambda i, t: (i, 0, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, T), lambda i, t: (i, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_i, L, hw), jnp.float32),
    )


# ---------------------------------------------------------------------------
# Dispatchers
# ---------------------------------------------------------------------------

def epilogue_fwd(rowsT: Array, fx: Array, fy: Array, ph: int,
                 pw: int, out_dtype=None) -> Array:
    """Bilinear extraction of g samples per gathered patch row.

    rowsT: (B, ng, L, hw) patch rows, pixel-minor; fx/fy: (B, ng, g, hw)
    f32 validfolded patch-frame coords (invalid samples hold fx = -9).
    Returns (B, ng, g, Ch, hw) in ``out_dtype`` (default float32).
    Interpolation always accumulates in f32; ``out_dtype=bfloat16`` only
    rounds the stored result, halving the HBM write at the kernel
    boundary.
    """
    B, ng, L, hw = rowsT.shape
    g = fx.shape[2]
    Ch = L // (ph * pw)
    out_dtype = jnp.dtype(out_dtype) if out_dtype is not None else jnp.float32
    if not _use_pallas(hw):
        return _tfma_fwd(rowsT, fx, fy, ph, pw).astype(out_dtype)
    T = _pick_tile(hw)
    n_i = B * ng
    fn = _pallas_fwd_call(ph, pw, g, Ch, T, n_i, hw // T, str(rowsT.dtype),
                          str(out_dtype))
    o = fn(fx.reshape(n_i, g, hw), fy.reshape(n_i, g, hw),
           rowsT.reshape(n_i, L, hw))
    return o.reshape(B, ng, g, Ch, hw)


def epilogue_bwd(goT: Array, fx: Array, fy: Array, ph: int,
                 pw: int) -> Array:
    """Adjoint wrt rowsT: goT (B, ng, g, Ch, hw) f32 -> (B, ng, L, hw) f32.

    (The group sum over j happens inside — one output row per patch row.)
    """
    B, ng, g, Ch, hw = goT.shape
    if not _use_pallas(hw):
        return _tfma_bwd(goT, fx, fy, ph, pw)
    T = _pick_tile(hw)
    n_i = B * ng
    fn = _pallas_bwd_call(ph, pw, g, Ch, T, n_i, hw // T)
    o = fn(fx.reshape(n_i, g, hw), fy.reshape(n_i, g, hw),
           goT.reshape(n_i, g, Ch, hw))
    return o.reshape(B, ng, ph * pw * Ch, hw)
