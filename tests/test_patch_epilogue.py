"""Unit tests for the transposed-layout patch epilogue kernels.

Pins the Pallas kernels (interpret mode on CPU) against the pure-XLA tfma
path, and tfma against a dense einsum oracle built from explicit hat
weights — the contraction both implement:
    out[j, c, p] = sum_k hat(fx[j,p]-dx_k) hat(fy[j,p]-dy_k) rowsT[kCh+c, p]
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from casmvsnet_pl_tpu.kernels import patch_epilogue as pe


def _inputs(rng, B=1, ng=2, g=8, ph=4, pw=4, Ch=8, hw=256):
    L = ph * pw * Ch
    rowsT = jnp.asarray(rng.randn(B, ng, L, hw).astype(np.float32))
    fx = jnp.asarray(
        rng.uniform(-0.2, pw - 0.8, (B, ng, g, hw)).astype(np.float32))
    fy = jnp.asarray(
        rng.uniform(-0.2, ph - 0.8, (B, ng, g, hw)).astype(np.float32))
    # sprinkle validfolded samples (fx = -9 -> all-zero weights)
    mask = rng.rand(B, ng, g, hw) < 0.1
    fx = jnp.where(jnp.asarray(mask), -9.0, fx)
    return rowsT, fx, fy


def _dense_weights(fx, fy, ph, pw):
    """(B, ng, g, hw, ph*pw) explicit hat weights."""
    ws = []
    for dy in range(ph):
        hy = jnp.maximum(0.0, 1.0 - jnp.abs(fy - dy))
        for dx in range(pw):
            hx = jnp.maximum(0.0, 1.0 - jnp.abs(fx - dx))
            ws.append(hx * hy)
    return jnp.stack(ws, axis=-1)


def test_tfma_fwd_matches_dense_oracle():
    rng = np.random.RandomState(0)
    rowsT, fx, fy = _inputs(rng)
    ph = pw = 4
    out = pe._tfma_fwd(rowsT, fx, fy, ph, pw)
    B, ng, L, hw = rowsT.shape
    Ch = L // (ph * pw)
    w = _dense_weights(fx, fy, ph, pw)                 # (B, ng, g, hw, K)
    r = rowsT.reshape(B, ng, ph * pw, Ch, hw)
    oracle = jnp.einsum("bngpk,bnkcp->bngcp", w, r)
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle),
                               atol=1e-5)


def test_pallas_fwd_matches_tfma():
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(1)
    rowsT, fx, fy = _inputs(rng)
    ref = pe._tfma_fwd(rowsT, fx, fy, 4, 4)
    with pltpu.force_tpu_interpret_mode():
        B, ng, L, hw = rowsT.shape
        g = fx.shape[2]
        Ch = L // 16
        fn = pe._pallas_fwd_call(4, 4, g, Ch, 128, B * ng, hw // 128,
                                 str(rowsT.dtype), "float32")
        out = fn(fx.reshape(B * ng, g, hw), fy.reshape(B * ng, g, hw),
                 rowsT.reshape(B * ng, L, hw)).reshape(ref.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_bwd_matches_tfma():
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(2)
    rowsT, fx, fy = _inputs(rng)
    B, ng, L, hw = rowsT.shape
    g = fx.shape[2]
    Ch = L // 16
    goT = jnp.asarray(rng.randn(B, ng, g, Ch, hw).astype(np.float32))
    ref = pe._tfma_bwd(goT, fx, fy, 4, 4)
    with pltpu.force_tpu_interpret_mode():
        fn = pe._pallas_bwd_call(4, 4, g, Ch, 128, B * ng, hw // 128)
        out = fn(fx.reshape(B * ng, g, hw), fy.reshape(B * ng, g, hw),
                 goT.reshape(B * ng, g, Ch, hw)).reshape(ref.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_bwd_is_adjoint_of_fwd():
    """<epilogue_fwd(r), go> == <r, epilogue_bwd(go)> for random tensors."""
    rng = np.random.RandomState(3)
    rowsT, fx, fy = _inputs(rng, hw=64)
    B, ng, L, hw = rowsT.shape
    g = fx.shape[2]
    Ch = L // 16
    goT = jnp.asarray(rng.randn(B, ng, g, Ch, hw).astype(np.float32))
    lhs = jnp.vdot(pe._tfma_fwd(rowsT, fx, fy, 4, 4), goT)
    rhs = jnp.vdot(rowsT, pe._tfma_bwd(goT, fx, fy, 4, 4))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-5)


def test_dispatch_odd_hw_uses_tfma():
    # hw not a multiple of 128 must fall back to the XLA path (no pallas
    # tiling) and still be correct on any backend
    rng = np.random.RandomState(4)
    rowsT, fx, fy = _inputs(rng, hw=96)
    out = pe.epilogue_fwd(rowsT, fx, fy, 4, 4)
    ref = pe._tfma_fwd(rowsT, fx, fy, 4, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)


def test_fwd_out_dtype_rounds_only():
    """out_dtype=bfloat16 must be the f32 result rounded, not a lower-
    precision accumulation (the kernel accumulates f32 in-register and
    casts only the store)."""
    rng = np.random.RandomState(3)
    rowsT, fx, fy = _inputs(rng)
    full = pe.epilogue_fwd(rowsT, fx, fy, 4, 4)
    assert full.dtype == jnp.float32
    half = pe.epilogue_fwd(rowsT, fx, fy, 4, 4, out_dtype=jnp.bfloat16)
    assert half.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(half, np.float32), np.asarray(full),
        rtol=1e-2, atol=1e-2)
