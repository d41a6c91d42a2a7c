"""CPU pins for kernels/cost_epilogue.py (XLA formulation + custom VJPs).

The Pallas kernels themselves are off the production path (see the module's
STATUS header) and are validated on TPU by scripts/probe_epilogue.py; on CPU
the public entry points dispatch to the pure-XLA `_var_xla`/`_gw_xla`
fallback and the `_var_bwd_xla`/`_gw_bwd_xla` custom backward. These tests
pin both against an independent direct formulation (autodiff of a plain
einsum implementation) so the module cannot drift silently.

Behavioral parity targets: the reference's incremental variance aggregation
(/root/reference/models/mvsnet.py:139-168) and groupwise correlation
(/root/reference/models/mvsnet.py:157-171).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from casmvsnet_pl_tpu.kernels.cost_epilogue import (groupwise_epilogue,
                                                    variance_epilogue)

B, D, HW, C, NSRC = 2, 3, 20, 8, 2


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    ref = jnp.asarray(rng.randn(B, HW, C).astype(np.float32))
    rows = tuple(jnp.asarray(rng.randn(B, D, HW, 4 * C).astype(np.float32))
                 for _ in range(NSRC))
    ws = tuple(jnp.asarray(rng.rand(B, D, HW, 4).astype(np.float32))
               for _ in range(NSRC))
    return ref, rows, ws


def _taps_direct(rows_v, ws_v):
    r = rows_v.astype(jnp.float32).reshape(rows_v.shape[:-1] + (4, C))
    return jnp.einsum("bdhqc,bdhq->bdhc", r, ws_v)


def _var_direct(ref, rows, ws):
    vols = [jnp.broadcast_to(ref[:, None].astype(jnp.float32),
                             (B, D, HW, C))]
    vols += [_taps_direct(r, w) for r, w in zip(rows, ws)]
    stack = jnp.stack(vols)                      # (V, B, D, hw, C)
    return jnp.mean(stack ** 2, 0) - jnp.mean(stack, 0) ** 2


def _gw_direct(ref, rows, ws, groups):
    reff = ref[:, None].astype(jnp.float32)
    acc = 0.0
    for r, w in zip(rows, ws):
        prod = (_taps_direct(r, w) * reff).reshape(B, D, HW, groups,
                                                   C // groups)
        acc = acc + jnp.mean(prod, -1)
    return acc / len(rows)


def test_variance_forward_matches_direct():
    ref, rows, ws = _inputs()
    got = variance_epilogue(ref, rows, ws, jnp.float32)
    want = _var_direct(ref, rows, ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_variance_custom_vjp_matches_autodiff():
    ref, rows, ws = _inputs(1)
    cot = jnp.asarray(
        np.random.RandomState(7).randn(B, D, HW, C).astype(np.float32))

    def loss_pinned(ref, rows, ws):
        return jnp.sum(variance_epilogue(ref, rows, ws, jnp.float32) * cot)

    def loss_direct(ref, rows, ws):
        return jnp.sum(_var_direct(ref, rows, ws) * cot)

    got = jax.grad(loss_pinned, argnums=(0, 1, 2))(ref, rows, ws)
    want = jax.grad(loss_direct, argnums=(0, 1, 2))(ref, rows, ws)
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("groups", [2, 4])
def test_groupwise_forward_matches_direct(groups):
    ref, rows, ws = _inputs(2)
    got = groupwise_epilogue(ref, rows, ws, groups, jnp.float32)
    want = _gw_direct(ref, rows, ws, groups)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_groupwise_custom_vjp_matches_autodiff():
    groups = 4
    ref, rows, ws = _inputs(3)
    cot = jnp.asarray(
        np.random.RandomState(8).randn(B, D, HW, groups).astype(np.float32))

    def loss_pinned(ref, rows, ws):
        return jnp.sum(
            groupwise_epilogue(ref, rows, ws, groups, jnp.float32) * cot)

    def loss_direct(ref, rows, ws):
        return jnp.sum(_gw_direct(ref, rows, ws, groups) * cot)

    got = jax.grad(loss_pinned, argnums=(0, 1, 2))(ref, rows, ws)
    want = jax.grad(loss_direct, argnums=(0, 1, 2))(ref, rows, ws)
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-4)
