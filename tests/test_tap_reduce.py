"""Tests for the Pallas weighted-tap-reduce kernel (CPU = XLA fallback path;
on TPU the same API dispatches to the Pallas kernel — covered by the TPU
benches and by test_quad_pack_matches_reference_sampler running the full
sampler)."""
import jax
import jax.numpy as jnp
import numpy as np

from casmvsnet_pl_tpu.kernels.tap_reduce import (_xla_reduce,
                                                 weighted_tap_reduce)


def _data(N=1000, C=16, dtype=jnp.bfloat16, seed=0):
    rng = np.random.RandomState(seed)
    rows = jnp.asarray(rng.randn(N, 4 * C).astype(np.float32)).astype(dtype)
    w = jnp.asarray(rng.rand(4, N).astype(np.float32))
    return rows, w


def test_matches_reference_formulation():
    rows, w = _data()
    out = weighted_tap_reduce(rows, w, 16)
    ref = _xla_reduce(rows, w, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    assert out.dtype == jnp.float32


def test_grad_matches_reference():
    rows, w = _data(N=257, C=8, dtype=jnp.float32)

    def f(rows, w):
        return jnp.sum(weighted_tap_reduce(rows, w, 8) ** 2)

    def f_ref(rows, w):
        return jnp.sum(_xla_reduce(rows, w, 8) ** 2)

    g = jax.grad(f, argnums=(0, 1))(rows, w)
    g_ref = jax.grad(f_ref, argnums=(0, 1))(rows, w)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_non_tile_multiple_n():
    # N not a multiple of the kernel tile exercises the padding path
    rows, w = _data(N=1500, C=32)
    out = weighted_tap_reduce(rows, w, 32)
    ref = _xla_reduce(rows, w, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
