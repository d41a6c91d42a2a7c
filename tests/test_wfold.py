"""Width-folded 2D conv (ops/conv3d.py): exactness and fold policy.

Fast-tier pins for the TPU-only feature-net fast path (the model uses
the fold only when _on_tpu(); the op itself is backend-agnostic and is
pinned here against the plain lowering on CPU).
"""
import jax
import jax.numpy as jnp
import numpy as np

from casmvsnet_pl_tpu.ops.conv3d import conv2d_wfolded, wfold_factor

rng = np.random.RandomState(3)


def _plain(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_conv2d_wfolded_exact():
    for (H, W, Ci, Co, F) in [(16, 32, 8, 8, 4), (16, 32, 32, 8, 8),
                              (8, 16, 16, 16, 16), (12, 24, 3, 8, 4)]:
        x = jnp.asarray(rng.randn(2, H, W, Ci).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, Ci, Co).astype(np.float32))
        np.testing.assert_allclose(np.asarray(conv2d_wfolded(x, k, F)),
                                   np.asarray(_plain(x, k)),
                                   rtol=1e-5, atol=1e-5)


def test_conv2d_wfolded_gradients_match():
    x = jnp.asarray(rng.randn(1, 8, 16, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32))
    gx_f, gk_f = jax.grad(lambda x, k: jnp.sum(conv2d_wfolded(x, k, 4) ** 2),
                          argnums=(0, 1))(x, k)
    gx_p, gk_p = jax.grad(lambda x, k: jnp.sum(_plain(x, k) ** 2),
                          argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_p),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_f), np.asarray(gk_p),
                               rtol=1e-4, atol=1e-4)


def test_wfold_policy_cpu_off():
    # on CPU backends the model-level fold is disabled (pure loss there);
    # the policy helper reflects the current backend.
    assert jax.default_backend() != "tpu"
    assert wfold_factor(640, 32, 8) == 1


def test_conv3x3x3_wfolded_core_exact():
    """The width-folded stride-1 3D-conv core == the plain lowering."""
    from casmvsnet_pl_tpu.ops.conv3d import conv3x3x3
    x = jnp.asarray(rng.randn(1, 8, 8, 16, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 32, 8).astype(np.float32) * 0.1)
    plain = conv3x3x3(x, k, wfold=False)
    folded = conv3x3x3(x, k, wfold=True)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(plain),
                               rtol=1e-4, atol=1e-4)
    # gradients through the folded core
    gp = jax.grad(lambda x: jnp.sum(conv3x3x3(x, k, wfold=False) ** 2))(x)
    gf = jax.grad(lambda x: jnp.sum(conv3x3x3(x, k, wfold=True) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gp),
                               rtol=1e-3, atol=1e-3)
