"""D-folded CostRegNet must be exactly interchangeable with the unfolded
one (same params, same outputs, same batch-stat updates)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from casmvsnet_pl_tpu.models.cost_reg import CostRegNet, CostRegNetFolded
from casmvsnet_pl_tpu.ops.conv3d import (conv3x3x3, conv3x3x3_folded,
                                         conv_transpose3x3x3_s2,
                                         conv_transpose3x3x3_s2_folded,
                                         fold_volume, unfold_volume)

pytestmark = pytest.mark.slow  # full-model tier: minutes of CPU compile


@pytest.mark.parametrize("stride", [1, 2])
def test_folded_conv_matches_unfolded(stride):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 10, 12, 5).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 5, 7).astype(np.float32)) * 0.1
    ref = conv3x3x3(x, k, stride)
    got = unfold_volume(conv3x3x3_folded(fold_volume(x), k, 8, stride),
                        (8 + stride - 1) // stride)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)


def test_folded_transpose_matches_unfolded():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 4, 6, 8, 6).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 6, 3).astype(np.float32)) * 0.1
    ref = conv_transpose3x3x3_s2(x, k)
    got = unfold_volume(conv_transpose3x3x3_s2_folded(fold_volume(x), k, 4), 8)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)


def test_folded_costreg_interchangeable():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 16, 24, 8).astype(np.float32))
    ref_net, fold_net = CostRegNet(), CostRegNetFolded()
    var = jax.jit(ref_net.init)(jax.random.PRNGKey(0), x)
    # identical param trees (checkpoint interchangeability)
    v2 = jax.jit(fold_net.init)(jax.random.PRNGKey(1), x)
    assert (jax.tree.map(lambda a: a.shape, var["params"])
            == jax.tree.map(lambda a: a.shape, v2["params"]))
    # eval-mode outputs
    np.testing.assert_allclose(
        np.asarray(jax.jit(ref_net.apply, static_argnums=2)(var, x, False)),
        np.asarray(jax.jit(fold_net.apply, static_argnums=2)(var, x, False)),
        atol=1e-4)
    # train-mode outputs AND batch-stat updates
    ref_y, ref_mut = jax.jit(
        ref_net.apply, static_argnums=2,
        static_argnames="mutable")(var, x, True, mutable=("batch_stats",))
    fold_y, fold_mut = jax.jit(
        fold_net.apply, static_argnums=2,
        static_argnames="mutable")(var, x, True, mutable=("batch_stats",))
    np.testing.assert_allclose(np.asarray(ref_y), np.asarray(fold_y),
                               atol=1e-4)
    for a, b in zip(jax.tree.leaves(ref_mut["batch_stats"]),
                    jax.tree.leaves(fold_mut["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_folded_costreg_gradients_match():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 8, 16, 8).astype(np.float32))
    ref_net, fold_net = CostRegNet(), CostRegNetFolded()
    var = jax.jit(ref_net.init)(jax.random.PRNGKey(0), x)

    def loss(net, params):
        y, _ = net.apply({"params": params,
                          "batch_stats": var["batch_stats"]},
                         x, True, mutable=["batch_stats"])
        return jnp.sum(y ** 2)

    g_ref = jax.jit(jax.grad(lambda p: loss(ref_net, p)))(var["params"])
    g_fold = jax.jit(jax.grad(lambda p: loss(fold_net, p)))(var["params"])
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fold)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12)
        # f32 accumulation-order noise between the two lowerings; measured
        # up to ~1.3e-3 depending on XLA:CPU scheduling (a genuine folding
        # bug shows up as O(1) relative error here).
        assert rel < 5e-3, rel
