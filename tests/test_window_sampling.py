"""Windowed (shared strip-gather) plane-sweep sampling vs the quad path.

The quad path is itself pinned against torch grid_sample oracles
(test_grid_sample.py), so fp-level equivalence to it pins the window path
transitively. Exactness conditions: a depth-group's sample span must fit
the window (ops/plane_sweep.py::_window_view); all scenes here except the
explicit violation test satisfy that, as real cascade fine levels do by
construction (sub-pixel hypothesis spacing).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import bcv as _bcv, bcv_grad as _bcv_grad
from casmvsnet_pl_tpu.ops.plane_sweep import build_cost_volume, window_config

pytestmark = pytest.mark.slow  # full-model tier: minutes of CPU compile


def _scene(rng, B=2, V=3, H=32, W=40, C=8, D=8, tx=40.0, ty=12.0,
           dmin=430.0, dint=2.65):
    feats = jnp.asarray(rng.rand(B, V, H, W, C).astype(np.float32))
    proj = np.tile(np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32),
                   (B, V - 1, 1, 1))
    proj[..., 0, 3] = tx
    proj[..., 1, 3] = ty
    dv = jnp.asarray(
        (dmin + dint * np.arange(D, dtype=np.float32))[None, :, None, None]
        * np.ones((B, D, H, W), np.float32))
    return feats, jnp.asarray(proj), dv


def test_window_config_feasibility():
    assert window_config(8, 8) == {"strip_w": 16, "window_h": 4,
                                   "depth_group": 8}
    assert window_config(8, 32)["depth_group"] == 8
    assert window_config(16, 32) is None          # 16*16 lanes > 128
    assert window_config(8, 12) is None           # 12 % 8 != 0


def test_variance_window_matches_quad():
    feats, proj, dv = _scene(np.random.RandomState(0))
    q = _bcv(feats, proj, dv, sampling="quad")
    w = _bcv(feats, proj, dv, sampling="window")
    np.testing.assert_allclose(np.asarray(q), np.asarray(w), atol=2e-6)


def test_groupwise_window_matches_quad():
    feats, proj, dv = _scene(np.random.RandomState(1))
    q = _bcv(feats, proj, dv, groups=4, sampling="quad")
    w = _bcv(feats, proj, dv, groups=4, sampling="window")
    np.testing.assert_allclose(np.asarray(q), np.asarray(w), atol=2e-6)


def test_window_multi_group_depths():
    # D=16 -> two depth groups of 8 sharing separate windows
    feats, proj, dv = _scene(np.random.RandomState(2), D=16)
    q = _bcv(feats, proj, dv, sampling="quad")
    w = _bcv(feats, proj, dv, sampling="window")
    np.testing.assert_allclose(np.asarray(q), np.asarray(w), atol=2e-6)


def test_window_out_of_image_zeros_padding():
    feats, proj, dv = _scene(np.random.RandomState(3), tx=9000.0, ty=-4000.0)
    q = _bcv(feats, proj, dv, sampling="quad")
    w = _bcv(feats, proj, dv, sampling="window")
    np.testing.assert_allclose(np.asarray(q), np.asarray(w), atol=2e-6)


def test_window_negative_depth_masked():
    feats, proj, dv = _scene(np.random.RandomState(4))
    dv = dv - 500.0                                # some planes behind camera
    q = _bcv(feats, proj, dv, sampling="quad")
    w = _bcv(feats, proj, dv, sampling="window")
    np.testing.assert_allclose(np.asarray(q), np.asarray(w), atol=2e-6)


def test_window_gradients_match_quad():
    feats, proj, dv = _scene(np.random.RandomState(5), B=1, H=16, W=24)

    gq = _bcv_grad(feats, proj, dv, sampling="quad")
    gw = _bcv_grad(feats, proj, dv, sampling="window")
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gw), atol=2e-6)


def test_window_span_violation_bounded():
    # Absurd baseline-to-depth ratio: per-step displacement ~6 px, group
    # span far beyond the window. The sampler must stay finite and deviate
    # only locally (clamped to the window edge), never explode.
    feats, proj, dv = _scene(np.random.RandomState(6), tx=900.0, ty=0.0,
                             dmin=30.0, dint=8.0)
    q = _bcv(feats, proj, dv, sampling="quad")
    w = _bcv(feats, proj, dv, sampling="window")
    assert bool(jnp.all(jnp.isfinite(w)))
    d = np.abs(np.asarray(q) - np.asarray(w))
    assert d.max() < 1.0                  # bounded by feature magnitude
    assert (d > 1e-3).mean() < 0.10       # deviation is local, not global


def test_window_infeasible_falls_back_to_quad():
    # C=16 exceeds the 128-lane strip budget: "window" silently uses quad
    # so the mode can be requested model-wide (e.g. for training).
    feats, proj, dv = _scene(np.random.RandomState(7), C=16)
    q = _bcv(feats, proj, dv, sampling="quad")
    w = _bcv(feats, proj, dv, sampling="window")
    np.testing.assert_allclose(np.asarray(q), np.asarray(w), atol=0)
    with pytest.raises(ValueError):
        build_cost_volume(feats, proj, dv, remat=False, sampling="bogus")


def test_block_sampling_matches_quad_exactly(monkeypatch):
    """Aligned-block tables (auto mode at large resolutions) are exact for
    ANY geometry — unlike windows there is no span condition."""
    from casmvsnet_pl_tpu.ops import plane_sweep as ps
    monkeypatch.setattr(ps, "_ROW_THRESH", 500)   # force block at test size
    for C, groups, tx in [(8, 1, 40.0), (16, 1, 40.0), (8, 4, 40.0),
                          (8, 1, 9000.0)]:        # incl. out-of-image
        feats, proj, dv = _scene(np.random.RandomState(11), C=C, tx=tx)
        a = ps.block_align(C, 32, 40)
        assert a > 1
        q = ps.build_cost_volume(feats, proj, dv, groups=groups,
                                 remat=False, sampling="quad")
        b = ps.build_cost_volume(feats, proj, dv, groups=groups,
                                 remat=False, sampling="auto")
        np.testing.assert_allclose(np.asarray(q), np.asarray(b), atol=3e-6)


def test_block_sampling_gradients(monkeypatch):
    from casmvsnet_pl_tpu.ops import plane_sweep as ps
    monkeypatch.setattr(ps, "_ROW_THRESH", 500)
    feats, proj, dv = _scene(np.random.RandomState(12), B=1, H=16, W=24)

    def loss(f, sampling):
        return jnp.sum(ps.build_cost_volume(f, proj, dv, remat=False,
                                            sampling=sampling) ** 2)

    gq = jax.grad(lambda f: loss(f, "quad"))(feats)
    gb = jax.grad(lambda f: loss(f, "auto"))(feats)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gb), atol=2e-6)


def test_block_align_policy():
    from casmvsnet_pl_tpu.ops.plane_sweep import block_align
    # training resolution: quad tables are in the fast regime
    assert block_align(8, 512, 640) == 1
    assert block_align(16, 256, 320) == 1
    # DTU eval resolution: level-0/1 tables fall off the cliff -> 128-lane
    assert block_align(8, 864, 1152) == 7
    assert block_align(16, 432, 576) == 3
    assert block_align(32, 216, 288) == 1     # lanes infeasible, stays quad
    # f32 doubles the table bytes: a level that is quad-fast in bf16 can
    # exceed the byte budget in f32 and must pack (ADVICE r1)
    assert block_align(16, 256, 320, itemsize=2) == 1
    assert block_align(16, 512, 320, itemsize=4) == 3
    assert block_align(16, 512, 320, itemsize=2) == 1


def test_cascade_auto_sampling_runs():
    from casmvsnet_pl_tpu.models import CascadeMVSNet
    rng = np.random.RandomState(8)
    B, V, H, W = 1, 3, 32, 32
    imgs = jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32))
    proj = np.tile(np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32),
                   (B, V - 1, 3, 1, 1))
    proj[..., 0, 3] = 10.0
    model = CascadeMVSNet(sampling="auto")
    out = jax.jit(model.init_with_output)(jax.random.PRNGKey(0), imgs,
                                          jnp.asarray(proj), 425.0, 2.65)[0]
    assert out["depth_0"].shape == (B, H, W)
    assert bool(jnp.all(jnp.isfinite(out["depth_0"])))
