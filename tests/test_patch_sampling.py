"""Patch-shared plane-sweep sampling vs the quad path.

The quad path is pinned against torch grid_sample oracles
(test_grid_sample.py), so fp-level equivalence to it pins the patch path
transitively. Unlike window sampling, patch sampling must be exact for ANY
geometry: group sizes whose coordinate spans overflow the 4x4 patch fall
back through nested lax.cond to smaller groups and finally to the exact
quad path (ops/plane_sweep.py::_patch_view) — so every test here demands
equality, including the deliberately absurd-baseline one.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from casmvsnet_pl_tpu.ops import plane_sweep as ps
from casmvsnet_pl_tpu.ops.plane_sweep import build_cost_volume, patch_config

pytestmark = pytest.mark.slow  # full-model tier: minutes of CPU compile


from conftest import bcv as _bcv, bcv_grad as _bcv_grad


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


def test_patch_config_feasibility():
    assert patch_config(8, 8) == {"ph": 4, "pw": 4, "groups": (8, 4),
                                  "split": 1}
    assert patch_config(8, 32) == {"ph": 4, "pw": 4, "groups": (16, 8, 4),
                                   "split": 1}
    assert patch_config(8, 12)["groups"] == (4,)   # 12 % 8 != 0
    assert patch_config(16, 32)["split"] == 2      # two 128-lane half-tables
    assert patch_config(32, 48)["split"] == 4      # four 128-lane sub-tables
    assert patch_config(64, 48) is None            # would need an 8-way split
    assert patch_config(8, 6) is None              # no feasible group size


def test_variance_patch_matches_quad():
    # translation-only geometry: per-depth shift tx*(1/d_i - 1/d_j) is
    # sub-pixel across the whole window -> the g=8 patch branch engages
    feats, proj, dv = _scene(np.random.RandomState(0))
    q = _bcv(feats, proj, dv, sampling="quad")
    p = _bcv(feats, proj, dv, sampling="patch")
    np.testing.assert_allclose(np.asarray(q), np.asarray(p), atol=2e-6)


def test_groupwise_patch_matches_quad():
    feats, proj, dv = _scene(np.random.RandomState(1))
    q = _bcv(feats, proj, dv, groups=4, sampling="quad")
    p = _bcv(feats, proj, dv, groups=4, sampling="patch")
    np.testing.assert_allclose(np.asarray(q), np.asarray(p), atol=2e-6)


def test_patch_multi_group_depths():
    feats, proj, dv = _scene(np.random.RandomState(2), D=16)
    q = _bcv(feats, proj, dv, sampling="quad")
    p = _bcv(feats, proj, dv, sampling="patch")
    np.testing.assert_allclose(np.asarray(q), np.asarray(p), atol=2e-6)


def test_patch_out_of_image_zeros_padding():
    feats, proj, dv = _scene(np.random.RandomState(3), tx=9000.0, ty=-4000.0)
    q = _bcv(feats, proj, dv, sampling="quad")
    p = _bcv(feats, proj, dv, sampling="patch")
    np.testing.assert_allclose(np.asarray(q), np.asarray(p), atol=2e-6)


def test_patch_border_straddling_coords():
    # moderate shift: many supports straddle the image border (partial taps)
    feats, proj, dv = _scene(np.random.RandomState(9), tx=-12000.0, ty=300.0)
    q = _bcv(feats, proj, dv, sampling="quad")
    p = _bcv(feats, proj, dv, sampling="patch")
    np.testing.assert_allclose(np.asarray(q), np.asarray(p), atol=2e-6)


def test_patch_negative_depth_masked():
    feats, proj, dv = _scene(np.random.RandomState(4))
    dv = dv - 500.0                                # some planes behind camera
    q = _bcv(feats, proj, dv, sampling="quad")
    p = _bcv(feats, proj, dv, sampling="patch")
    np.testing.assert_allclose(np.asarray(q), np.asarray(p), atol=2e-6)


def test_patch_span_violation_still_exact():
    # Absurd baseline-to-depth ratio: per-step displacement ~6 px, far beyond
    # any 4x4 patch. The nested cond must fall back (g=8 -> g=4 -> quad) and
    # the result must remain EXACT — the defining contrast with window mode.
    feats, proj, dv = _scene(np.random.RandomState(6), tx=900.0, ty=0.0,
                             dmin=30.0, dint=8.0)
    q = _bcv(feats, proj, dv, sampling="quad")
    p = _bcv(feats, proj, dv, sampling="patch")
    np.testing.assert_allclose(np.asarray(q), np.asarray(p), atol=2e-6)


def test_patch_intermediate_span_uses_smaller_group():
    # per-step shift ~0.45 px: a g=8 group spans ~3.2 px (> pw-1 won't fit
    # ... actually 4x4 fits spans <= 3), g=4 spans ~1.4 px -> fits. Either
    # way the contract is exactness; this pins the mid-tier geometry.
    feats, proj, dv = _scene(np.random.RandomState(7), tx=900.0, ty=0.0,
                             dmin=420.0, dint=4.0)
    q = _bcv(feats, proj, dv, sampling="quad")
    p = _bcv(feats, proj, dv, sampling="patch")
    np.testing.assert_allclose(np.asarray(q), np.asarray(p), atol=2e-6)


def test_patch_gradients_match_quad():
    feats, proj, dv = _scene(np.random.RandomState(5), B=1, H=16, W=24)

    gq = _bcv_grad(feats, proj, dv, sampling="quad")
    gp = _bcv_grad(feats, proj, dv, sampling="patch")
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gp), atol=2e-6)


def test_patch_gradients_on_fallback_geometry():
    feats, proj, dv = _scene(np.random.RandomState(8), B=1, H=16, W=24,
                             tx=900.0, dmin=30.0, dint=8.0)
    gq = _bcv_grad(feats, proj, dv, sampling="quad")
    gp = _bcv_grad(feats, proj, dv, sampling="patch")
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gp), atol=2e-6)


def test_patch_banded_backward_matches_quad(monkeypatch):
    # force the banded-scatter backward inside the patch branch (at real
    # train-res the 333K-row patch table engages it; test tables are tiny,
    # so substitute a small band config) and pin gradients against quad
    monkeypatch.setattr(ps, "banded_cfg",
                        lambda Hq, Wq, D, H, W: (8, 16, 1))
    feats, proj, dv = _scene(np.random.RandomState(13), B=1, H=16, W=24)

    def loss(f, sampling):
        return jnp.sum(build_cost_volume(f, proj, dv, remat=False,
                                         sampling=sampling) ** 2)

    gq = jax.grad(lambda f: loss(f, "quad"))(feats)
    gp = jax.grad(lambda f: loss(f, "patch"))(feats)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gp), atol=2e-6)


def test_patch_split_channel_matches_quad():
    # C=16 (cascade level 1): two 128-lane half-tables, one shared hat build
    feats, proj, dv = _scene(np.random.RandomState(10), C=16, D=16)
    q = _bcv(feats, proj, dv, sampling="quad")
    p = _bcv(feats, proj, dv, sampling="patch")
    np.testing.assert_allclose(np.asarray(q), np.asarray(p), atol=2e-6)


def test_patch_split_channel_gradients():
    feats, proj, dv = _scene(np.random.RandomState(14), B=1, H=16, W=24,
                             C=16)
    gq = _bcv_grad(feats, proj, dv, sampling="quad")
    gp = _bcv_grad(feats, proj, dv, sampling="patch")
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gp), atol=2e-6)


def test_patch_split_channel_fallback_geometry():
    # wild geometry: split-channel quad fallback must also be exact
    feats, proj, dv = _scene(np.random.RandomState(15), C=16, tx=900.0,
                             dmin=30.0, dint=8.0)
    q = _bcv(feats, proj, dv, sampling="quad")
    p = _bcv(feats, proj, dv, sampling="patch")
    np.testing.assert_allclose(np.asarray(q), np.asarray(p), atol=2e-6)


def test_patch_four_way_split_matches_quad():
    # C=32 (cascade level 2) runs as a 4-way channel split of 128-lane
    # patch sub-tables; must agree with the exact quad path.
    feats, proj, dv = _scene(np.random.RandomState(10), C=32)
    q = _bcv(feats, proj, dv, sampling="quad")
    p = _bcv(feats, proj, dv, sampling="patch")
    np.testing.assert_allclose(np.asarray(q), np.asarray(p), atol=2e-6)


def test_auto_prefers_patch_in_both_contexts():
    # With the transposed-layout epilogue kernel the patch forward beats
    # quad at every level and split factor (scripts/probe_epi5.py), so
    # "auto" picks patch wherever it is feasible and the table stays in
    # the gather fast regime (the former train-only gate is retired and
    # _resolve_sampling no longer takes a train flag).
    cfg = ps._resolve_sampling("auto", 16, 32, 256, 320, 2)
    assert cfg["mode"] == "patch" and cfg["split"] == 2
    assert ps._resolve_sampling("auto", 8, 8, 512, 640, 2)["mode"] == "patch"
    assert ps._resolve_sampling("auto", 32, 48, 128, 160, 2)["split"] == 4


def test_patch_table_row_guard(monkeypatch):
    # Past the gather row cliff the patch mode stays patch — the g-shared
    # gathers beat the block path even at the slow-regime row rate
    # (scripts/probe_blockT.py: 19.4 vs 33.6 ms/view at eval-res L0) — but
    # the unfit-geometry fallback switches from quad to the aligned-block
    # path (fb_align). Where blocks are infeasible (C=32: a_max=1) the mode
    # defers to quad rather than gather from a slow fallback table.
    monkeypatch.setattr(ps, "_ROW_THRESH", 500)
    cfg = ps._resolve_sampling("patch", 8, 8, 32, 40)
    assert cfg["mode"] == "patch" and cfg["fb_align"] == 7
    cfg = ps._resolve_sampling("patch", 32, 48, 32, 40)
    assert cfg["mode"] == "quad"


def test_patch_block_fallback_exact(monkeypatch):
    # eval-res L0 policy (fb_align > 0): the nested cond's unfit branch is
    # the aligned-block sampler instead of a past-the-cliff quad table.
    # Both the fitting (patch branch) and non-fitting (block branch)
    # geometries must match the exact quad path.
    monkeypatch.setattr(ps, "_ROW_THRESH", 500)
    for seed, kw in ((21, {}),                                # g=8 fits
                     (22, dict(tx=900.0, dmin=30.0, dint=8.0))):  # -> block
        feats, proj, dv = _scene(np.random.RandomState(seed), B=1, **kw)
        assert ps._resolve_sampling("patch", 8, 8, 32, 40)["fb_align"] == 7
        q = build_cost_volume(feats, proj, dv, remat=False, sampling="quad")
        p = build_cost_volume(feats, proj, dv, remat=False, sampling="patch")
        np.testing.assert_allclose(np.asarray(q), np.asarray(p), atol=2e-6)


def test_patch_block_fallback_gradients(monkeypatch):
    # The custom VJP runs quad_bwd for the fallback branch even when the
    # forward took block_fwd — both forwards are the same exact bilinear
    # sample, so the cotangent is identical math. Pin that claim.
    monkeypatch.setattr(ps, "_ROW_THRESH", 200)
    feats, proj, dv = _scene(np.random.RandomState(23), B=1, H=16, W=24,
                             tx=900.0, dmin=30.0, dint=8.0)

    def loss(f, sampling):
        return jnp.sum(build_cost_volume(f, proj, dv, remat=False,
                                         sampling=sampling) ** 2)

    gq = jax.grad(lambda f: loss(f, "quad"))(feats)
    gp = jax.grad(lambda f: loss(f, "patch"))(feats)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gp), atol=2e-6)


def test_cascade_patch_sampling_runs():
    from casmvsnet_pl_tpu.models import CascadeMVSNet
    rng = np.random.RandomState(11)
    B, V, H, W = 1, 3, 32, 32
    imgs = jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32))
    proj = np.tile(np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32),
                   (B, V - 1, 3, 1, 1))
    proj[..., 0, 3] = 10.0
    model = CascadeMVSNet(sampling="patch")
    out = jax.jit(model.init_with_output)(jax.random.PRNGKey(0), imgs,
                                          jnp.asarray(proj), 425.0, 2.65)[0]
    assert out["depth_0"].shape == (B, H, W)
    assert bool(jnp.all(jnp.isfinite(out["depth_0"])))
