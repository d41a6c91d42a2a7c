"""Banded-scatter backward (ops/banded_take.py): exactness vs the default
jnp.take VJP, overflow fallback, invalid-sample robustness, and the policy.

These are the CPU pins for the warp-backward restructuring measured in
scripts/probe_scatter2.py (v5e: 8.8-9.2 ns/update banded vs ~17 ns
monolithic at level-0 train-res geometry).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from casmvsnet_pl_tpu.ops import plane_sweep
from casmvsnet_pl_tpu.ops.banded_take import banded_cfg, take_quad_banded

rng = np.random.RandomState(7)


def _mk_case(D=8, H=32, W=16, L=12, drift=3.0, wild_invalid=False):
    """Warp-like indices into an (Hq, Wq) table + weights zero on invalid."""
    Hq, Wq = H + 1, W + 1
    y = np.arange(H)[None, :, None]
    x = np.arange(W)[None, None, :]
    d = np.arange(D)[:, None, None]
    sy = np.clip(np.round(y + 0.05 * y + 0.3 * d + drift), 0, Hq - 1)
    sx = np.clip(np.round(x + 0.2 * d), 0, Wq - 1)
    idx = (sy * Wq + sx).astype(np.int32).reshape(1, -1)
    valid = rng.rand(1, D * H * W) > 0.1
    if wild_invalid:
        # invalid samples point anywhere in the table (clamped far coords)
        wild = rng.randint(0, Hq * Wq, size=idx.shape).astype(np.int32)
        idx = np.where(valid, idx, wild)
    tables = rng.randn(1, Hq, Wq, L).astype(np.float32)
    w = (rng.rand(1, D * H * W).astype(np.float32) + 0.5) * valid
    return (jnp.asarray(tables), jnp.asarray(idx), jnp.asarray(valid),
            jnp.asarray(w))


def _loss_banded(geom):
    def f(tables, idx, valid, w):
        rows = take_quad_banded(geom, tables, idx, valid)
        return jnp.sum(rows * w[..., None] * rows)
    return f


def _loss_plain(tables, idx, valid, w):
    B, Hq, Wq, L = tables.shape
    fidx = idx + (jnp.arange(B, dtype=jnp.int32) * (Hq * Wq))[:, None]
    rows = jnp.take(tables.reshape(B * Hq * Wq, L), fidx.reshape(-1),
                    axis=0).reshape(B, -1, L)
    return jnp.sum(rows * w[..., None] * rows)


@pytest.mark.parametrize("d_split", [1, 2])
def test_banded_grad_matches_default_vjp(d_split):
    tables, idx, valid, w = _mk_case()
    geom = (8, 32, 16, 8, 16, d_split)      # tile 8, band 16 rows
    g1 = jax.grad(_loss_banded(geom))(tables, idx, valid, w)
    g0 = jax.grad(_loss_plain)(tables, idx, valid, w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-5, atol=1e-5)


def test_banded_forward_matches_take():
    tables, idx, valid, w = _mk_case()
    geom = (8, 32, 16, 8, 16, 1)
    rows = take_quad_banded(geom, tables, idx, valid)
    B, Hq, Wq, L = tables.shape
    ref = jnp.take(tables.reshape(-1, L), idx.reshape(-1),
                   axis=0).reshape(B, -1, L)
    np.testing.assert_array_equal(np.asarray(rows), np.asarray(ref))


def test_overflow_falls_back_exactly():
    tables, idx, valid, w = _mk_case()
    # scramble VALID indices -> per-tile spans exceed any band
    scram = jnp.asarray(
        rng.permutation(np.asarray(idx).reshape(-1)).reshape(idx.shape))
    geom = (8, 32, 16, 8, 16, 1)
    g1 = jax.grad(_loss_banded(geom))(tables, scram, valid, w)
    g0 = jax.grad(_loss_plain)(tables, scram, valid, w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-5, atol=1e-5)


def test_invalid_samples_anywhere_stay_exact():
    """Invalid (zero-cotangent) samples may target arbitrary table rows —
    the band must clip them without tripping the fallback or corrupting
    the gradient (this is the out-of-image clamped-coordinate case)."""
    tables, idx, valid, w = _mk_case(wild_invalid=True)
    geom = (8, 32, 16, 8, 16, 1)
    g1 = jax.grad(_loss_banded(geom))(tables, idx, valid, w)
    g0 = jax.grad(_loss_plain)(tables, idx, valid, w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-5, atol=1e-5)


def test_batched_unfolded_path():
    """B=3 with a tiny fold limit forces the per-batch-element gather."""
    cases = [_mk_case() for _ in range(3)]
    tables = jnp.concatenate([c[0] for c in cases])
    idx = jnp.concatenate([c[1] for c in cases])
    valid = jnp.concatenate([c[2] for c in cases])
    w = jnp.concatenate([c[3] for c in cases])
    geom = (8, 32, 16, 8, 16, 1)
    g1 = jax.grad(_loss_banded(geom))(tables, idx, valid, w)
    g0 = jax.grad(_loss_plain)(tables, idx, valid, w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-5, atol=1e-5)


def test_policy_train_res():
    """Pins the round-3 tile-sweep policy (scripts/probe_scatter3.py)."""
    # quad tables (Hq = H+1): banding engages at every level; the largest
    # tile with 2x drift headroom wins (tr=64 at L2, 32 at L1, 16 at L0)
    assert banded_cfg(129, 161, 48, 128, 160) == (64, 129, 6)
    assert banded_cfg(257, 321, 32, 256, 320) == (32, 80, 4)
    assert banded_cfg(513, 641, 8, 512, 640) == (16, 40, 1)
    # patch tables (Ht = H+2, D = ng depth groups): L1/L2 band; L0's
    # single group (10K updates/tile vs 25.6K band targets) cannot
    # amortize the band read-modify-write -> monolithic scatter
    assert banded_cfg(130, 162, 6, 128, 160) == (64, 130, 1)
    assert banded_cfg(258, 322, 4, 256, 320) == (32, 80, 1)
    assert banded_cfg(514, 642, 1, 512, 640) is None
    # tiny test tables stay monolithic; thin bands (eval-res widths) too
    assert banded_cfg(65, 65, 8, 64, 64) is None
    assert banded_cfg(866, 1154, 8, 864, 1152) is None


def test_policy_env_gate(monkeypatch):
    monkeypatch.setenv("CASMVS_BANDED_BWD", "0")
    assert banded_cfg(513, 641, 8, 512, 640) is None


def test_cost_volume_grads_unchanged_by_banding(monkeypatch):
    """End-to-end: grads of the variance cost volume through the real warp
    are identical with banding on vs off at a size where banding engages
    (H=160, W=192 -> 161*193 = 31.1K table rows > 26K cliff)."""
    B, V, H, W, C, D = 1, 2, 160, 192, 4, 8
    feats = jnp.asarray(rng.randn(B, V, H, W, C).astype(np.float32))
    # near-identity homography with a small shift: valid warp, small drift
    pm = np.zeros((B, V - 1, 3, 4), np.float32)
    pm[:, :, 0, 0] = 1.0
    pm[:, :, 1, 1] = 1.0
    pm[:, :, 2, 2] = 1.0
    pm[:, :, 0, 3] = 30.0    # x shift proportional to 1/depth
    pm[:, :, 1, 3] = 12.0
    proj = jnp.asarray(pm)
    dv = jnp.broadcast_to(
        jnp.linspace(2.0, 3.0, D)[None, :, None, None], (B, D, H, W))

    def loss(f):
        vol = plane_sweep.batched_variance_cost_volume(f, proj, dv,
                                                       remat=False)
        return jnp.sum(vol ** 2)

    monkeypatch.setenv("CASMVS_BANDED_BWD", "1")
    g_on = jax.grad(loss)(feats)
    monkeypatch.setenv("CASMVS_BANDED_BWD", "0")
    g_off = jax.grad(loss)(feats)
    np.testing.assert_allclose(np.asarray(g_on), np.asarray(g_off),
                               rtol=2e-5, atol=2e-5)


# --- banded FORWARD gather (round 5: eval-res past-the-cliff tables) -------

def test_banded_gather_rows_matches_take():
    """Structured warp-like indices: banded == monolithic, any batch."""
    from casmvsnet_pl_tpu.ops.banded_take import banded_gather_rows
    ng, H, W, L = 2, 24, 16, 8
    Ht, Wt = H + 2, W + 2
    R = Ht * Wt
    for B in (1, 3):
        table = jnp.asarray(rng.randn(B, R, L).astype(np.float32))
        y = np.clip(np.arange(H)[:, None] + rng.randint(-2, 3, (H, W)),
                    0, Ht - 1)
        x = np.clip(np.arange(W)[None, :] + rng.randint(-2, 3, (H, W)),
                    0, Wt - 1)
        idx1 = (y * Wt + x).astype(np.int32).reshape(-1)
        idx = np.stack([np.concatenate([idx1] * ng)] * B)      # (B, ng*H*W)
        valid = rng.rand(B, ng * H * W) > 0.15
        got = banded_gather_rows(table, jnp.asarray(idx), jnp.asarray(valid),
                                 ng, H, W, Wt, 8, 16)
        ref = np.stack([np.asarray(table[b])[idx[b]] for b in range(B)])
        # only VALID rows are guaranteed; invalid rows feed zero weights
        v = valid[..., None]
        np.testing.assert_allclose(np.where(v, np.asarray(got), 0.0),
                                   np.where(v, ref, 0.0))


def test_banded_gather_rows_overflow_falls_back():
    """A tile whose valid rows span more than the band must fall back to
    the exact monolithic gather (lax.cond), not clamp."""
    from casmvsnet_pl_tpu.ops.banded_take import banded_gather_rows
    ng, H, W, L = 1, 16, 8, 4
    Ht, Wt = H + 2, W + 2
    R = Ht * Wt
    table = jnp.asarray(rng.randn(1, R, L).astype(np.float32))
    # every sample valid; indices alternate between top and bottom row
    # blocks -> no 4-row band can cover a tile
    y = np.where(np.arange(H * W) % 2 == 0, 0, Ht - 1)
    idx = (y * Wt + np.arange(H * W) % Wt).astype(np.int32)[None]
    valid = np.ones((1, H * W), bool)
    got = banded_gather_rows(table, jnp.asarray(idx), jnp.asarray(valid),
                             ng, H, W, Wt, 8, 4)
    ref = np.asarray(table[0])[idx[0]][None]
    np.testing.assert_allclose(np.asarray(got), ref)


def test_gather_band_cfg_policy():
    from casmvsnet_pl_tpu.ops.banded_take import gather_band_cfg
    # policy thresholds are v5e measurements: off-TPU the cfg returns
    # None unless force-enabled (the env doubles as the test hook)
    assert gather_band_cfg(866 * 1154, 1154, 864) is None
    os.environ["CASMVS_BANDED_GATHER"] = "1"
    try:
        # under the row budget: no banding (train-res tables monolithic)
        assert gather_band_cfg(514 * 642, 642, 512) is None
        # eval-res level 0: past the budget, 864 % 96 == 0 -> (96, 128)
        assert gather_band_cfg(866 * 1154, 1154, 864) == (96, 128)
        # eval-res level 1: wide (512 B) rows past the byte budget
        assert gather_band_cfg(434 * 578, 578, 432, 512) == (48, 96)
        # eval-res level 2: wide but small -> fast already, monolithic
        assert gather_band_cfg(218 * 290, 290, 216, 1024) is None
        # bench-res level 1: small split-2 table stays monolithic
        assert gather_band_cfg(258 * 322, 322, 256, 512) is None
        # short-but-wide: no band fits the table -> mono, not an assert
        assert gather_band_cfg(26 * 6402, 6402, 24, 512) is None
        # kill switch beats force
        os.environ["CASMVS_BANDED_GATHER"] = "0"
        assert gather_band_cfg(866 * 1154, 1154, 864) is None
    finally:
        del os.environ["CASMVS_BANDED_GATHER"]
