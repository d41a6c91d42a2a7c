import numpy as np
import jax.numpy as jnp
import pytest

from casmvsnet_pl_tpu.ops import grid_sample, grid_sample_batched

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_grid_sample(feat_hwc, xy):
    """Oracle: torch grid_sample, bilinear/zeros/align_corners=True.

    feat_hwc: (H, W, C); xy: (N, 2) unnormalized pixel coords.
    """
    H, W, C = feat_hwc.shape
    t_feat = torch.from_numpy(feat_hwc).permute(2, 0, 1)[None]      # (1,C,H,W)
    gx = xy[:, 0] / ((W - 1) / 2) - 1
    gy = xy[:, 1] / ((H - 1) / 2) - 1
    grid = torch.from_numpy(np.stack([gx, gy], -1).astype(np.float32))
    grid = grid[None, :, None, :]                                   # (1,N,1,2)
    out = F.grid_sample(t_feat, grid, mode="bilinear",
                        padding_mode="zeros", align_corners=True)
    return out[0, :, :, 0].permute(1, 0).numpy()                    # (N, C)


def test_exact_pixel_centers():
    rng = np.random.RandomState(0)
    feat = rng.randn(4, 5, 3).astype(np.float32)
    gx, gy = np.meshgrid(np.arange(5), np.arange(4))
    xy = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)
    out = np.asarray(grid_sample(jnp.asarray(feat), jnp.asarray(xy)))
    assert np.allclose(out, feat.reshape(-1, 3), atol=1e-6)


def test_matches_torch_random_coords():
    rng = np.random.RandomState(1)
    H, W, C = 8, 11, 4
    feat = rng.randn(H, W, C).astype(np.float32)
    # coords spanning inside, boundary, and outside
    xy = np.concatenate([
        rng.uniform(-2, [W + 2, H + 2], size=(500, 2)),
        np.array([[0, 0], [W - 1, H - 1], [-0.5, -0.5], [W - 0.5, H - 0.5],
                  [W, H], [-1, 3.3]]),
    ]).astype(np.float32)
    out = np.asarray(grid_sample(jnp.asarray(feat), jnp.asarray(xy)))
    ref = _torch_grid_sample(feat, xy)
    assert np.allclose(out, ref, atol=1e-5)


def test_zeros_padding_partial_taps():
    # a coordinate 0.5px outside the left edge keeps half the border value
    feat = np.ones((4, 4, 1), np.float32)
    xy = np.array([[-0.5, 1.0], [1.0, -0.5], [3.5, 1.0]], np.float32)
    out = np.asarray(grid_sample(jnp.asarray(feat), jnp.asarray(xy)))
    assert np.allclose(out[:, 0], [0.5, 0.5, 0.5], atol=1e-6)


def test_far_outside_is_zero():
    feat = np.ones((4, 4, 2), np.float32)
    xy = np.array([[-10, -10], [100, 2], [2, 100]], np.float32)
    out = np.asarray(grid_sample(jnp.asarray(feat), jnp.asarray(xy)))
    assert np.allclose(out, 0.0)


def test_batched_and_nd_coords():
    rng = np.random.RandomState(2)
    B, H, W, C, D = 2, 6, 7, 3, 4
    feat = rng.randn(B, H, W, C).astype(np.float32)
    xy = rng.uniform(0, [W - 1, H - 1], size=(B, D, H, W, 2)).astype(np.float32)
    out = np.asarray(grid_sample_batched(jnp.asarray(feat), jnp.asarray(xy)))
    assert out.shape == (B, D, H, W, C)
    for b in range(B):
        ref = _torch_grid_sample(feat[b], xy[b].reshape(-1, 2))
        assert np.allclose(out[b].reshape(-1, C), ref, atol=1e-5)


def test_quad_pack_matches_reference_sampler():
    """The packed-quad fast path (one 4C-wide row gather) must be exactly
    equivalent to the 4-tap grid_sample across in/out-of-bounds coords."""
    from casmvsnet_pl_tpu.ops.grid_sample import grid_sample_quad, pack_quad
    rng = np.random.RandomState(4)
    H, W, C = 13, 17, 8
    feat = rng.randn(H, W, C).astype(np.float32)
    xy = np.concatenate([
        rng.uniform(-3, [W + 3, H + 3], size=(2000, 2)),
        np.array([[W, H]] * 4),                    # negative-depth sentinel
        rng.uniform(-1e4, 1e4, size=(50, 2)),      # far outside
        np.array([[0, 0], [W - 1, H - 1], [-1, -1], [W - 0.5, H - 0.5]]),
    ]).astype(np.float32)
    a = np.asarray(grid_sample(jnp.asarray(feat), jnp.asarray(xy)))
    b = np.asarray(grid_sample_quad(pack_quad(jnp.asarray(feat)),
                                    jnp.asarray(xy), H, W))
    assert np.allclose(a, b, atol=1e-5)
    ref = _torch_grid_sample(feat, xy)
    assert np.allclose(b, ref, atol=1e-5)


def test_bfloat16_feature_path():
    rng = np.random.RandomState(3)
    feat = rng.randn(8, 8, 4).astype(np.float32)
    xy = rng.uniform(0, 7, size=(64, 2)).astype(np.float32)
    out_bf = np.asarray(grid_sample(jnp.asarray(feat, jnp.bfloat16),
                                    jnp.asarray(xy)).astype(jnp.float32))
    ref = _torch_grid_sample(feat, xy)
    assert np.allclose(out_bf, ref, atol=0.05)
