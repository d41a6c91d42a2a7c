import numpy as np
import jax.numpy as jnp
import pytest

from casmvsnet_pl_tpu.ops import (depth_regression, get_depth_values,
                                  initial_depth_values, pixel_grid,
                                  project_to_src, resize_bilinear, upsample2x)


def test_pixel_grid_layout():
    g = np.asarray(pixel_grid(3, 4))
    assert g.shape == (3, 12)
    # raster order: x varies fastest
    assert np.allclose(g[0, :4], [0, 1, 2, 3])
    assert np.allclose(g[1, :4], [0, 0, 0, 0])
    assert np.allclose(g[1, 4:8], [1, 1, 1, 1])
    assert np.allclose(g[2], 1.0)


def test_project_identity_projection():
    # proj = [I | 0]: src coords = (x/1? no — z = 1 for every pixel) ->
    # q = (x, y, 1) + 0/d, so xy_src == xy_ref for any depth.
    H, W, D = 5, 7, 3
    proj = np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32)
    depths = np.full((D, H, W), 10.0, np.float32)
    xy = np.asarray(project_to_src(jnp.asarray(proj), jnp.asarray(depths), H, W))
    gx, gy = np.meshgrid(np.arange(W), np.arange(H))
    assert np.allclose(xy[..., 0], gx[None], atol=1e-5)
    assert np.allclose(xy[..., 1], gy[None], atol=1e-5)


def test_project_translation_scales_with_inverse_depth():
    # proj = [I | t], t = (a, b, 0): xy_src = xy_ref + (a, b)/d.
    H, W = 4, 6
    t = np.array([2.0, -3.0, 0.0], np.float32)
    proj = np.hstack([np.eye(3, dtype=np.float32), t[:, None]])
    depths = np.stack([np.full((H, W), 1.0), np.full((H, W), 2.0)]).astype(np.float32)
    xy = np.asarray(project_to_src(jnp.asarray(proj), jnp.asarray(depths), H, W))
    gx, gy = np.meshgrid(np.arange(W), np.arange(H))
    for d_idx, d in enumerate([1.0, 2.0]):
        assert np.allclose(xy[d_idx, ..., 0], gx + 2.0 / d, atol=1e-5)
        assert np.allclose(xy[d_idx, ..., 1], gy - 3.0 / d, atol=1e-5)


def test_project_random_vs_numpy_oracle():
    rng = np.random.RandomState(0)
    H, W, D = 6, 9, 4
    proj = rng.randn(3, 4).astype(np.float32)
    depths = (rng.rand(D, H, W).astype(np.float32) + 0.5) * 100
    xy = np.asarray(project_to_src(jnp.asarray(proj), jnp.asarray(depths), H, W))

    # independent float32 oracle (same precision as the op & the reference)
    gx, gy = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    p = np.stack([gx, gy, np.ones_like(gx)], 0).reshape(3, -1)   # (3, HW)
    R, T = proj[:, :3], proj[:, 3:]
    q = (R @ p)[:, None, :] + T[:, :, None] / depths.reshape(1, D, -1)
    z = q[2]
    behind = z <= 1e-7
    ox = np.where(behind, W, q[0] / np.where(behind, 1.0, z)).reshape(D, H, W)
    oy = np.where(behind, H, q[1] / np.where(behind, 1.0, z)).reshape(D, H, W)
    # skip pixels with small |z|: x/z amplifies f32 roundoff unboundedly there
    # (real camera projections have z ~ 1; this is a pure-math cross-check)
    ok = np.abs(z).reshape(D, H, W) > 0.3
    assert ok.mean() > 0.5  # the check must still cover most pixels
    # tolerances are loose: this guards the formula (errors there are O(1)+),
    # not f32 accumulation-order differences between XLA and numpy
    assert np.allclose(xy[..., 0][ok], ox[ok], rtol=1e-2, atol=0.1)
    assert np.allclose(xy[..., 1][ok], oy[ok], rtol=1e-2, atol=0.1)


def test_project_negative_depth_goes_outside():
    H, W = 3, 3
    # R = I, T = (0, 0, -100): z = 1 - 100/d < 0 for d < 100.
    proj = np.hstack([np.eye(3, dtype=np.float32),
                      np.array([[0], [0], [-100.0]], np.float32)])
    depths = np.full((1, H, W), 10.0, np.float32)
    xy = np.asarray(project_to_src(jnp.asarray(proj), jnp.asarray(depths), H, W))
    assert np.all(xy[..., 0] == W)
    assert np.all(xy[..., 1] == H)


def test_get_depth_values_window_and_clamp():
    B, H, W, D = 2, 2, 2, 4
    cur = np.full((B, H, W), 100.0, np.float32)
    vals = np.asarray(get_depth_values(jnp.asarray(cur), D, 2.0))
    assert vals.shape == (B, D, H, W)
    # window: min = 100 - 2*2 = 96; values 96, 98, 100, 102
    assert np.allclose(vals[0, :, 0, 0], [96, 98, 100, 102])
    # clamp at 1e-7
    cur2 = np.full((B, H, W), 1.0, np.float32)
    vals2 = np.asarray(get_depth_values(jnp.asarray(cur2), D, 2.0))
    assert np.allclose(vals2[0, 0], 1e-7)
    # per-sample interval
    vals3 = np.asarray(get_depth_values(jnp.asarray(cur), D,
                                        jnp.asarray([1.0, 2.0])))
    assert np.allclose(vals3[0, :, 0, 0], [98, 99, 100, 101])
    assert np.allclose(vals3[1, :, 0, 0], [96, 98, 100, 102])


def test_initial_depth_values():
    v = np.asarray(initial_depth_values(425.0, 10.6, 4, 2, 3, 3))
    assert v.shape == (2, 4, 3, 3)
    assert np.allclose(v[1, :, 2, 2], 425.0 + 10.6 * np.arange(4), rtol=1e-6)
    v2 = np.asarray(initial_depth_values(jnp.asarray([100.0, 200.0]),
                                         jnp.asarray([1.0, 2.0]), 3, 2, 2, 2))
    assert np.allclose(v2[0, :, 0, 0], [100, 101, 102])
    assert np.allclose(v2[1, :, 0, 0], [200, 202, 204])


def test_depth_regression_delta_and_uniform():
    B, D, H, W = 1, 5, 2, 2
    vals = np.arange(1, D + 1, dtype=np.float32)[None, :, None, None]
    vals = np.broadcast_to(vals, (B, D, H, W))
    p = np.zeros((B, D, H, W), np.float32)
    p[:, 2] = 1.0  # delta at index 2 -> depth = 3
    d = np.asarray(depth_regression(jnp.asarray(p), jnp.asarray(vals)))
    assert np.allclose(d, 3.0)
    p_uni = np.full((B, D, H, W), 1.0 / D, np.float32)
    d2 = np.asarray(depth_regression(jnp.asarray(p_uni), jnp.asarray(vals)))
    assert np.allclose(d2, 3.0)  # mean of 1..5
    # 1-D depth values broadcast
    d3 = np.asarray(depth_regression(jnp.asarray(p), jnp.arange(1.0, 6.0)))
    assert np.allclose(d3, 3.0)


def test_resize_bilinear_matches_torch_align_corners():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.RandomState(1)
    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    out = np.asarray(resize_bilinear(jnp.asarray(x), (10, 14)))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                        size=(10, 14), mode="bilinear",
                        align_corners=True).permute(0, 2, 3, 1).numpy()
    assert np.allclose(out, ref, atol=1e-5)
    # upsample2x convenience
    out2 = np.asarray(upsample2x(jnp.asarray(x)))
    ref2 = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                         scale_factor=2, mode="bilinear",
                         align_corners=True).permute(0, 2, 3, 1).numpy()
    assert np.allclose(out2, ref2, atol=1e-5)
