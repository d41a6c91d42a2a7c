import numpy as np
import pytest

from casmvsnet_pl_tpu.data.synthetic import PlaneScene
from casmvsnet_pl_tpu.fusion import (backproject, check_geo_consistency_np,
                                     fuse_scan, read_ply, write_ply)
from casmvsnet_pl_tpu.fusion.native import get_native_lib


def test_ply_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    xyz = rng.randn(100, 3).astype(np.float32)
    rgb = rng.randint(0, 256, (100, 3)).astype(np.uint8)
    p = str(tmp_path / "x.ply")
    write_ply(p, xyz, rgb)
    xyz2, rgb2 = read_ply(p)
    assert np.allclose(xyz, xyz2)
    assert np.array_equal(rgb, rgb2)
    # header sane for MATLAB eval / external viewers
    head = open(p, "rb").read(200)
    assert head.startswith(b"ply\nformat binary_little_endian 1.0\n")
    assert b"element vertex 100" in head


@pytest.fixture(scope="module")
def scene_views():
    scene = PlaneScene(img_wh=(64, 64), n_views=4, z0=460.0, baseline=15.0,
                       focal=120.0, slope_x=0.2)
    P = scene.proj_mats_level(1.0)           # (V, 4, 4) absolute, level 0
    depths = [scene.depth_map(v) for v in range(4)]
    images = [(scene.render(v) * 255).astype(np.float32) for v in range(4)]
    return scene, P, depths, images


def test_consistency_accepts_true_geometry(scene_views):
    scene, P, depths, images = scene_views
    d_reproj, mask, img_reproj = check_geo_consistency_np(
        depths[0], P[0], depths[1], P[1], images[1])
    interior = mask[16:48, 16:48]
    assert interior.mean() > 0.95            # true geometry is consistent
    # reprojected depth matches GT on accepted pixels
    ok = mask & (d_reproj > 0)
    assert np.abs(d_reproj[ok] - depths[0][ok]).max() < 2.0
    # reprojected color matches the ref image where accepted (same plane)
    ref_img = (scene.render(0) * 255).astype(np.float32)
    err = np.abs(img_reproj[16:48, 16:48] - ref_img[16:48, 16:48])
    assert err[interior].mean() < 10.0


def test_consistency_rejects_wrong_depth(scene_views):
    _, P, depths, images = scene_views
    wrong = depths[0] * 1.15                 # 15% depth error
    _, mask, _ = check_geo_consistency_np(wrong, P[0], depths[1], P[1],
                                          images[1])
    assert mask[16:48, 16:48].mean() < 0.05


def test_native_matches_numpy(scene_views):
    lib = get_native_lib()
    assert lib is not None, "native fusion kernel failed to build"
    from casmvsnet_pl_tpu.fusion.consistency import \
        check_geo_consistency_native
    _, P, depths, images = scene_views
    # add noise so partial acceptance exercises both branches
    rng = np.random.RandomState(0)
    noisy = depths[0] + rng.randn(*depths[0].shape).astype(np.float32) * 2.0
    dn, mn, cn = check_geo_consistency_np(noisy, P[0], depths[1], P[1],
                                          images[1])
    dc, mc, cc = check_geo_consistency_native(noisy, P[0], depths[1], P[1],
                                              images[1])
    agree = (mn == mc).mean()
    assert agree > 0.995, f"mask agreement {agree}"
    both = mn & mc
    assert np.allclose(dn[both], dc[both], atol=1e-2)
    assert np.allclose(cn[both], cc[both], atol=0.5)


def test_backproject_inverts_projection(scene_views):
    scene, P, depths, _ = scene_views
    mask = np.ones_like(depths[0], bool)
    colors = np.zeros(depths[0].shape + (3,), np.float32)
    xyz, _ = backproject(depths[0], mask, colors, P[0], skip=1)
    # world points must lie on the plane z = z0 + slope * X
    assert np.abs(xyz[:, 2] - (460.0 + 0.2 * xyz[:, 0])).max() < 0.5


def test_fuse_scan_end_to_end(scene_views):
    scene, P, depths, images = scene_views
    import cv2
    metas = [(0, [1, 2, 3]), (1, [0, 2, 3])]
    probas = {v: np.ones((16, 16), np.float32) for v in range(4)}

    xyz, rgb = fuse_scan(
        metas,
        read_image=lambda v: (scene.render(v) * 255).astype(np.uint8),
        read_depth=lambda v: depths[v],
        read_proba=lambda v: probas[v],
        proj_mat=lambda v: P[v],
        img_wh=(64, 64), conf=0.5, min_geo_consistent=2, skip=1)
    assert len(xyz) > 1000
    # fused points lie on the GT plane
    err = np.abs(xyz[:, 2] - (460.0 + 0.2 * xyz[:, 0]))
    assert np.median(err) < 1.0
    assert rgb.dtype == np.uint8 and rgb.shape == xyz.shape


def test_fuse_scan_missing_views_skipped(scene_views):
    scene, P, depths, images = scene_views

    def read_depth(v):
        if v == 0:
            raise FileNotFoundError("no depth")
        return depths[v]

    xyz, rgb = fuse_scan(
        [(0, [1, 2]), (1, [2, 3])],
        read_image=lambda v: (scene.render(v) * 255).astype(np.uint8),
        read_depth=read_depth,
        read_proba=lambda v: np.ones((16, 16), np.float32),
        proj_mat=lambda v: P[v],
        img_wh=(64, 64), conf=0.5, min_geo_consistent=1, skip=1)
    assert len(xyz) > 0                      # ref 1 still fused


def test_spill_cache_roundtrip(tmp_path):
    from casmvsnet_pl_tpu.fusion import SpillCache
    rng = np.random.RandomState(3)
    arrs = {i: rng.randn(64, 64).astype(np.float32) for i in range(8)}
    with SpillCache(max_bytes=3 * arrs[0].nbytes,
                    spill_dir=str(tmp_path)) as c:
        for k, v in arrs.items():
            c[k] = v
        assert c.n_spills > 0                     # budget actually enforced
        for k, v in arrs.items():                 # spilled entries reload
            assert k in c
            np.testing.assert_array_equal(c[k], v)
        c[2] = arrs[2] * 2                        # overwrite (spilled or not)
        np.testing.assert_array_equal(c[2], arrs[2] * 2)
        assert len(c) == 8


def test_fuse_scan_spill_cache_equivalent(scene_views):
    """A tiny cache budget (forcing spills every view) must not change the
    fused cloud at all — spilling is a memory policy, not an approximation."""
    scene, P, depths, images = scene_views
    metas = [(0, [1, 2, 3]), (1, [0, 2, 3]), (2, [0, 1, 3])]
    kwargs = dict(
        read_image=lambda v: (scene.render(v) * 255).astype(np.uint8),
        read_depth=lambda v: depths[v],
        read_proba=lambda v: np.ones((16, 16), np.float32),
        proj_mat=lambda v: P[v],
        img_wh=(64, 64), conf=0.5, min_geo_consistent=2, skip=1)
    xyz_mem, rgb_mem = fuse_scan(metas, cache_bytes=None, **kwargs)
    xyz_sp, rgb_sp = fuse_scan(metas, cache_bytes=20_000, **kwargs)
    np.testing.assert_array_equal(xyz_mem, xyz_sp)
    np.testing.assert_array_equal(rgb_mem, rgb_sp)


def test_fused_gt_cloud_scores_exact_on_dtu_benchmark(synth_tree, tmp_path):
    """GT depths -> full fusion driver -> Python DTU benchmark: near-zero.

    Pins the entire geometry seam with NO model in the loop: the dataset's
    test-protocol projection matrices, fusion's backprojection/consistency
    conventions, PLY I/O, and evaluate_scan's thinning+chamfer must agree
    with the PlaneScene's closed-form surface to sub-0.1 mm accuracy. A
    sign/convention error anywhere in that chain inflates this by orders
    of magnitude (measured: mean_acc 0.0013 mm, overall 0.199 — the
    completeness tail is FOV edges views drop, not error).
    """
    import cv2
    import os

    from casmvsnet_pl_tpu.data.synthetic import PlaneScene
    from casmvsnet_pl_tpu.evaluation import evaluate_scan
    from casmvsnet_pl_tpu.fusion import fuse_and_write

    root, TinyDTU, _ = synth_tree
    ds = TinyDTU(root, "test", n_views=3, img_wh=(64, 64))
    scene = PlaneScene(img_wh=(64, 64), n_views=5, z0=460.0, slope_x=0.3)
    metas = [(m[2], m[3]) for m in ds.metas if m[0] == "synth1"]

    def read_image(vid):
        img = cv2.imread(os.path.join(
            root, f"Rectified/synth1/rect_{vid + 1:03d}_3_r5000.png"))
        return cv2.resize(img, (64, 64),
                          interpolation=cv2.INTER_LINEAR)[:, :, ::-1]

    ply = str(tmp_path / "gt.ply")
    n = fuse_and_write(
        ply, metas, read_image,
        lambda vid: scene.depth_map(vid).astype(np.float32),
        lambda vid: np.ones((16, 16), np.float32),
        lambda vid: ds.proj_mats[vid][0][0], (64, 64),
        conf=0.5, min_geo_consistent=2, max_ref_views=400, skip=1,
        backend="auto", progress=False, cache_bytes=None)
    assert n > 10_000
    xyz, _ = read_ply(ply)
    res = evaluate_scan(xyz, scene.surface_points(), max_dist=20.0)
    assert res.mean_acc < 0.1, res
    assert res.median_comp < 0.1, res
    assert res.overall < 0.5, res
