"""Tests for the Python DTU point-cloud benchmark (evaluation/dtu_eval.py)."""
import numpy as np
import pytest

from casmvsnet_pl_tpu.evaluation import (aggregate, evaluate_scan,
                                         reduce_points)

scipy = pytest.importorskip("scipy")


def test_reduce_points_min_separation():
    rng = np.random.RandomState(0)
    pts = rng.rand(3000, 3) * 10
    out = reduce_points(pts, dst=0.5, seed=1)
    assert out.shape[0] < pts.shape[0]
    from scipy.spatial import cKDTree
    d, _ = cKDTree(out).query(out, k=2, workers=-1)
    assert d[:, 1].min() > 0.5          # no two kept points within dst


def test_reduce_points_keeps_isolated_points():
    # points farther than dst apart must all be kept
    grid = np.stack(np.meshgrid(*[np.arange(5.0)] * 3), -1).reshape(-1, 3)
    out = reduce_points(grid, dst=0.2, seed=0)
    assert out.shape[0] == grid.shape[0]


def test_evaluate_scan_noise_statistics():
    """acc/comp of an isotropic-gaussian-perturbed cloud = E|N3(0, s)| =
    s*sqrt(2)*Gamma(2)/Gamma(1.5) ~= 1.596 s."""
    rng = np.random.RandomState(1)
    gt = rng.rand(20000, 3) * 100
    s = 0.3
    rec = gt + rng.randn(*gt.shape) * s
    r = evaluate_scan(rec, gt, scan=1, dst=0.05)  # small dst: keep most pts
    expect = 1.596 * s
    assert abs(r.mean_acc - expect) < 0.1 * expect
    assert abs(r.mean_comp - expect) < 0.1 * expect
    assert r.overall == pytest.approx(0.5 * (r.mean_acc + r.mean_comp))


def test_outliers_cut_at_max_dist():
    rng = np.random.RandomState(2)
    gt = rng.rand(5000, 3) * 50
    rec = np.vstack([gt, rng.rand(500, 3) * 50 + 500])   # far outliers
    r_with = evaluate_scan(rec, gt, dst=0.05, max_dist=20.0, margin=1e9)
    assert r_with.mean_acc < 1.0    # outliers beyond 20mm dropped from mean


def test_bounding_box_filter():
    rng = np.random.RandomState(3)
    gt = rng.rand(5000, 3) * 50
    outliers = rng.rand(2000, 3) * 50 + 200
    rec = np.vstack([gt, outliers])
    r = evaluate_scan(rec, gt, dst=0.05, margin=10.0)
    # out-of-box points never even reach the distance computation
    assert r.n_data <= 5000 + 10


def test_aggregate_mean_over_scans():
    from casmvsnet_pl_tpu.evaluation import DTUScanResult
    rs = [DTUScanResult(1, 0.3, 0.5, 0.2, 0.4, 10, 10),
          DTUScanResult(2, 0.5, 0.3, 0.4, 0.2, 10, 10)]
    agg = aggregate(rs)
    assert agg["mean_acc"] == pytest.approx(0.4)
    assert agg["mean_comp"] == pytest.approx(0.4)
    assert agg["overall"] == pytest.approx(0.4)


def _matlab_round(x):
    """MATLAB round(): half away from zero (numpy rounds half to even)."""
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def _matlab_pipeline(data, stl, obs_mask, bb, res, plane, max_dist=20.0):
    """Direct transcription of PointCompareMain.m + ComputeStat_web.m
    (brute-force NN distances; 1-based mask indexing; filter order as in
    the .m sources). Independent of casmvsnet_pl_tpu.evaluation."""
    # MaxDistCP.m: nearest-neighbor distances, data->stl and stl->data
    d2 = ((data[:, None, :] - stl[None, :, :]) ** 2).sum(-1)
    Ddata = np.sqrt(d2.min(1))
    Dstl = np.sqrt(d2.min(0))
    # PointCompareMain.m:34-41: DataInMask via 1-based voxel lookup
    Qv = _matlab_round((data - bb[0:1]) / res) + 1
    shape = np.array(obs_mask.shape)
    valid = (Qv >= 1).all(1) & (Qv <= shape[None]).all(1)
    in_mask = np.zeros(len(data), bool)
    qi = (Qv[valid] - 1).astype(np.int64)
    in_mask[valid] = obs_mask[qi[:, 0], qi[:, 1], qi[:, 2]] > 0
    # PointCompareMain.m:51: StlAbovePlane
    above = stl @ plane[:3] + plane[3] > 0
    # BaseEvalMain_web.m:59-66 / ComputeStat_web.m:12
    acc = Ddata[in_mask]
    acc = acc[acc < max_dist]
    comp = Dstl[above]
    comp = comp[comp < max_dist]
    return acc.mean(), comp.mean(), int(in_mask.sum()), int(above.sum())


def test_evaluate_scan_matches_matlab_transcription(tmp_path):
    """evaluate_scan vs an independent line-by-line transcription of the
    MATLAB benchmark, with real ObsMask/Plane .mat files (VERDICT r1 #8).
    dst is set below the min point separation so the stochastic thinning
    is a no-op and the comparison is exact."""
    from scipy.io import savemat
    from casmvsnet_pl_tpu.evaluation import evaluate_scan

    rng = np.random.RandomState(11)
    stl = rng.rand(400, 3) * 100.0                       # GT in [0,100]^3
    data = np.vstack([
        stl[:300] + rng.randn(300, 3) * 0.5,             # good points
        rng.rand(40, 3) * 100.0 + 120.0,                 # out-of-mask
        stl[:20] + 30.0,                                 # >20mm outliers
        # voxel .5 boundary where MATLAB round (-> 35, unobserved) and
        # numpy half-to-even (-> 34, observed) disagree: (59+10)/2 = 34.5
        np.array([[59.0, 50.0, 50.0], [59.0, 20.0, 80.0]]),
    ])
    # ObsMask: voxel grid over [-10,110]^3 at res=2, observed = x<60 region
    res = 2.0
    bb = np.array([[-10.0, -10.0, -10.0], [110.0, 110.0, 110.0]])
    shape = tuple(int(v) for v in _matlab_round((bb[1] - bb[0]) / res) + 1)
    obs = np.zeros(shape, np.uint8)
    obs[: int(70 / res), :, :] = 1                       # observed x < ~60
    plane = np.array([0.0, 0.0, 1.0, -30.0])             # keep stl z > 30
    savemat(tmp_path / "ObsMask7_10.mat",
            {"ObsMask": obs, "BB": bb, "Res": res})
    savemat(tmp_path / "Plane7.mat", {"P": plane.reshape(4, 1)})

    want_acc, want_comp, want_nd, want_ns = _matlab_pipeline(
        data, stl, obs, bb, res, plane)
    r = evaluate_scan(data, stl, scan=7, dst=1e-9,
                      obs_mask_file=str(tmp_path / "ObsMask7_10.mat"),
                      plane_file=str(tmp_path / "Plane7.mat"))
    assert r.n_data == want_nd
    assert r.n_stl == want_ns
    assert r.mean_acc == pytest.approx(want_acc, rel=1e-12)
    assert r.mean_comp == pytest.approx(want_comp, rel=1e-12)


def test_margin_sensitivity():
    """The fallback box margin is a stand-in for MATLAB's ObsMask
    (VERDICT r3/r4 carried risk): verify the metrics are INSENSITIVE to
    its value across 5..20 mm for in-range clouds — the filter only
    drops genuine far-outliers — and that outliers past the margin are
    dropped while those inside are kept (and cut at max_dist).
    """
    rng = np.random.RandomState(5)
    stl = rng.rand(4000, 3) * 50.0
    data = stl[:2000] + rng.randn(2000, 3) * 0.3

    base = {m: evaluate_scan(data, stl, dst=0.05, margin=m)
            for m in (5.0, 10.0, 20.0)}
    accs = [r.mean_acc for r in base.values()]
    comps = [r.mean_comp for r in base.values()]
    assert max(accs) - min(accs) < 1e-9, accs       # identical point sets
    assert max(comps) - min(comps) < 1e-9, comps

    # outliers ~7 mm outside the GT box (nearest-GT distance ~12 mm,
    # inside the 20 mm cutoff): dropped at margin=5 (accuracy
    # unchanged), kept-and-measured at margin=20 (accuracy rises).
    # (Points further out get cut by max_dist in BOTH cases — verified
    # while writing this test: a -12 offset leaves mean_acc bit-equal.)
    outliers = np.full((200, 3), -7.0) + rng.rand(200, 3)
    noisy = np.concatenate([data, outliers])
    r5 = evaluate_scan(noisy, stl, dst=0.05, margin=5.0)
    r20 = evaluate_scan(noisy, stl, dst=0.05, margin=20.0)
    assert abs(r5.mean_acc - base[5.0].mean_acc) < 0.02, \
        (r5.mean_acc, base[5.0].mean_acc)
    assert r20.mean_acc > r5.mean_acc + 0.1, (r20.mean_acc, r5.mean_acc)
