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
