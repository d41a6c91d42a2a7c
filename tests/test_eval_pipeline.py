import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from casmvsnet_pl_tpu.data import DTUDataset, read_pfm
from casmvsnet_pl_tpu.data.synthetic import write_dtu_tree
from casmvsnet_pl_tpu.fusion import read_ply

pytestmark = pytest.mark.slow  # full-model tier: minutes of CPU compile


@pytest.fixture(scope="module")
def tiny_test_setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dtu"))
    write_dtu_tree(root, scans=("synth1",), n_cams=5)
    lists = str(tmp_path_factory.mktemp("lists"))
    with open(os.path.join(lists, "test.txt"), "w") as f:
        f.write("synth1\n")

    class TinyDTU(DTUDataset):
        NATIVE_WH = (256, 256)
        DEPTH_CROP = ((32, 96), (32, 96))
        N_CAMS = 5
        LISTS_DIR = lists

    return root, TinyDTU


def test_eval_inference_and_fusion(tiny_test_setup, tmp_path, monkeypatch):
    root, TinyDTU = tiny_test_setup
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
