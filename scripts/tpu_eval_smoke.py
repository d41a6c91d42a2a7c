"""End-to-end eval pipeline smoke ON THE TPU (round-5 hardware coverage).

tests/test_eval_pipeline.py drives eval.py's inference + fusion on the
virtual CPU mesh; this runs the same pipeline on the real chip with the
production bf16 path (Mosaic epilogue kernel engaged) — PFM artifacts,
fusion, PLY — asserting shapes and artifacts like the CPU test. Untrained
weights: this is a hardware-path smoke (the quality-scored variant needs
the trained checkpoint and runs in the CPU tier).

Run alone on the TPU.
"""
from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import numpy as np


def main():
    assert jax.default_backend() == "tpu"
    import eval as eval_mod
    from casmvsnet_pl_tpu.data import DTUDataset, read_pfm
    from casmvsnet_pl_tpu.data.synthetic import write_dtu_tree
    from casmvsnet_pl_tpu.fusion import read_ply

    tmp = tempfile.mkdtemp()
    root = os.path.join(tmp, "dtu")
    write_dtu_tree(root, scans=("synth1",), n_cams=5)
    lists = os.path.join(tmp, "lists")
    os.makedirs(lists)
    with open(os.path.join(lists, "test.txt"), "w") as f:
        f.write("synth1\n")

    class TinyDTU(DTUDataset):
        NATIVE_WH = (256, 256)
        DEPTH_CROP = ((32, 96), (32, 96))
        N_CAMS = 5
        LISTS_DIR = lists

    os.chdir(tmp)
    args = eval_mod.get_opts([
        "--root_dir", root, "--dataset_name", "dtu", "--split", "test",
        "--n_views", "3", "--img_wh", "64", "64",
        "--n_depths", "8", "8", "16", "--interval_ratios", "1", "2", "4",
        "--precision", "bf16", "--conf", "0.1", "--min_geo_consistent", "1",
    ])
    dataset = TinyDTU(root, "test", n_views=3, img_wh=(64, 64))
    scans = dataset.scans

    eval_mod.run_inference(args, dataset, scans)
    depth_dir = "results/dtu/depth/synth1"
    files = os.listdir(depth_dir)
    assert "depth_0000.pfm" in files and "proba_0000.pfm" in files, files
    depth = read_pfm(os.path.join(depth_dir, "depth_0000.pfm"))[0]
    proba = read_pfm(os.path.join(depth_dir, "proba_0000.pfm"))[0]
    assert depth.shape == (64, 64) and proba.shape == (16, 16)
    assert np.all(np.isfinite(depth)) and np.all(depth > 0)

    eval_mod.run_fusion(args, dataset, scans)
    ply = "results/dtu/points/synth1.ply"
    assert os.path.exists(ply)
    xyz, rgb = read_ply(ply)
    assert len(xyz) > 100 and rgb.dtype == np.uint8
    print(f"TPU eval smoke PASSED: {len(xyz)} points, "
          f"depth range [{depth.min():.1f}, {depth.max():.1f}]", flush=True)


if __name__ == "__main__":
    main()
