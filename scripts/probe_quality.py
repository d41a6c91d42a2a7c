"""Probe: how low does val/abs_err go when training the test-tier cascade
on the synthetic DTU tree? Sets the threshold for the convergence-quality
test (VERDICT r2 item 4). CPU; prints the val metric trajectory.

Usage: python scripts/probe_quality.py [epochs]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
for f in ("--xla_force_host_platform_device_count=8",
          "--xla_backend_optimization_level=0"):
    if f.split("=")[0] not in flags:
        flags += " " + f
os.environ["XLA_FLAGS"] = flags.strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from casmvsnet_pl_tpu.data import DataLoader, DTUDataset
from casmvsnet_pl_tpu.data.loader import collate
from casmvsnet_pl_tpu.data.synthetic import write_dtu_tree
from casmvsnet_pl_tpu.engine import MVSTrainer
from casmvsnet_pl_tpu.models import CascadeMVSNet
from casmvsnet_pl_tpu.parallel import make_mesh
from casmvsnet_pl_tpu.utils import OptimConfig


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    tmp = tempfile.mkdtemp()
    root = os.path.join(tmp, "dtu")
    write_dtu_tree(root, scans=("synth1", "synth2"), n_cams=5)
    lists = os.path.join(tmp, "lists")
    os.makedirs(lists)
    for split, scans in [("train", ["synth1"]), ("val", ["synth2"])]:
        with open(os.path.join(lists, f"{split}.txt"), "w") as f:
            f.write("\n".join(scans) + "\n")

    class TinyDTU(DTUDataset):
        NATIVE_WH = (256, 256)
        DEPTH_CROP = ((32, 96), (32, 96))
        N_CAMS = 5
        LISTS_DIR = lists

    model = CascadeMVSNet(n_depths=(8, 8, 16), interval_ratios=(1., 2., 4.))
    train_ds = TinyDTU(root, "train", n_views=3, depth_interval=2.65)
    val_ds = TinyDTU(root, "val", n_views=3, depth_interval=2.65)
    train_loader = DataLoader(train_ds, 2, shuffle=True, num_workers=2)
    val_loader = DataLoader(val_ds, 2, shuffle=False, drop_last=True,
                            num_workers=2)
    cfg = OptimConfig(optimizer="adam", lr=1e-3, lr_scheduler="cosine",
                      num_epochs=epochs, weight_decay=0.0)
    mesh = make_mesh(2)
    trainer = MVSTrainer(model, cfg, steps_per_epoch=len(train_loader),
                         mesh=mesh)
    state = trainer.init_state(collate([train_ds[0], train_ds[1]]))

    t0 = time.time()
    m = trainer.validate(state, val_loader)
    print(f"epoch -1: abs_err={m['val/abs_err']:.3f} "
          f"acc2={m['val/acc_2mm']:.3f} ({time.time()-t0:.0f}s)", flush=True)
    # fit() prints the val metrics after every epoch
    trainer.fit(state, train_loader, val_loader, num_epochs=epochs,
                progress=False)


if __name__ == "__main__":
    main()
