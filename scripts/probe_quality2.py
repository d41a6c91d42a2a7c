"""Per-epoch val trajectory of the EXACT test_fit_quality_and_artifacts
protocol (tests/test_train_loop.py), to pick the cheapest epoch count /
geometry that still clears meaningful thresholds (VERDICT r2 item 5:
full suite < 10 min; the quality fit is the dominant runtime).

Usage: python scripts/probe_quality2.py [epochs] [img] [subset]
  img: synthetic image side (default 64, the current test geometry)
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


class _Subset:
    def __init__(self, ds, n):
        self.ds, self.n = ds, min(n, len(ds))

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return self.ds[i]


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    img = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    subset = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    native = img * 4
    crop = (native // 8, 3 * native // 8)

    tmp = tempfile.mkdtemp()
    root = os.path.join(tmp, "dtu")
    write_dtu_tree(root, scans=("synth1", "synth2"), n_cams=5,
                   img_wh=(img, img), native_wh=(native, native))
    lists = os.path.join(tmp, "lists")
    os.makedirs(lists)
    for split, scans in [("train", ["synth1"]), ("val", ["synth2"])]:
        with open(os.path.join(lists, f"{split}.txt"), "w") as f:
            f.write("\n".join(scans) + "\n")

    class TinyDTU(DTUDataset):
        NATIVE_WH = (native, native)
        DEPTH_CROP = (crop, crop)
        N_CAMS = 5
        LISTS_DIR = lists

    model = CascadeMVSNet(n_depths=(8, 8, 16), interval_ratios=(1., 2., 4.))
    train_ds = _Subset(TinyDTU(root, "train", n_views=3,
                               depth_interval=2.65), subset)
    val_ds = _Subset(TinyDTU(root, "val", n_views=3, depth_interval=2.65), 4)
    mesh = make_mesh(2)
    train_loader = DataLoader(train_ds, 2, shuffle=True, num_workers=2)
    val_loader = DataLoader(val_ds, 2, shuffle=False, drop_last=True,
                            num_workers=2)
    cfg = OptimConfig(optimizer="adam", lr=1e-3, lr_scheduler="cosine",
                      num_epochs=12, weight_decay=0.0)
    trainer = MVSTrainer(model, cfg, steps_per_epoch=len(train_loader),
                         mesh=mesh)
    state = trainer.init_state(collate([train_ds[0], train_ds[1]]))

    t0 = time.time()
    m = trainer.validate(state, val_loader)
    print(f"img={img} subset={subset} epoch 0: "
          f"abs_err={m['val/abs_err']:.3f} acc_2mm={m['val/acc_2mm']:.3f} "
          f"loss={m['val/loss']:.4f} [{time.time() - t0:.0f}s]", flush=True)
    for ep in range(1, epochs + 1):
        state = trainer.fit(state, train_loader, val_loader, num_epochs=1,
                            progress=False)
        m = trainer.validate(state, val_loader)
        print(f"img={img} subset={subset} epoch {ep}: "
              f"abs_err={m['val/abs_err']:.3f} acc_2mm={m['val/acc_2mm']:.3f}"
              f" loss={m['val/loss']:.4f} [{time.time() - t0:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
