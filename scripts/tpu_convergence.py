"""TPU-hardware training convergence check (VERDICT r4 task 4).

Runs the slow tier's 4-epoch synthetic quality fit ON THE TPU with
production settings — bf16 features, ``--sampling auto`` (patch-shared
gathers + the Mosaic patch-epilogue kernel forward AND backward), banded
scatters — and asserts the same held-out-quality thresholds as
tests/test_train_loop.py::test_quality_fit. This is the only validation
of the hardware training path short of real data: every other
convergence test runs f32 on the virtual CPU mesh where the Pallas
kernel dispatches to its XLA fallback (kernels/patch_epilogue.py).

All reference numbers come from trained models
(/root/reference/README.md:47-53); a kernel-boundary or bf16
accumulation bug that only manifests on hardware would be invisible to
the CPU suite but fails this script.

Run alone on the TPU. First run compiles the train/val steps through the
remote compiler (minutes); the persistent cache makes re-runs cheap.
Results are recorded in PERF_NOTES.md ("TPU training convergence").
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp
import numpy as np

from casmvsnet_pl_tpu.data import DataLoader, DTUDataset
from casmvsnet_pl_tpu.data.loader import collate
from casmvsnet_pl_tpu.data.synthetic import write_dtu_tree
from casmvsnet_pl_tpu.engine import MVSTrainer
from casmvsnet_pl_tpu.models import CascadeMVSNet
from casmvsnet_pl_tpu.parallel import make_mesh
from casmvsnet_pl_tpu.utils import OptimConfig


class Subset:
    def __init__(self, ds, n):
        self.ds, self.n = ds, min(n, len(ds))

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return self.ds[i]


def main():
    assert jax.default_backend() == "tpu", (
        "this script validates the HARDWARE training path; run it on TPU "
        f"(got backend={jax.default_backend()})")
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 4

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

    # PRODUCTION settings: bf16 compute, auto sampling (patch + Mosaic
    # epilogue kernel fwd/bwd on this backend), banded scatter VJPs.
    model = CascadeMVSNet(n_depths=(8, 8, 16), interval_ratios=(1., 2., 4.),
                          dtype=jnp.bfloat16, sampling="auto")
    train_ds = Subset(TinyDTU(root, "train", n_views=3,
                              depth_interval=2.65), 16)
    val_ds = Subset(TinyDTU(root, "val", n_views=3, depth_interval=2.65), 4)
    train_loader = DataLoader(train_ds, 2, shuffle=True, num_workers=2)
    val_loader = DataLoader(val_ds, 2, shuffle=False, drop_last=True,
                            num_workers=2)
    cfg = OptimConfig(optimizer="adam", lr=1e-3, lr_scheduler="cosine",
                      num_epochs=12, weight_decay=0.0)
    mesh = make_mesh(1)
    trainer = MVSTrainer(model, cfg, steps_per_epoch=len(train_loader),
                         mesh=mesh)

    t0 = time.time()
    state = trainer.init_state(collate([train_ds[0], train_ds[1]]))
    t_init = time.time() - t0
    before = trainer.validate(state, val_loader)
    t_before = time.time() - t0
    print(f"init {t_init:.0f}s; untrained val: "
          f"abs_err={before['val/abs_err']:.3f} "
          f"acc2={before['val/acc_2mm']:.3f} ({t_before:.0f}s)", flush=True)

    state = trainer.fit(state, train_loader, val_loader, num_epochs=epochs,
                        progress=False)
    after = trainer.validate(state, val_loader)
    wall = time.time() - t0
    print(f"after {epochs} epochs on TPU (bf16, auto sampling): "
          f"abs_err={after['val/abs_err']:.3f} "
          f"acc2={after['val/acc_2mm']:.3f} loss={after['val/loss']:.4f} "
          f"wall={wall:.0f}s", flush=True)

    # Same thresholds as tests/test_train_loop.py::test_quality_fit
    # (derived from scripts/probe_quality.py with ~2x headroom).
    assert before["val/abs_err"] > 8.0, before
    assert np.isfinite(after["val/loss"])
    assert after["val/loss"] < before["val/loss"], (before, after)
    assert after["val/abs_err"] < 4.0, (before, after)
    assert after["val/acc_2mm"] > 0.3, (before, after)
    print("TPU convergence check PASSED", flush=True)


if __name__ == "__main__":
    main()
