"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the JAX-idiomatic fake backend for testing pjit/psum/sharding without
TPU hardware (SURVEY.md §4). The axon TPU plugin (sitecustomize) forces
JAX_PLATFORMS=axon at interpreter start, so we both set the env var and
update the config after import.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# The suite is dominated by XLA:CPU compile time (full-cascade jits), not by
# run time; dialing CPU codegen effort down cuts the slow tier ~1.6x
# (test_train_loop.py 386 -> 244 s) with every test still green. The same
# trick the driver dryrun uses (__graft_entry__.py).
if "xla_backend_optimization_level" not in flags:
    flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the slow tier is dominated by XLA:CPU
# compiles of full-cascade jits; caching them on disk (keyed by HLO hash,
# so code changes invalidate exactly the affected graphs) makes re-runs
# compile-free. Override the location with JAX_TEST_CACHE_DIR; set it
# empty to disable.
_cache = os.environ.get(
    "JAX_TEST_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_test_cache"))
if _cache:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


class Subset:
    """First-n view of a dataset (shared by the slow-tier fixtures)."""

    def __init__(self, ds, n):
        self.ds, self.n = ds, min(n, len(ds))

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return self.ds[i]


@pytest.fixture(scope="session")
def synth_tree(tmp_path_factory):
    """Synthetic DTU tree + dataset class + model config, session-shared.

    One tree serves the train/val/test splits of every slow-tier module:
    scan synth1 trains (and is the held-out *test* scan for the eval
    pipeline — its GT geometry is known in closed form), synth2 validates.
    """
    from casmvsnet_pl_tpu.data import DTUDataset
    from casmvsnet_pl_tpu.data.synthetic import write_dtu_tree
    from casmvsnet_pl_tpu.models import CascadeMVSNet

    root = str(tmp_path_factory.mktemp("dtu"))
    write_dtu_tree(root, scans=("synth1", "synth2"), n_cams=5)
    lists = str(tmp_path_factory.mktemp("lists"))
    for split, scans in [("train", ["synth1"]), ("val", ["synth2"]),
                         ("test", ["synth1"])]:
        with open(os.path.join(lists, f"{split}.txt"), "w") as f:
            f.write("\n".join(scans) + "\n")

    class TinyDTU(DTUDataset):
        NATIVE_WH = (256, 256)
        DEPTH_CROP = ((32, 96), (32, 96))
        N_CAMS = 5
        LISTS_DIR = lists

    model = CascadeMVSNet(n_depths=(8, 8, 16), interval_ratios=(1., 2., 4.))
    return root, TinyDTU, model


@pytest.fixture(scope="session")
def quality_fit(synth_tree, tmp_path_factory):
    """ONE 4-epoch fit on the synthetic plane scene, session-shared.

    The fit is the slow tier's single largest compile+run cost, and two
    tests need a trained model: the convergence-quality assertions
    (tests/test_train_loop.py) and the fused-point-cloud score
    (tests/test_eval_pipeline.py). Training once and sharing the state —
    including the on-disk checkpoints the eval pipeline loads — covers
    both (VERDICT r3 items 4 and 6).

    Fit recipe and thresholds context: 12-epoch cosine keeps the lr high
    through the 4 epochs run here (scripts/probe_quality.py run A, whose
    measured trajectory bounds the thresholds asserted by the tests).
    """
    from casmvsnet_pl_tpu.data import DataLoader
    from casmvsnet_pl_tpu.data.loader import collate
    from casmvsnet_pl_tpu.engine import MVSTrainer
    from casmvsnet_pl_tpu.parallel import make_mesh
    from casmvsnet_pl_tpu.utils import OptimConfig

    root, TinyDTU, model = synth_tree
    # 16 samples x 4 epochs = 32 updates. A 3-epoch trim was tried and
    # REVERTED (round 5): the measured trajectory is 38.9 -> 29.9 -> 12.1
    # mm after epochs 1-3 and only the 4th epoch's steep phase reaches
    # the <4.0 mm / >0.3 acc_2mm thresholds.
    train_ds = Subset(TinyDTU(root, "train", n_views=3,
                              depth_interval=2.65), 16)
    # 5 val samples at batch 2: the ragged final batch exercises the
    # production pad+mask path (every sample counts, shapes stay static)
    val_ds = Subset(TinyDTU(root, "val", n_views=3, depth_interval=2.65), 5)
    mesh = make_mesh(2)
    train_loader = DataLoader(train_ds, 2, shuffle=True, num_workers=2)
    val_loader = DataLoader(val_ds, 2, shuffle=False, drop_last=False,
                            pad_last=True, num_workers=2)
    cfg = OptimConfig(optimizer="adam", lr=1e-3, lr_scheduler="cosine",
                      num_epochs=12, weight_decay=0.0)
    out_dir = tmp_path_factory.mktemp("fit")
    ckpt_dir = str(out_dir / "ckpts")
    log_dir = str(out_dir / "logs")
    trainer = MVSTrainer(model, cfg, steps_per_epoch=len(train_loader),
                         mesh=mesh, ckpt_dir=ckpt_dir, log_dir=log_dir)
    state = trainer.init_state(collate([train_ds[0], train_ds[1]]))
    before = trainer.validate(state, val_loader)
    state = trainer.fit(state, train_loader, val_loader, num_epochs=4,
                        progress=False)
    after = trainer.validate(state, val_loader)
    # trainer + end state are shared so the resume-roundtrip test reuses
    # this session's compiled train/init steps instead of paying its own
    # full-cascade compiles (the tier's dominant cost).
    return {"root": root, "TinyDTU": TinyDTU, "model": model,
            "ckpt_dir": ckpt_dir, "log_dir": log_dir,
            "trainer": trainer, "state": state, "train_ds": train_ds,
            "before": before, "after": after}


# --- shared jitted cost-volume builders (slow tier) ------------------------
# Same-shape sampler-parity tests across test_patch_sampling.py and
# test_window_sampling.py reuse ONE compiled executable per (shape, mode):
# the tier is XLA:CPU compile/trace bound, not run bound. Tests that
# monkeypatch sampling policy must NOT use these (the jit cache keys on
# shapes only and would serve a stale trace).
import functools  # noqa: E402

import jax.numpy as jnp  # noqa: E402


@functools.partial(jax.jit, static_argnames=("groups", "sampling"))
def bcv(feats, proj, dv, groups=1, sampling="quad"):
    from casmvsnet_pl_tpu.ops.plane_sweep import build_cost_volume
    return build_cost_volume(feats, proj, dv, groups=groups, remat=False,
                             sampling=sampling)


@functools.partial(jax.jit, static_argnames="sampling")
def bcv_grad(feats, proj, dv, sampling="quad"):
    from casmvsnet_pl_tpu.ops.plane_sweep import build_cost_volume

    def loss(f):
        return jnp.sum(build_cost_volume(f, proj, dv, remat=False,
                                         sampling=sampling) ** 2)
    return jax.grad(loss)(feats)
