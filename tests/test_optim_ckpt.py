import numpy as np
import jax
import jax.numpy as jnp
import pytest

from casmvsnet_pl_tpu.utils import (OptimConfig, TopKCheckpointManager,
                                    extract_model_params, load_checkpoint,
                                    make_lr_schedule, make_optimizer,
                                    partial_load, save_checkpoint,
                                    unwrap_params_for, wrap_params_for)


def test_steplr_schedule():
    cfg = OptimConfig(lr=1.0, lr_scheduler="steplr", decay_step=(2, 4),
                      decay_gamma=0.1)
    sched = make_lr_schedule(cfg, steps_per_epoch=10)
    assert np.isclose(float(sched(0)), 1.0)
    assert np.isclose(float(sched(19)), 1.0)      # epoch 1.9
    assert np.isclose(float(sched(20)), 0.1)      # epoch 2
    assert np.isclose(float(sched(40)), 0.01)     # epoch 4


def test_cosine_schedule_endpoints():
    cfg = OptimConfig(lr=1e-3, lr_scheduler="cosine", num_epochs=16)
    sched = make_lr_schedule(cfg, steps_per_epoch=1)
    assert np.isclose(float(sched(0)), 1e-3)
    assert np.isclose(float(sched(8)), (1e-3 + 1e-8) / 2, rtol=1e-3)
    assert float(sched(16)) < 2e-8


def test_poly_schedule():
    cfg = OptimConfig(lr=1.0, lr_scheduler="poly", num_epochs=10, poly_exp=0.9)
    sched = make_lr_schedule(cfg, steps_per_epoch=1)
    assert np.isclose(float(sched(0)), 1.0)
    assert np.isclose(float(sched(5)), 0.5 ** 0.9, rtol=1e-5)


def test_warmup_schedule():
    cfg = OptimConfig(lr=1.0, optimizer="adam", lr_scheduler="steplr",
                      decay_step=(100,), warmup_multiplier=10.0,
                      warmup_epochs=2)
    sched = make_lr_schedule(cfg, steps_per_epoch=1)
    assert np.isclose(float(sched(0)), 1.0)
    assert np.isclose(float(sched(1)), 5.5)       # halfway up
    assert np.isclose(float(sched(2)), 10.0)
    assert np.isclose(float(sched(5)), 10.0)      # after warmup: base*mult


@pytest.mark.parametrize("name", ["sgd", "adam", "radam", "ranger"])
def test_optimizer_families_step(name):
    cfg = OptimConfig(optimizer=name, lr=1e-2)
    tx, _ = make_optimizer(cfg, steps_per_epoch=10)
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    wrapped = wrap_params_for(cfg, params)
    opt_state = tx.init(wrapped)

    def loss(p):
        return jnp.sum(p["w"] ** 2) + jnp.sum(p["b"] ** 2)

    fast = wrapped.fast if name == "ranger" else wrapped
    grads = jax.grad(loss)(fast)
    updates, opt_state = tx.update(grads, opt_state, wrapped)
    import optax
    new_wrapped = optax.apply_updates(wrapped, updates)
    new_params = unwrap_params_for(cfg, new_wrapped)
    assert jax.tree.structure(new_params) == jax.tree.structure(params)
    # sgd/adam must move immediately; radam holds still in the rectification
    # warmup; ranger's slow weights sync only every 6 steps
    if name in ("sgd", "adam"):
        assert not np.allclose(np.asarray(new_params["w"]), 1.0)
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree.leaves(new_params))


def test_checkpoint_roundtrip(tmp_path):
    tree = {"params": {"a": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "step": np.asarray(7)}
    p = str(tmp_path / "m.ckpt")
    save_checkpoint(p, tree)
    back = load_checkpoint(p)
    assert np.allclose(back["params"]["a"], tree["params"]["a"])
    assert int(back["step"]) == 7


def test_partial_load_with_prefixes():
    params = {"feature": {"w": np.zeros((2, 2), np.float32)},
              "head": {"w": np.zeros((3,), np.float32)},
              "loss": {"t": np.zeros((1,), np.float32)}}
    ckpt = {"feature": {"w": np.ones((2, 2), np.float32)},
            "head": {"w": np.ones((4,), np.float32)},      # shape mismatch
            "loss": {"t": np.ones((1,), np.float32)}}
    new, loaded, skipped = partial_load(params, ckpt,
                                        prefixes_to_ignore=("loss",))
    assert np.allclose(new["feature"]["w"], 1.0)
    assert np.allclose(new["head"]["w"], 0.0)              # kept fresh
    assert np.allclose(new["loss"]["t"], 0.0)              # ignored
    assert "feature/w" in loaded
    assert set(skipped) == {"head/w", "loss/t"}


def test_extract_model_params_nested():
    ckpt = {"params": {"a": np.ones(2)}, "opt_state": {"x": np.zeros(1)}}
    out = extract_model_params(ckpt)
    assert list(out) == ["a"]


def test_topk_manager(tmp_path):
    mgr = TopKCheckpointManager(str(tmp_path), monitor="val/acc_2mm",
                                mode="max", top_k=2)
    tree = {"params": {"w": np.zeros(1, np.float32)}}
    assert mgr.save(tree, {"val/acc_2mm": 0.5}, epoch=0)
    assert mgr.save(tree, {"val/acc_2mm": 0.7}, epoch=1)
    assert not mgr.save(tree, {"val/acc_2mm": 0.4}, epoch=2)  # below top-2
    assert mgr.save(tree, {"val/acc_2mm": 0.9}, epoch=3)      # evicts 0.5
    import os
    kept = sorted(f for f in os.listdir(tmp_path) if f.endswith(".ckpt"))
    assert kept == ["epoch=01.ckpt", "epoch=03.ckpt"]
    assert mgr.best_path().endswith("epoch=03.ckpt")
    # restartable from the index file
    mgr2 = TopKCheckpointManager(str(tmp_path), monitor="val/acc_2mm",
                                 mode="max", top_k=2)
    assert mgr2.best_path().endswith("epoch=03.ckpt")


@pytest.mark.slow  # full trainer compile: minutes of CPU XLA time
def test_full_training_resume_roundtrip(tmp_path):
    """restore_state must reproduce params, batch stats, optimizer state and
    step exactly, and continue producing identical updates. Checkpoint
    serialization itself is covered by the fast tests above; this pins the
    trainer-level wiring (donation, mesh shardings, step counter)."""
    from casmvsnet_pl_tpu.data.loader import collate
    from casmvsnet_pl_tpu.data.synthetic import PlaneScene
    from casmvsnet_pl_tpu.engine import MVSTrainer
    from casmvsnet_pl_tpu.models import CascadeMVSNet
    from casmvsnet_pl_tpu.parallel import make_mesh

    scene = PlaneScene(img_wh=(32, 32), n_views=3, z0=460.0, slope_x=0.2)
    imgs, proj, depths = scene.model_inputs()
    sample = {
        "imgs": imgs[0], "proj_mats": proj[0],
        "init_depth_min": np.float32(425.0),
        "depth_interval": np.float32(2.65),
        "depths": {k: v[0] for k, v in depths.items()},
        "masks": {k: np.ones(v[0].shape, bool) for k, v in depths.items()},
    }
    batch = collate([sample, sample])
    # sampling="quad" keeps the compile lean: resume logic is orthogonal to
    # the sampling strategy (sampler parity has its own oracle suite).
    model = CascadeMVSNet(n_depths=(8, 8, 8), interval_ratios=(1., 2., 4.),
                          sampling="quad")
    cfg = OptimConfig(optimizer="adam", lr=1e-3, lr_scheduler="cosine",
                      num_epochs=2)
    trainer = MVSTrainer(model, cfg, steps_per_epoch=4, mesh=make_mesh(2))

    state = trainer.init_state(batch)
    dev = trainer._device_batch(batch)
    state, _ = trainer.train_step(state, dev)
    state, _ = trainer.train_step(state, dev)

    path = str(tmp_path / "full.ckpt")
    save_checkpoint(path, {"params": trainer.model_params(state),
                           "batch_stats": state.batch_stats,
                           "opt_state": state.opt_state,
                           "step": np.asarray(int(jax.device_get(state.step)))})
    restored = trainer.restore_state(path, batch)

    assert int(jax.device_get(restored.step)) == 2
    for a, b in zip(jax.tree.leaves(jax.device_get(state)),
                    jax.tree.leaves(jax.device_get(restored))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    # continuing must produce identical updates (donate: rebuild dev batch)
    next_a, logs_a = trainer.train_step(state, trainer._device_batch(batch))
    next_b, logs_b = trainer.train_step(restored, trainer._device_batch(batch))
    np.testing.assert_allclose(float(jax.device_get(logs_a["train/loss"])),
                               float(jax.device_get(logs_b["train/loss"])),
                               rtol=0, atol=0)
    for a, b in zip(jax.tree.leaves(jax.device_get(next_a.params)),
                    jax.tree.leaves(jax.device_get(next_b.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
