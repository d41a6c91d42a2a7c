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
def test_full_training_resume_roundtrip(quality_fit):
    """restore_state must reproduce params, batch stats, optimizer state and
    step exactly, and continue producing identical updates. Checkpoint
    serialization itself is covered by the fast tests above; this pins the
    trainer-level wiring (donation, mesh shardings, step counter).

    Reuses the session fit's trainer, end state and on-disk last.ckpt
    (conftest.quality_fit), so the restore path is exercised against a
    real 32-update optimizer state with no new full-cascade compile.
    """
    import os

    from casmvsnet_pl_tpu.data.loader import collate

    trainer = quality_fit["trainer"]
    ds = quality_fit["train_ds"]
    batch = collate([ds[0], ds[1]])
    state = quality_fit["state"]
    path = os.path.join(quality_fit["ckpt_dir"], "last.ckpt")
    restored = trainer.restore_state(path, batch)

    assert (int(jax.device_get(restored.step))
            == int(jax.device_get(state.step)) > 0)
    for a, b in zip(jax.tree.leaves(jax.device_get(state)),
                    jax.tree.leaves(jax.device_get(restored))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    # continuing must produce identical updates; train_step donates its
    # input, so step on fresh copies to keep the session state alive for
    # other tests
    def fresh(s):
        return jax.tree.map(jnp.array, s)

    next_a, logs_a = trainer.train_step(fresh(state),
                                        trainer._device_batch(batch))
    next_b, logs_b = trainer.train_step(fresh(restored),
                                        trainer._device_batch(batch))
    np.testing.assert_allclose(float(jax.device_get(logs_a["train/loss"])),
                               float(jax.device_get(logs_b["train/loss"])),
                               rtol=0, atol=0)
    for a, b in zip(jax.tree.leaves(jax.device_get(next_a.params)),
                    jax.tree.leaves(jax.device_get(next_b.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
