"""Training system: the TPU-native replacement for Lightning's runtime.

Capability parity with MVSSystem + Trainer (/root/reference/train.py:28-205):
  - train step = forward + multi-scale masked SL1 + metrics, logged per step;
  - validation accumulates pixel-weighted sums and divides once at epoch end
    (sum-then-divide, exactly /root/reference/train.py:149-173);
  - TensorBoard scalars + [image|GT|pred|prob] panels on the first batch;
  - top-k checkpointing on val/acc_2mm (max, k=5) including optimizer state;
  - data parallelism: one jitted step over a ``jax.sharding.Mesh`` with the
    batch sharded on the ``data`` axis and parameters replicated — XLA
    compiles the gradient all-reduce onto ICI (replaces DDP/NCCL).
"""
from __future__ import annotations

import os
import time
from typing import Any, Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.loader import prefetch_to_device
from ..losses import sl1_loss
from ..metrics import abs_error_mean, acc_threshold_mean, metric_sums
from ..parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from ..utils.checkpoints import (TopKCheckpointManager, load_checkpoint,
                                 save_checkpoint)
from ..utils.optimizers import (OptimConfig, make_lr_schedule, make_optimizer,
                                unwrap_params_for, wrap_params_for)
from .state import TrainState


def model_batch_args(batch: dict) -> tuple:
    return (batch["imgs"], batch["proj_mats"], batch["init_depth_min"],
            batch["depth_interval"])


class MVSTrainer:
    def __init__(self, model, optim_cfg: OptimConfig, steps_per_epoch: int,
                 mesh=None, ckpt_dir: str | None = None,
                 log_dir: str | None = None, levels: int = 3,
                 monitor: str = "val/acc_2mm", top_k: int = 5):
        self.model = model
        self.cfg = optim_cfg
        self.levels = levels
        self.mesh = mesh if mesh is not None else make_mesh()
        self.tx, self.schedule = make_optimizer(optim_cfg, steps_per_epoch)
        self.ckpt_mgr = (TopKCheckpointManager(ckpt_dir, monitor=monitor,
                                               top_k=top_k)
                         if ckpt_dir else None)
        self.ckpt_dir = ckpt_dir
        self.writer = None
        if log_dir:
            from tensorboardX import SummaryWriter
            self.writer = SummaryWriter(log_dir)
        self._build_steps()

    # -- state -------------------------------------------------------------
    def init_state(self, sample_batch: dict, seed: int = 0) -> TrainState:
        rng = jax.random.PRNGKey(seed)
        # jit the init: one whole-graph compile instead of eager op-by-op
        # dispatch (which compiles every primitive separately — ~2x slower
        # even on the virtual CPU mesh, worse through the TPU tunnel).
        variables = jax.jit(self.model.init)(
            rng, *model_batch_args(sample_batch))
        params = wrap_params_for(self.cfg, variables["params"])
        opt_state = self.tx.init(params)
        state = TrainState.create(params, variables.get("batch_stats", {}),
                                  opt_state)
        return jax.device_put(state, replicated_sharding(self.mesh))

    def model_params(self, state: TrainState):
        """Parameters for inference (slow weights when using ranger)."""
        return unwrap_params_for(self.cfg, state.params)

    def restore_state(self, path: str, sample_batch: dict,
                      seed: int = 0) -> TrainState:
        """Full training resume: params + batch_stats + optimizer state +
        step from a checkpoint written by fit()/TopKCheckpointManager.

        (The reference only restores weights — /root/reference/utils/
        __init__.py:52-80; optimizer-state resume is an upgrade.)
        """
        from flax import serialization

        from .state import TrainState as TS
        template = self.init_state(sample_batch, seed)
        ckpt = load_checkpoint(path)
        params = wrap_params_for(
            self.cfg, jax.tree.map(jnp.asarray, ckpt["params"]))
        opt_state = serialization.from_state_dict(template.opt_state,
                                                  ckpt["opt_state"])
        state = TS.create(params,
                          jax.tree.map(jnp.asarray, ckpt["batch_stats"]),
                          jax.tree.map(jnp.asarray, opt_state))
        state = state.replace(step=jnp.asarray(int(ckpt["step"]),
                                               jnp.int32))
        return jax.device_put(state, replicated_sharding(self.mesh))

    # -- compiled steps ----------------------------------------------------
    def _build_steps(self):
        model, cfg, levels = self.model, self.cfg, self.levels
        tx, schedule = self.tx, self.schedule
        rep = replicated_sharding(self.mesh)
        data = batch_sharding(self.mesh)

        def train_step(state: TrainState, batch: dict):
            def loss_fn(fast_params):
                outs, mutated = model.apply(
                    {"params": fast_params, "batch_stats": state.batch_stats},
                    *model_batch_args(batch), train=True,
                    mutable=["batch_stats"])
                loss = sl1_loss(outs, batch["depths"], batch["masks"], levels)
                return loss, (outs, mutated["batch_stats"])

            fast = state.params.fast if cfg.optimizer == "ranger" \
                else state.params
            (loss, (outs, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(fast)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(step=state.step + 1, params=new_params,
                                      batch_stats=new_bs, opt_state=new_opt)
            pred = outs["depth_0"]
            gt, mask = batch["depths"]["level_0"], batch["masks"]["level_0"]
            logs = {
                "train/loss": loss,
                "train/abs_err": abs_error_mean(pred, gt, mask),
                "train/acc_1mm": acc_threshold_mean(pred, gt, mask, 1.0),
                "train/acc_2mm": acc_threshold_mean(pred, gt, mask, 2.0),
                "train/acc_4mm": acc_threshold_mean(pred, gt, mask, 4.0),
                "lr": schedule(state.step),
            }
            return new_state, logs

        def val_step(state: TrainState, batch: dict):
            params = state.params.slow if cfg.optimizer == "ranger" \
                else state.params
            outs = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                *model_batch_args(batch), train=False)
            loss = sl1_loss(outs, batch["depths"], batch["masks"], levels)
            sums = metric_sums(outs["depth_0"], batch["depths"]["level_0"],
                               batch["masks"]["level_0"])
            sums["loss"] = loss
            return sums, outs

        self.train_step = jax.jit(train_step, donate_argnums=0,
                                  in_shardings=(rep, data),
                                  out_shardings=(rep, rep))
        self.val_step = jax.jit(val_step, in_shardings=(rep, data),
                                out_shardings=(rep, rep))

    # -- loops -------------------------------------------------------------
    def _device_batch(self, batch: dict) -> dict:
        host = {k: v for k, v in batch.items() if k != "scan_vid"}
        return jax.tree.map(
            lambda x: jax.device_put(x, batch_sharding(self.mesh)), host)

    def _prefetch(self, loader: Iterable) -> Iterator[dict]:
        """Device-prefetching iterator over a host loader: up to 2 batches in
        flight, transferred from a background thread with the mesh's data
        sharding, so h2d (slow on the tunnel) overlaps device compute —
        the role DataLoader(num_workers=4, pin_memory=True) plays in the
        reference (/root/reference/train.py:85-97)."""
        for dev in prefetch_to_device(iter(loader), size=2,
                                      sharding=batch_sharding(self.mesh)):
            dev.pop("scan_vid", None)
            yield dev

    def validate(self, state: TrainState, val_loader: Iterable,
                 epoch: int = 0, global_step: int = 0) -> dict[str, float]:
        totals: dict[str, float] = {}
        n_batches = 0
        first = True
        for dev in self._prefetch(val_loader):
            sums, outs = self.val_step(state, dev)
            sums = jax.device_get(sums)
            for k, v in sums.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            n_batches += 1
            if first and self.writer is not None:
                self._log_images("val", jax.device_get(dev),
                                 jax.device_get(outs), global_step)
            first = False
        mask_sum = max(totals.get("mask_sum", 0.0), 1.0)
        metrics = {
            "val/loss": totals.get("loss", 0.0) / max(n_batches, 1),
            "val/abs_err": totals.get("abs_err_sum", 0.0) / mask_sum,
            "val/acc_1mm": totals.get("acc_1mm_sum", 0.0) / mask_sum,
            "val/acc_2mm": totals.get("acc_2mm_sum", 0.0) / mask_sum,
            "val/acc_4mm": totals.get("acc_4mm_sum", 0.0) / mask_sum,
        }
        if self.writer is not None:
            for k, v in metrics.items():
                self.writer.add_scalar(k, v, global_step)
        return metrics

    def fit(self, state: TrainState, train_loader, val_loader,
            num_epochs: int, log_every: int = 50,
            progress: bool = True) -> TrainState:
        global_step = int(jax.device_get(state.step))
        for epoch in range(num_epochs):
            t0 = time.time()
            iterator = self._prefetch(train_loader)
            if progress:
                from tqdm import tqdm
                iterator = tqdm(iterator, desc=f"epoch {epoch}",
                                total=len(train_loader), leave=False)
            for batch_nb, dev in enumerate(iterator):
                state, logs = self.train_step(state, dev)
                global_step += 1
                if self.writer is not None and (global_step % log_every == 0
                                                or batch_nb == 0):
                    logs = jax.device_get(logs)
                    for k, v in logs.items():
                        self.writer.add_scalar(k, float(v), global_step)
                if batch_nb == 0 and self.writer is not None:
                    _, outs = self.val_step(state, dev)
                    self._log_images("train", jax.device_get(dev),
                                     jax.device_get(outs), global_step)
            metrics = self.validate(state, val_loader, epoch, global_step)
            if self.ckpt_mgr is not None:
                tree = {"params": self.model_params(state),
                        "batch_stats": state.batch_stats,
                        "opt_state": state.opt_state,
                        "step": np.asarray(global_step)}
                self.ckpt_mgr.save(tree, metrics, epoch)
            if self.ckpt_dir:
                save_checkpoint(os.path.join(self.ckpt_dir, "last.ckpt"),
                                {"params": self.model_params(state),
                                 "batch_stats": state.batch_stats,
                                 "opt_state": state.opt_state,
                                 "step": np.asarray(global_step)})
            dt = time.time() - t0
            print(f"epoch {epoch}: " +
                  " ".join(f"{k}={v:.4f}" for k, v in metrics.items()) +
                  f" ({dt:.1f}s)")
        return state

    # -- logging -----------------------------------------------------------
    def _log_images(self, tag: str, batch: dict, outs: dict, step: int):
        from ..data.base import unnormalize_image
        from ..utils.visualization import visualize_depth, visualize_prob
        img = unnormalize_image(np.asarray(batch["imgs"][0, 0]))
        mask = np.asarray(batch["masks"]["level_0"][0])
        gt = visualize_depth(np.asarray(batch["depths"]["level_0"][0]))
        pred = visualize_depth(np.asarray(outs["depth_0"][0]) * mask)
        prob = visualize_prob(np.asarray(outs["confidence_0"][0]) * mask)
        panel = np.concatenate([img, gt, pred, prob], axis=1)  # (H, 4W, 3)
        self.writer.add_image(f"{tag}/image_GT_pred_prob",
                              panel.transpose(2, 0, 1), step)
