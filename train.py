"""Training entry point.

Drop-in equivalent of the reference's ``python train.py ...``
(/root/reference/train.py), rebuilt on the TPU-native stack: CascadeMVSNet in
flax, optax optimizers/schedules, a jit-compiled data-parallel step over a
TPU mesh, pixel-weighted validation, TensorBoard logging and top-k
checkpoints keyed on val/acc_2mm.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from casmvsnet_pl_tpu.data import DataLoader, dataset_dict
from casmvsnet_pl_tpu.engine import MVSTrainer
from casmvsnet_pl_tpu.models import CascadeMVSNet
from casmvsnet_pl_tpu.opt import get_opts
from casmvsnet_pl_tpu.parallel import initialize_distributed, make_mesh
from casmvsnet_pl_tpu.utils import (OptimConfig, extract_model_params,
                                    load_checkpoint, partial_load)


def main(hparams):
    initialize_distributed()
    n_dev = hparams.num_devices or len(jax.devices())
    mesh = make_mesh(n_dev)
    assert hparams.batch_size % n_dev == 0 or hparams.batch_size >= n_dev, \
        "batch_size should be divisible by the device count"

    dtype = jnp.bfloat16 if hparams.precision == "bf16" or hparams.use_amp \
        else jnp.float32
    model = CascadeMVSNet(n_depths=tuple(hparams.n_depths),
                          interval_ratios=tuple(hparams.interval_ratios),
                          num_groups=hparams.num_groups,
                          dtype=dtype, remat=hparams.remat,
                          sampling=hparams.sampling)

    dataset_cls = dataset_dict[hparams.dataset_name]
    train_ds = dataset_cls(root_dir=hparams.root_dir, split="train",
                           n_views=hparams.n_views, levels=hparams.levels,
                           depth_interval=hparams.depth_interval)
    val_ds = dataset_cls(root_dir=hparams.root_dir, split="val",
                         n_views=hparams.n_views, levels=hparams.levels,
                         depth_interval=hparams.depth_interval)
    train_loader = DataLoader(train_ds, hparams.batch_size, shuffle=True,
                              num_workers=hparams.num_workers,
                              seed=hparams.seed)
    # pad+mask instead of drop_last: every val sample counts (the padded
    # rows carry zeroed masks, invisible to the pixel-weighted sums),
    # matching the reference's full-coverage validation
    # (/root/reference/train.py:92-97) while keeping XLA shapes static.
    val_loader = DataLoader(val_ds, hparams.batch_size, shuffle=False,
                            drop_last=False, pad_last=True,
                            num_workers=hparams.num_workers)

    cfg = OptimConfig(
        optimizer=hparams.optimizer, lr=hparams.lr,
        momentum=hparams.momentum, weight_decay=hparams.weight_decay,
        lr_scheduler=hparams.lr_scheduler, num_epochs=hparams.num_epochs,
        warmup_multiplier=hparams.warmup_multiplier,
        warmup_epochs=hparams.warmup_epochs,
        decay_step=tuple(hparams.decay_step),
        decay_gamma=hparams.decay_gamma, poly_exp=hparams.poly_exp)

    trainer = MVSTrainer(model, cfg, steps_per_epoch=len(train_loader),
                         mesh=mesh,
                         ckpt_dir=os.path.join("ckpts", hparams.exp_name),
                         log_dir=os.path.join("logs", hparams.exp_name),
                         levels=hparams.levels)

    from casmvsnet_pl_tpu.data.loader import collate
    sample = collate([train_ds[0] for _ in range(hparams.batch_size)])
    if hparams.resume_path:
        print("Resume full training state from", hparams.resume_path)
        state = trainer.restore_state(hparams.resume_path, sample,
                                      seed=hparams.seed)
    else:
        state = trainer.init_state(sample, seed=hparams.seed)

    n_params = sum(int(p.size) for p in
                   jax.tree.leaves(trainer.model_params(state)))
    print(f"number of parameters : {n_params / 1e6:.2f} M "
          f"on {n_dev} device(s)")

    if hparams.ckpt_path:
        print("Load model from", hparams.ckpt_path)
        ckpt = load_checkpoint(hparams.ckpt_path)
        ckpt_params = extract_model_params(ckpt)
        new_params, loaded, skipped = partial_load(
            trainer.model_params(state), ckpt_params,
            tuple(hparams.prefixes_to_ignore))
        for k in skipped:
            print("ignore", k)
        from casmvsnet_pl_tpu.utils import wrap_params_for
        state = state.replace(params=wrap_params_for(cfg, new_params))
        if "batch_stats" in ckpt:
            state = state.replace(batch_stats=jax.tree.map(
                jnp.asarray, ckpt["batch_stats"]))

    trainer.fit(state, train_loader, val_loader, hparams.num_epochs)


if __name__ == "__main__":
    main(get_opts())
