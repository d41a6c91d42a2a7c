"""Optax optimizer and LR-schedule factories.

Capability parity with the reference's optimizer/scheduler surface
(/root/reference/utils/__init__.py:10-46, utils/optimizers.py,
utils/warmup_scheduler.py): sgd / adam / radam / ranger (RAdam + Lookahead),
steplr / cosine / poly schedules, and gradual warmup. Rebuilt on optax — the
reference vendors ~540 LoC of torch optimizers; optax ships RAdam and
Lookahead natively.

Schedules are *per-step* functions driven by ``steps_per_epoch`` (torch
schedulers step per epoch; evaluating the same piecewise schedule at
fractional epochs is equivalent at epoch boundaries).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import optax


@dataclasses.dataclass
class OptimConfig:
    optimizer: str = "sgd"            # sgd | adam | radam | ranger
    lr: float = 1e-3
    momentum: float = 0.9
    weight_decay: float = 1e-5
    lr_scheduler: str = "steplr"      # steplr | cosine | poly
    num_epochs: int = 16
    # warmup (applied for sgd/adam only, like the reference)
    warmup_multiplier: float = 1.0
    warmup_epochs: int = 0
    # steplr
    decay_step: Sequence[int] = (20,)
    decay_gamma: float = 0.1
    # poly
    poly_exp: float = 0.9
    eps: float = 1e-8


def make_lr_schedule(cfg: OptimConfig, steps_per_epoch: int) -> Callable:
    """Epoch-piecewise schedule evaluated per optimization step."""
    def epoch_of(step):
        return step / steps_per_epoch

    def base_lr_at(epoch):
        import jax.numpy as jnp
        if cfg.lr_scheduler == "steplr":
            factor = jnp.ones(())
            for milestone in cfg.decay_step:
                factor = factor * jnp.where(epoch >= milestone,
                                            cfg.decay_gamma, 1.0)
            return cfg.lr * factor
        if cfg.lr_scheduler == "cosine":
            t = jnp.clip(epoch / cfg.num_epochs, 0.0, 1.0)
            eta_min = cfg.eps
            return eta_min + (cfg.lr - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * t))
        if cfg.lr_scheduler == "poly":
            t = jnp.clip(epoch / cfg.num_epochs, 0.0, 1.0)
            return cfg.lr * (1 - t) ** cfg.poly_exp
        raise ValueError(f"unknown lr_scheduler {cfg.lr_scheduler!r}")

    warmup_on = (cfg.warmup_epochs > 0 and
                 cfg.optimizer in ("sgd", "adam") and
                 cfg.warmup_multiplier >= 1.0)

    def schedule(step):
        import jax.numpy as jnp
        epoch = epoch_of(step)
        if not warmup_on:
            return base_lr_at(epoch)
        # GradualWarmupScheduler: lr ramps base_lr -> base_lr*multiplier over
        # warmup_epochs, then the wrapped schedule (shifted) takes over with
        # base lrs scaled by the multiplier.
        ramp = cfg.lr * ((cfg.warmup_multiplier - 1.0) *
                         jnp.minimum(epoch, cfg.warmup_epochs) /
                         cfg.warmup_epochs + 1.0)
        after = cfg.warmup_multiplier * base_lr_at(epoch - cfg.warmup_epochs)
        return jnp.where(epoch <= cfg.warmup_epochs, ramp, after)

    return schedule


def make_optimizer(cfg: OptimConfig,
                   steps_per_epoch: int) -> tuple[optax.GradientTransformation,
                                                  Callable]:
    """Build the optax chain and its LR schedule.

    Weight decay is additive L2 on gradients (torch semantics, not decoupled
    AdamW) to match the reference's optimizers.
    """
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    wd = optax.add_decayed_weights(cfg.weight_decay) if cfg.weight_decay \
        else optax.identity()

    if cfg.optimizer == "sgd":
        core = optax.chain(wd, optax.sgd(schedule, momentum=cfg.momentum))
    elif cfg.optimizer == "adam":
        core = optax.chain(wd, optax.adam(schedule, eps=cfg.eps))
    elif cfg.optimizer == "radam":
        core = optax.chain(wd, optax.radam(schedule, eps=cfg.eps))
    elif cfg.optimizer == "ranger":
        inner = optax.chain(wd, optax.radam(schedule, eps=cfg.eps))
        core = optax.lookahead(inner, sync_period=6, slow_step_size=0.5)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    return core, schedule


def wrap_params_for(cfg: OptimConfig, params):
    """Ranger (lookahead) keeps fast/slow copies; others use params directly."""
    if cfg.optimizer == "ranger":
        return optax.LookaheadParams.init_synced(params)
    return params


def unwrap_params_for(cfg: OptimConfig, params):
    if cfg.optimizer == "ranger":
        return params.slow
    return params
