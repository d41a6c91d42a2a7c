"""Train state: parameters, BN statistics, optimizer state, step."""
from __future__ import annotations

from typing import Any

import jax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any           # model params (LookaheadParams when ranger)
    batch_stats: Any      # BatchNorm running statistics
    opt_state: Any

    @classmethod
    def create(cls, params, batch_stats, opt_state):
        import jax.numpy as jnp
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=opt_state)
