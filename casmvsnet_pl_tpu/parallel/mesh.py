"""Device mesh and sharding helpers — the distributed "backend".

The reference delegates all distribution to Lightning DDP + NCCL
(/root/reference/train.py:199, SURVEY.md §2.3). The TPU-native equivalent is
declarative: build a ``jax.sharding.Mesh`` over the chips, shard the batch on
the ``data`` axis, keep parameters replicated, and let XLA compile the
gradient reductions onto ICI. Multi-host setups call
:func:`initialize_distributed` first (DCN process bootstrap).

The mesh also carries a ``model`` axis (size 1 by default) so tensor-style
shardings (e.g. sharding the plane-sweep depth axis for very-high-res
inference) can be layered on without changing call sites.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kwargs) -> None:
    """Multi-host bootstrap (no-op on a single host)."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        # already initialized or single-process setup
        pass


def make_mesh(n_devices: int | None = None, model_axis: int = 1) -> Mesh:
    """(data, model) mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    assert n_devices % model_axis == 0
    arr = np.array(devices[:n_devices]).reshape(n_devices // model_axis,
                                                model_axis)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """device_put a host batch dict with the batch axis sharded."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
