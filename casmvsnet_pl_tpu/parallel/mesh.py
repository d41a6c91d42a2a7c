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

import logging

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


def initialize_distributed(**kwargs) -> None:
    """Multi-host bootstrap (no-op on a single host).

    Logs what happened instead of silently swallowing errors: a misconfigured
    multi-host launch must not silently degrade to single-host.
    """
    try:
        jax.distributed.initialize(**kwargs)
        logger.info("jax.distributed initialized: process %d/%d",
                    jax.process_index(), jax.process_count())
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            logger.info("jax.distributed already initialized")
            return
        raise
    except ValueError as e:
        # jax raises ValueError when no coordinator/cluster env is detected;
        # that is the normal single-process path — log it, don't hide it.
        logger.info("single-process run (jax.distributed not configured: %s)",
                    e)


def make_mesh(n_devices: int | None = None, model_axis: int = 1) -> Mesh:
    """(data, model) mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"make_mesh: requested {n_devices} devices but only "
            f"{len(devices)} are visible on platform "
            f"'{jax.default_backend()}'. For a virtual CPU mesh, set "
            f"JAX_PLATFORMS=cpu and XLA_FLAGS="
            f"--xla_force_host_platform_device_count={n_devices} before JAX "
            f"initializes (see tests/conftest.py).")
    if n_devices % model_axis:
        raise ValueError(f"make_mesh: n_devices={n_devices} not divisible "
                         f"by model_axis={model_axis}")
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
