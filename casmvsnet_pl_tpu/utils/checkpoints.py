"""Checkpoint save/load and top-k management.

Capability parity with the reference's checkpoint surface:
  - top-k checkpoints keyed on a monitored metric (val/acc_2mm, max, k=5 —
    /root/reference/train.py:179-183), here including optimizer state and
    step so training resume is exact (the reference only restores weights);
  - partial weight loading with ``prefixes_to_ignore`` for cross-dataset
    transfer (/root/reference/utils/__init__.py:52-80).

Format: msgpack (flax.serialization) of a plain nested dict.
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
from flax import serialization, traverse_util


def save_checkpoint(path: str, tree: Any) -> None:
    """Serialize a pytree of arrays/scalars to ``path`` (msgpack).

    Structured nodes (optax namedtuple states, dataclasses) are converted to
    plain dicts via flax's state-dict mechanism; use
    :func:`flax.serialization.from_state_dict` with a target to rebuild them.
    """
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tree = serialization.to_state_dict(tree)
    host_tree = jax.tree.map(np.asarray, jax.device_get(tree))
    data = serialization.msgpack_serialize(host_tree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Any:
    """Restore the nested dict written by :func:`save_checkpoint`."""
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def extract_model_params(ckpt: Any, prefixes_to_ignore=()) -> dict:
    """Pull model parameters out of a checkpoint dict, dropping ignored
    prefixes (path components joined with '/')."""
    params = ckpt.get("params", ckpt)
    flat = traverse_util.flatten_dict(params, sep="/")
    kept = {k: v for k, v in flat.items()
            if not any(k.startswith(p) for p in prefixes_to_ignore)}
    return traverse_util.unflatten_dict(kept, sep="/")


def partial_load(params: dict, ckpt_params: dict,
                 prefixes_to_ignore=()) -> tuple[dict, list[str], list[str]]:
    """Update ``params`` with matching entries of ``ckpt_params``.

    Entries are matched by flattened path; shape-mismatched or missing keys
    keep the fresh initialization (enabling cross-dataset transfer where the
    head differs). Returns (new_params, loaded_keys, skipped_keys).
    """
    flat = traverse_util.flatten_dict(params, sep="/")
    flat_ckpt = traverse_util.flatten_dict(ckpt_params, sep="/")
    loaded, skipped = [], []
    for k, v in flat_ckpt.items():
        if any(k.startswith(p) for p in prefixes_to_ignore):
            skipped.append(k)
            continue
        if k in flat and tuple(np.shape(flat[k])) == tuple(np.shape(v)):
            flat[k] = jax.numpy.asarray(v)
            loaded.append(k)
        else:
            skipped.append(k)
    return traverse_util.unflatten_dict(flat, sep="/"), loaded, skipped


class TopKCheckpointManager:
    """Keep the best-k checkpoints by a monitored scalar metric.

    Mirrors Lightning's ModelCheckpoint(monitor, mode, save_top_k) semantics
    (/root/reference/train.py:179-183); an index file records metric values
    so the manager is restartable.
    """

    def __init__(self, ckpt_dir: str, monitor: str = "val/acc_2mm",
                 mode: str = "max", top_k: int = 5):
        assert mode in ("max", "min")
        self.ckpt_dir = ckpt_dir
        self.monitor = monitor
        self.mode = mode
        self.top_k = top_k
        self._index_path = os.path.join(ckpt_dir, "index.json")
        os.makedirs(ckpt_dir, exist_ok=True)
        self._index: dict[str, float] = {}
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                self._index = json.load(f)

    def _worst(self) -> tuple[str, float] | None:
        if not self._index:
            return None
        key = min if self.mode == "max" else max
        name = key(self._index, key=self._index.get)
        return name, self._index[name]

    def save(self, tree: Any, metrics: dict[str, float], epoch: int) -> bool:
        """Save if the metric makes the top-k; returns whether it was kept."""
        value = float(metrics[self.monitor])
        if len(self._index) >= self.top_k:
            worst = self._worst()
            better = (value > worst[1]) if self.mode == "max" \
                else (value < worst[1])
            if not better:
                return False
            os.remove(os.path.join(self.ckpt_dir, worst[0]))
            del self._index[worst[0]]
        name = f"epoch={epoch:02d}.ckpt"
        save_checkpoint(os.path.join(self.ckpt_dir, name), tree)
        self._index[name] = value
        with open(self._index_path, "w") as f:
            json.dump(self._index, f, indent=1)
        return True

    def best_path(self) -> str | None:
        if not self._index:
            return None
        key = max if self.mode == "max" else min
        name = key(self._index, key=self._index.get)
        return os.path.join(self.ckpt_dir, name)
