"""Fast model initialization for slow-dispatch backends.

Two measured pathologies motivate this module (2026-08-20, this box):

* Eager ``model.init`` on the axon TPU costs ~300 s: the init trace is
  ~2k tiny ops and every one pays a host<->device tunnel round trip.
* Eager ``model.init`` on XLA:CPU costs ~33 s at any spatial shape
  (dispatch-bound, op count not FLOPs).

All model parameters in this package are spatial-shape independent
(convolutions + norms), so init can always run at a small probe shape on
the host CPU backend and the resulting (~1 MB) pytree be shipped to the
real device once.  The reference has no analog (torch init is host-side
and microseconds); this is a TPU/XLA-runtime concern only.
"""
from __future__ import annotations

import jax

__all__ = ["init_on_cpu"]


def init_on_cpu(model, rngs, *args, device=None, **kwargs):
    """Run ``model.init`` eagerly on the host CPU backend, then transfer.

    Eager (not jitted) on purpose: a jitted init would hand XLA:CPU the
    full forward graph at the *default* optimization level in production
    processes, trading a predictable ~30 s eager walk for an unbounded
    compile.  Test processes that set
    ``--xla_backend_optimization_level=0`` may prefer ``jax.jit(model.init)``.

    Args:
      model: a flax module with ``.init``.
      rngs: PRNG key (or dict of keys) for ``model.init``.
      *args / **kwargs: forwarded to ``model.init``; array leaves should
        be host (numpy) arrays so the eager ops stay on CPU.
      device: destination device for the variables; defaults to the
        process default device (first of ``jax.devices()``).

    Returns:
      The variables pytree, resident on ``device``.
    """
    cpu = jax.devices("cpu")[0]
    # Suspend the persistent compilation cache for the CPU-backend work:
    # XLA:CPU serializes AOT executables pinned to the compiling host's
    # CPU feature set (cpu_aot_loader warns of SIGILL when another
    # machine loads them), so CPU entries must never enter — or be loaded
    # from — the shared TPU cache dir. The eager init is dispatch-bound,
    # not compile-bound, so caching buys nothing here anyway.
    cache_dir = jax.config.jax_compilation_cache_dir
    if cache_dir is not None:
        jax.config.update("jax_compilation_cache_dir", None)
    try:
        with jax.default_device(cpu):
            variables = model.init(rngs, *args, **kwargs)
    finally:
        if cache_dir is not None:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
    if device is None:
        device = jax.devices()[0]
    if device.platform == "cpu":
        return variables
    return jax.device_put(variables, device)
