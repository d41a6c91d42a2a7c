"""Reliable device timing through an async/laggy runtime (axon tunnel).

`block_until_ready` on the axon TPU tunnel returns at enqueue, and every
host<->device transfer costs ~50-100 ms latency at ~40 MB/s. The only sound
measurement: run the op N times inside ONE jitted fori_loop with a forced
serializing data dependency, return a 4-byte scalar, and difference the
wall time of two different N to cancel dispatch/transfer overhead.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _loop_fn(fn, n_args):
    def loop(iters, args):
        def body(i, carry):
            args, acc = carry
            out = fn(*args)
            leaves = jax.tree.leaves(out)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            # Serialize: fold a vanishing function of the output into EVERY
            # float leaf of EVERY arg. Perturbing only one leaf lets XLA
            # hoist all compute that doesn't depend on it out of the loop
            # (e.g. a whole model when arg 0 is a params pytree whose first
            # leaf is some deep layer's bias) — measured 30x-low that way.
            a_leaves, a_def = jax.tree.flatten(args)
            eps32 = s * 1e-38
            a_leaves = [
                l + eps32.astype(l.dtype)
                if jnp.issubdtype(l.dtype, jnp.floating) else l
                for l in a_leaves
            ]
            args = jax.tree.unflatten(a_def, a_leaves)
            return (args, acc + s)
        _, acc = jax.lax.fori_loop(0, iters, body, (args, jnp.float32(0)))
        return acc
    return jax.jit(loop, static_argnums=0)


def device_time(fn, *args, iters: int = 16, verbose: bool = False) -> float:
    """Median per-iteration device seconds of fn(*args)."""
    loop = _loop_fn(fn, len(args))
    lo, hi = max(1, iters // 4), iters
    t0 = time.perf_counter()
    float(loop(lo, args))          # compile + warm
    compile_s = time.perf_counter() - t0

    def run(n):
        t0 = time.perf_counter()
        float(loop(n, args))
        return time.perf_counter() - t0

    t_lo = min(run(lo) for _ in range(2))
    t_hi = min(run(hi) for _ in range(2))
    per_iter = (t_hi - t_lo) / (hi - lo)
    if verbose:
        print(f"  compile={compile_s:.1f}s t({lo})={t_lo:.3f}s "
              f"t({hi})={t_hi:.3f}s -> {per_iter * 1e3:.2f} ms/iter",
              flush=True)
    return max(per_iter, 0.0)
