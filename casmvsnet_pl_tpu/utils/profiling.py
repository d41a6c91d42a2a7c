"""Profiling & device-memory observability.

The reference has no built-in tracing (SURVEY.md §5): its notebook times
one forward with time.time() + cuda.synchronize and README memory numbers
were read off nvidia-smi. Here profiling is first-class:

  - :func:`trace`: context manager around ``jax.profiler.trace`` writing a
    TensorBoard-viewable / xprof trace;
  - :class:`StepTimer`: wall-clock timing with device sync, EMA smoothing;
  - :func:`device_memory_stats`: live HBM usage per device;
  - :func:`log_compile_time`: one-shot compile timing helper.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: int = 2):
    """Write an xprof/TensorBoard trace of everything inside the block.

    View with: tensorboard --logdir <log_dir>  (Profile tab), or upload to
    xprof. Traces include XLA HLO timelines per TPU core.
    """
    jax.profiler.start_trace(log_dir, host_tracer_level=host_tracer_level)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer with exponential smoothing.

    Example::
        timer = StepTimer()
        for batch in loader:
            state, logs = train_step(state, batch)
            print(timer.tick(state.params))   # syncs, returns smoothed s/step
    """

    def __init__(self, smoothing: float = 0.9):
        self.smoothing = smoothing
        self.ema: float | None = None
        self._last: float | None = None

    def tick(self, sync_tree=None) -> float:
        if sync_tree is not None:
            jax.block_until_ready(sync_tree)
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.ema = dt if self.ema is None else (
                self.smoothing * self.ema + (1 - self.smoothing) * dt)
        self._last = now
        return self.ema if self.ema is not None else 0.0


def device_memory_stats() -> list[dict]:
    """Live HBM stats per device: bytes in use / limit (when the backend
    reports them; CPU returns empty entries)."""
    stats = []
    for d in jax.devices():
        s = d.memory_stats() or {}
        stats.append({
            "device": str(d),
            "bytes_in_use": s.get("bytes_in_use", 0),
            "peak_bytes_in_use": s.get("peak_bytes_in_use", 0),
            "bytes_limit": s.get("bytes_limit", 0),
        })
    return stats


def live_array_bytes() -> int:
    """Total bytes of all live jax.Arrays on this host's devices."""
    return sum(a.nbytes for a in jax.live_arrays())


def log_compile_time(fn, *args, label: str = "fn", **kwargs):
    """Run ``fn`` once, reporting (compile+run, steady-state) seconds."""
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args, **kwargs))
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args, **kwargs))
    t_steady = time.perf_counter() - t0
    print(f"[{label}] first(compile+run)={t_first:.2f}s steady={t_steady*1e3:.1f}ms")
    return out
