"""Pallas TPU kernels for the hot non-matmul ops.

Production kernel: the transposed-layout patch-sampling epilogue
(:mod:`.patch_epilogue`), consumed by ``ops/plane_sweep._patch_sample``.
Two earlier kernels (a fused quad tap-reduce and a fused cost epilogue)
measured slower than their XLA formulations and were retired to
``scripts/kernel_tap_reduce.py`` / ``scripts/kernel_cost_epilogue.py``
with their measurements recorded in PERF_NOTES.md.
"""
from .patch_epilogue import epilogue_bwd, epilogue_fwd  # noqa: F401
