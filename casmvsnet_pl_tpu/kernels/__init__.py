"""Pallas TPU kernels for the hot non-matmul ops."""
from .tap_reduce import weighted_tap_reduce  # noqa: F401
