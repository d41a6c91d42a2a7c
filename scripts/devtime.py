"""Shim: canonical implementation lives in casmvsnet_pl_tpu.utils.devtime."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from casmvsnet_pl_tpu.utils.devtime import _loop_fn, device_time  # noqa: F401
