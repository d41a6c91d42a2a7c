"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the JAX-idiomatic fake backend for testing pjit/psum/sharding without
TPU hardware (SURVEY.md §4). The axon TPU plugin (sitecustomize) forces
JAX_PLATFORMS=axon at interpreter start, so we both set the env var and
update the config after import.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# The suite is dominated by XLA:CPU compile time (full-cascade jits), not by
# run time; dialing CPU codegen effort down cuts the slow tier ~1.6x
# (test_train_loop.py 386 -> 244 s) with every test still green. The same
# trick the driver dryrun uses (__graft_entry__.py).
if "xla_backend_optimization_level" not in flags:
    flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the slow tier is dominated by XLA:CPU
# compiles of full-cascade jits; caching them on disk (keyed by HLO hash,
# so code changes invalidate exactly the affected graphs) makes re-runs
# compile-free. Override the location with JAX_TEST_CACHE_DIR; set it
# empty to disable.
_cache = os.environ.get(
    "JAX_TEST_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_test_cache"))
if _cache:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
