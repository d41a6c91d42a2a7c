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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
