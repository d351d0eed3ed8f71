"""Test config: run JAX on a virtual 8-device CPU mesh.

This is the idiomatic way to exercise TPU sharding logic without a pod slice
(SURVEY.md §4): tests that need a mesh see 8 CPU devices via
``xla_force_host_platform_device_count``.

Note: the environment pre-registers a TPU ("axon") backend via
sitecustomize, so jax may already be imported when this conftest runs;
``jax.config.update`` (not env vars) is the reliable override.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
