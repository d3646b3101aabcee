"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

This is the TPU-idiomatic analogue of a fake distributed backend (SURVEY.md §4):
all sharding/pjit tests run against 8 virtual CPU devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
