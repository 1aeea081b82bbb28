"""Test harness: CPU backend with 8 virtual devices (multi-chip simulation).

Environment must be set before the first jax import (SURVEY.md §4: the
TPU-world substitute for "multi-node without a cluster").
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
