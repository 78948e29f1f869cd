"""Test configuration: force JAX onto CPU with 8 virtual devices.

Tests must run without TPU hardware; multi-chip sharding paths are exercised
on a virtual 8-device CPU mesh. The axon TPU plugin in this image overrides
JAX_PLATFORMS, so we also force the platform through jax.config after import.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
