"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The container boots an `axon` TPU PJRT plugin via sitecustomize which
overrides JAX_PLATFORMS, so the platform must be forced back to CPU through
jax.config (env vars alone are ignored).  XLA_FLAGS still must be set before
jax initializes its backends.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in _flags:
    # On few-core hosts the 8 virtual devices' collective rendezvous makes
    # progress but can outlast XLA's default terminate timeout, which kills
    # the whole process with a fatal abort mid-suite (seen in test_parallel).
    # Same flags as parallel/dryrun.py.
    _flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# the container's sitecustomize exports JAX_PLATFORMS=axon; cli.main honors
# that env var (it re-applies it over this config), so pin the env too or a
# CLI test flips every later test in the process onto the TPU backend
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
