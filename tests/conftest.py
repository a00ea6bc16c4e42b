"""Test harness: force an 8-device virtual CPU platform.

The driver environment pins ``JAX_PLATFORMS=axon`` (TPU tunnel) and a
sitecustomize imports jax at interpreter start, so plain env vars are too
late — we must flip the platform through jax.config before any backend
initialisation. Tests then run on a virtual 8-device CPU mesh, mirroring the
multi-host test strategy in SURVEY.md §4.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (sitecustomize may have imported it already)

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process spawns, big fixtures)"
    )


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", "tests must run on the CPU platform"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
