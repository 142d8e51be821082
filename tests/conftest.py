"""Test env setup: force the CPU backend with 8 virtual devices, so
sharding/collective tests run anywhere (SURVEY.md §4.2 — the standard
host-count trick). Set XR_TEST_PLATFORM=tpu to run the TPU-marked Pallas
tests on real hardware instead.

Note: this box's sitecustomize force-registers the axon TPU platform and
sets the jax_platforms config to "axon,cpu", so plain env vars are not
enough — we must update the jax config in-process (before any backend
client initializes).
"""

import os

_platform = os.environ.get("XR_TEST_PLATFORM", "cpu")
if _platform == "tpu" and os.environ.get("PALLAS_AXON_POOL_IPS"):
    _platform = "axon,cpu"  # this box's TPU registers as the axon platform
os.environ["JAX_PLATFORMS"] = _platform
if _platform == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", _platform)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: requires a real TPU device (XR_TEST_PLATFORM=tpu)"
    )


def pytest_runtest_setup(item):
    if any(m.name == "tpu" for m in item.iter_markers()):
        if jax.default_backend() not in ("tpu", "axon"):
            pytest.skip("requires a TPU device (set XR_TEST_PLATFORM=tpu)")
