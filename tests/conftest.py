"""Test env setup: force the CPU backend with 8 virtual devices BEFORE jax
imports, so sharding/collective tests run anywhere (SURVEY.md §4.2 —
the standard host-count trick). Set XR_TEST_PLATFORM=tpu to run the
TPU-marked Pallas tests on real hardware instead.
"""

import os

_platform = os.environ.get("XR_TEST_PLATFORM", "cpu")
os.environ.setdefault("JAX_PLATFORMS", _platform)
if _platform == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: requires a real TPU device (XR_TEST_PLATFORM=tpu)"
    )


def pytest_runtest_setup(item):
    if any(m.name == "tpu" for m in item.iter_markers()):
        import jax

        if jax.default_backend() not in ("tpu", "axon"):
            pytest.skip("requires a TPU device (set XR_TEST_PLATFORM=tpu)")
