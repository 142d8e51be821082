"""Honor JAX_PLATFORMS even under this box's sitecustomize, which
force-registers the axon TPU platform and overrides the config to
"axon,cpu" (see tests/conftest.py for the test-side equivalent)."""

import os


def apply_platform_env() -> None:
    p = os.environ.get("JAX_PLATFORMS")
    if p:
        import jax

        try:
            jax.config.update("jax_platforms", p)
        except Exception:
            pass
