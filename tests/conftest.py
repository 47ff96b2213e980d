"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the framework's stand-in for a fake distributed backend
(SURVEY.md §4): sharding tests get 8 visible devices without TPU hardware.

Note: a sitecustomize in this environment registers a TPU PJRT plugin at
interpreter start, so plain JAX_PLATFORMS env vars are not enough — we
override through jax.config, which takes effect before first backend use.
"""

import pytest

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)


# ---------------------------------------------------------------------------
# Quick subset: `pytest -m quick` is the inner-loop gate (~1 min); the full
# suite (heavy pipeline/parallel compiles on 8 virtual CPU devices) is the
# nightly gate. Modules listed here run entirely in seconds; other modules
# can opt individual tests in with @pytest.mark.quick.
# ---------------------------------------------------------------------------
_QUICK_MODULES = {
    "test_volume_rendering",
    "test_utils_and_config",
    "test_geometry",
    "test_native",
    "test_eval",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "quick: fast inner-loop subset (pytest -m quick)")
    config.addinivalue_line(
        "markers",
        "canary: skipped-by-default toolchain canaries (XLA crash repros); "
        "run with -m canary after a jax/jaxlib/libtpu update")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _QUICK_MODULES:
            item.add_marker(pytest.mark.quick)
        if "canary" in item.keywords and config.option.markexpr != "canary":
            item.add_marker(pytest.mark.skip(
                reason="toolchain canary — run explicitly with -m canary"))
