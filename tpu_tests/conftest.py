"""Real-TPU smoke tier (SURVEY.md §4.2.4 'one-device TPU smoke tests').

Lives OUTSIDE tests/ on purpose: tests/conftest.py pins the suite to CPU
(x64 + 8 fake devices), while these tests must exercise the MOSAIC-compiled
Pallas kernels on the actual chip — interpret mode only proves the kernel
math, not the compiled artifact. Run with:

    python -m pytest tpu_tests/ -q          # (from the repo root, on TPU)

The whole tier must stay under ~5 min: small states, few compiles.
"""
import jax
import pytest


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() == "cpu":
        skip = pytest.mark.skip(reason="real-TPU smoke tier needs a TPU")
        for item in items:
            item.add_marker(skip)
