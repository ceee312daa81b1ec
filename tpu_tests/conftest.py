"""Real-TPU smoke tier (SURVEY.md §4.2.4 'one-device TPU smoke tests').

Lives OUTSIDE tests/ on purpose: tests/conftest.py pins the suite to CPU
(x64 + 8 fake devices), while these tests must exercise the MOSAIC-compiled
Pallas kernels on the actual chip — interpret mode only proves the kernel
math, not the compiled artifact. Run with:

    python -m pytest tpu_tests/ -q          # (from the repo root, on TPU)

The whole tier must stay under ~5 min: small states, few compiles.
"""
import os

import jax
import pytest

# persistent compile cache (same store as tests/ and __graft_entry__):
# the tier's ~13 min is nearly all Mosaic/XLA compiles of fixed shapes,
# so warm re-runs come in far under the 5-min budget
try:
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     os.pardir, ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() == "cpu":
        skip = pytest.mark.skip(reason="real-TPU smoke tier needs a TPU")
        for item in items:
            item.add_marker(skip)
