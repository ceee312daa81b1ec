"""Test-suite configuration.

All tests run on CPU with 8 fake XLA devices (SURVEY.md §4.2.4) so the full
distributed path is exercised hermetically; float64 is enabled so parity
against the float64 reference can hit 1e-6 (SURVEY.md §7 hard parts). Pallas
kernels run in interpret mode on CPU here; the MOSAIC-compiled kernels are
exercised by the separate real-TPU smoke tier in tpu_tests/ (which this
conftest deliberately does not govern — run `pytest tpu_tests/` on the
chip).

Gotcha: this machine's sitecustomize imports jax at interpreter start to
register the 'axon' TPU plugin, so JAX_PLATFORMS in os.environ is read
before conftest runs — the platform must be forced via jax.config instead.
XLA_FLAGS is still read lazily at first backend init, so the fake-device
count can be set here.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache (same store as __graft_entry__): the
# suite's wall-clock on this 1-core box is dominated by XLA compiles of
# shapes that are identical run to run, so repeat suite runs skip most of
# that. Safe across backends — entries are keyed on program + options +
# backend.
try:
    _cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              os.pardir, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass  # older jax without the knobs: cold compiles still work
