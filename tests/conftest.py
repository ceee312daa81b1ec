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

# NOTE: the persistent XLA compilation cache is deliberately NOT enabled
# here. Measured round 3 on this 1-core box: loading XLA:CPU AOT entries
# is slower than recompiling (the multichip dryrun ran 281 s cold vs
# 422 s warm; cpu_aot_loader burns minutes of sys time on machine-feature
# mismatch checks). Cold compiles are the faster path for the CPU suite.
