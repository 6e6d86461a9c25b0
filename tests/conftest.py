"""Test env: CPU backend with 8 virtual devices (SURVEY.md §5.2 item 3).

All tests run on the CPU backend — deterministic, fast, and it provides the
8-device fake mesh used by the distributed tests without TPU hardware.
Pallas kernels run in interpret mode on CPU (handled by the kernels' own
backend detection). Set BLOCKCG_TEST_TPU=1 to run the suite on a real chip.

Note: this sandbox pre-imports jax and sets JAX_PLATFORMS via a
sitecustomize hook, so env vars alone don't stick — the backend must also be
forced through jax.config *after* import (safe: the backend itself is not
initialized until first use, and XLA_FLAGS is read at CPU-client init).
"""

import os

import jax

if not os.environ.get("BLOCKCG_TEST_TPU"):
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    jax.config.update("jax_platforms", "cpu")

# f64 available for reference solvers / oracles; library code is
# dtype-explicit so f32 paths are unaffected.
jax.config.update("jax_enable_x64", True)
