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
import sys

import pytest

import jax

# JAX tracing (Pallas index maps, nested jits) plus pytest's own frames can
# exceed CPython's default 1000-frame limit on the TPU backend.
sys.setrecursionlimit(10000)

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


def _backend_has_complex() -> bool:
    if jax.default_backend() == "cpu":
        return True
    try:
        import numpy as _np
        import jax.numpy as _jnp

        x = _jnp.asarray(_np.ones(8, _np.complex64))
        jax.block_until_ready(x * 1j)
        return True
    except Exception:
        return False


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "needs_complex: test requires complex dtypes on the default backend "
        "(this sandbox's TPU tunnel implements no complex ops)",
    )


def pytest_collection_modifyitems(config, items):
    ndev = len(jax.devices())
    if ndev < 8:
        skip_mesh = pytest.mark.skip(
            reason=f"needs the 8-device fake mesh (have {ndev})"
        )
        for item in items:
            if item.fspath.basename in ("test_distributed.py",
                                        "test_dist_cbdia.py"):
                item.add_marker(skip_mesh)
    if _backend_has_complex():
        return
    skip = pytest.mark.skip(reason="default backend has no complex support")
    for item in items:
        if item.get_closest_marker("needs_complex"):
            item.add_marker(skip)
