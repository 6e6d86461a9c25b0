"""Test env: CPU backend with 8 virtual devices (SURVEY.md §5.2 item 3).

All tests run on the CPU backend — deterministic, fast, and it provides the
8-device fake mesh used by the distributed tests without TPU hardware.
Pallas kernels run in interpret mode on CPU (handled by the kernels' own
backend detection).

BLOCKCG_TEST_TPU=1 runs the ON-CHIP SMOKE SUBSET on the real device: f32
integration tests only (the _TPU_SMOKE whitelist below). The full suite
cannot run there: this backend supports neither complex dtypes nor x64
(Pallas lowering recurses infinitely with jax_enable_x64), and interpret-
mode Pallas programs do not execute — all platform limits, exercised and
documented 2026-08-16.

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

_TPU_RUN = bool(os.environ.get("BLOCKCG_TEST_TPU"))

if not _TPU_RUN:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    jax.config.update("jax_platforms", "cpu")
    # f64 available for reference solvers / oracles; library code is
    # dtype-explicit so f32 paths are unaffected. (NOT enabled on the TPU
    # backend: x64 breaks Pallas lowering there.)
    jax.config.update("jax_enable_x64", True)


# f32 integration tests that run on the real chip (see module docstring).
_TPU_SMOKE = {
    "test_cg_laplacian_f32_vs_scipy",
    "test_cg_max_iter_cap",
    "test_sbcgrq_f32_laplacian",
    "test_sbcgrq_f32_dirac",
    "test_cbdia_solve_sbcgrq",
    "test_slab_solve_end_to_end",
    "test_gauged_solve",
    "test_gauged_cbdia_solve_matches_general",
    "test_bcgdq_rank_robustness",
    "test_cheb_solve_matches_direct_and_cuts_iterations",
    "test_golden_cg",
    "test_golden_bcg_and_sbcgrq",
    "test_golden_3d",
    "test_repeat_solve_bitwise_identical",
    "test_shifted_sbcgrq_laplacian_f32",
    "test_eo_f32_pallas_interpret",
    "test_gauged_eo_f32_solve",
    "test_gauged_matrix_eo_f32_solve",
    "test_pbcg_on_merged_block_operator",
    "test_tiled_solve_f32",
    "test_shard_map_single_device_solve_f32",
    "test_rcm_bf16_tiled_solve_f32",
    "test_sbcgrq_restart_replacement_f32_frequent",
    # ring kernel: the family with documented HARDWARE-ONLY failure modes
    # (in-flight-DMA aborts; donated wrap reads) — interpret mode cannot
    # catch them (VERDICT r3 item 3/4).
    "test_ring_onchip_smoke",
    "test_ring_block_onchip_smoke",
    # bf16 tier on the real chip (the bf16 CG preset crash was chip-only).
    "test_sbcgrq_bf16_fields_converge",
    "test_cg_bf16_fields_converge",
}


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled-executable memory between test modules.

    The suite compiles ~1000 XLA:CPU programs in one process; past a
    cumulative threshold the NEXT compile segfaults inside
    backend_compile_and_load (observed 2026-08-20 at test_tiled once the
    suite grew past ~318 tests — deterministic at full-suite scope,
    unreproducible on any subset, bisected to total compile volume, not to
    any specific test). Dropping executables at module boundaries keeps the
    process under the cliff; the persistent compilation cache
    (utils/platform.py) makes the recompiles cheap."""
    yield
    if not _TPU_RUN:  # on-chip smoke reuses warm programs heavily
        jax.clear_caches()


def _backend_has_complex() -> bool:
    """Probe complex support in a SUBPROCESS: on this sandbox's tunnel a
    failing complex op poisons the whole client (every later computation,
    any dtype, errors UNIMPLEMENTED), so it must never run in-process."""
    if jax.default_backend() == "cpu":
        return True
    import subprocess
    import sys as _sys

    try:
        r = subprocess.run(
            [_sys.executable, "-c",
             "import jax, numpy as np, jax.numpy as jnp;"
             "x = jnp.asarray(np.ones(8, np.complex64)) * 1j;"
             "jax.block_until_ready(x);"
             "import numpy as _n; _n.asarray(x)"],
            capture_output=True, timeout=300,
        )
    except subprocess.TimeoutExpired:
        return False  # tunnel too slow / hung: treat as unsupported
    return r.returncode == 0


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "needs_complex: test requires complex dtypes on the default backend "
        "(this sandbox's TPU tunnel implements no complex ops)",
    )


def pytest_collection_modifyitems(config, items):
    if _TPU_RUN:
        skip_tpu = pytest.mark.skip(
            reason="not in the on-chip smoke subset (backend lacks x64/"
                   "complex/interpret-Pallas; see conftest docstring)"
        )
        for item in items:
            if (item.originalname not in _TPU_SMOKE
                    and item.name not in _TPU_SMOKE):
                item.add_marker(skip_tpu)
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
