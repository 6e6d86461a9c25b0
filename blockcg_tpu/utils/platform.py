"""Platform helpers shared by the bench/driver scripts.

This sandbox pre-imports jax with the TPU platform pinned via a
sitecustomize hook, so switching to the fake multi-device CPU backend
needs BOTH the XLA flag (before first backend use) and a config update —
previously copy-pasted in __graft_entry__, scaling_bench, bench_comm.
"""

from __future__ import annotations

import os


def force_cpu_mesh(n_devices: int, *, require: bool = False) -> None:
    """Force an ``n_devices``-device virtual CPU backend.

    Must run before the CPU backend is first initialized. ``require=True``
    raises if the backend came up with fewer devices (it was initialized
    too early for the flag to take effect).
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    if require:
        ndev = len(jax.devices())
        if ndev < n_devices:
            raise RuntimeError(
                f"needed {n_devices} CPU devices but the backend has {ndev};"
                f" it was initialized before xla_force_host_platform_device_"
                f"count could take effect — set XLA_FLAGS in the environment."
            )


_CACHE_DIR = os.environ.get(
    "BLOCKCG_COMPILE_CACHE", "/root/repo/.jax_compile_cache"
)


def enable_compilation_cache() -> str | None:
    """Point JAX's persistent compilation cache at a repo-local directory.

    Round-3 measured cost of NOT doing this: 346 s to compile the
    ring-in-while-loop solve per shape, 519-777 s cold for full-size
    config 5, 752 s for a 16k-row CG preset — every chip-queue item paid
    it again in every process (VERDICT r3 weak 4). The cache persists
    compiled executables across processes; entry thresholds are zeroed so
    even small programs (the ~30 s first-jit tunnel cost) are amortized.

    Call before the first jit. Returns the cache dir, or None if the
    running jax cannot enable it. ``BLOCKCG_NO_COMPILE_CACHE=1`` disables
    (debugging valve: stale-cache suspicion during kernel surgery).
    """
    if os.environ.get("BLOCKCG_NO_COMPILE_CACHE"):
        return None
    import jax

    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover — older/newer config key drift
        return None
    return _CACHE_DIR


def lsq_slope(points: dict) -> float:
    """Least-squares slope of {loop_length: seconds} — the chained-loop
    timing methodology (BASELINE.md): the marginal per-iteration cost with
    the fixed per-dispatch overhead cancelled."""
    xs = [float(n) for n in points]
    ys = [points[n] for n in points]
    xb = sum(xs) / len(xs)
    yb = sum(ys) / len(ys)
    return (sum((x - xb) * (y - yb) for x, y in zip(xs, ys))
            / sum((x - xb) ** 2 for x in xs))
