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
