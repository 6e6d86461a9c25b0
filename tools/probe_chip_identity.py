#!/usr/bin/env python
"""Pin down what the attached TPU actually is (round 3).

Motivation: every careful stencil measurement implies effective HBM
bandwidth ABOVE the v5e spec (819 GB/s): config-3 apply 0.083-0.09 ms at
~108 MB modeled traffic is ~1.2-1.3 TB/s (BASELINE.md round-1 notes, and
again CHIP_QUEUE_r3b.log). Either (a) the roofline's traffic model
overcounts, (b) the loop-differencing timing is biased low, or (c) the
chip is not v5e-class despite the "TPU v5 lite" device label (v6e is
1.64 TB/s + 32 GB HBM). This probe separates those:

  1. device attributes + memory_stats (HBM capacity: v5e 16 GB, v6e 32 GB)
  2. long-loop triad bandwidth, per-length MIN then one slope fit
     (the min-of-3-slope-fits in bench.py biases low when loops are short)
  3. dense bf16 and f32 matmul TFLOPs (v5e peak ~197 bf16; v6e ~918 bf16)

Run on the real chip: python tools/probe_chip_identity.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def _fit_min(times_by_len):
    """Least-squares slope over per-length minima."""
    ns = np.array(sorted(times_by_len))
    ts = np.array([times_by_len[n] for n in ns])
    A = np.stack([ns, np.ones_like(ns)], axis=1)
    slope, _ = np.linalg.lstsq(A, ts, rcond=None)[0]
    return float(slope)


def probe_device():
    d = jax.devices()[0]
    rec = {"probe": "device", "device_kind": getattr(d, "device_kind", "?"),
           "platform": d.platform}
    try:
        ms = d.memory_stats()
        rec["bytes_limit_gb"] = round(ms.get("bytes_limit", 0) / 2**30, 2)
        rec["bytes_in_use_gb"] = round(ms.get("bytes_in_use", 0) / 2**30, 3)
    except Exception as e:  # noqa: BLE001
        rec["memory_stats_error"] = str(e)[:120]
    print(json.dumps(rec), flush=True)
    return rec


def probe_triad(n_lanes=4 * 1024 * 1024, k=32, lengths=(8, 136, 264),
                trials=9):
    """y <- u + 0.5 y chained: 2 reads + 1 write per iteration."""
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.standard_normal((k, n_lanes)), jnp.float32)
    Y0 = jnp.asarray(rng.standard_normal((k, n_lanes)), jnp.float32)

    compiled = {}
    for n in lengths:
        def loop(u, y, n=n):
            return jax.lax.fori_loop(
                0, n, lambda i, yy: jax.lax.optimization_barrier(u + 0.5 * yy),
                y)
        compiled[n] = jax.jit(loop).lower(U, Y0).compile()

    best = {n: float("inf") for n in lengths}
    for t in range(trials):
        for n in lengths:
            t0 = time.time()
            y = compiled[n](U, Y0)
            _ = float(jnp.sum(y))
            best[n] = min(best[n], time.time() - t0)
    slope = _fit_min(best)
    bw = 3 * 4 * k * n_lanes / slope / 1e9
    rec = {"probe": "triad_bw", "bytes_per_iter_mb":
           round(3 * 4 * k * n_lanes / 2**20, 1),
           "s_per_iter": round(slope, 6), "gbs": round(bw, 1),
           "per_len_best_s": {str(n): round(best[n], 4) for n in lengths}}
    print(json.dumps(rec), flush=True)
    return rec


def probe_matmul(m=8192, dtype="bf16", lengths=(2, 10, 18), trials=5):
    dt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.standard_normal((m, m)), dt)
    B0 = jnp.asarray(rng.standard_normal((m, m)), dt)

    compiled = {}
    for n in lengths:
        def loop(a, b, n=n):
            def body(i, bb):
                c = jax.lax.dot(a, bb, precision=jax.lax.Precision.DEFAULT,
                                preferred_element_type=jnp.float32)
                # rescale so values stay finite; tiny VPU cost
                return (c * (1.0 / m)).astype(a.dtype)
            return jax.lax.fori_loop(0, n, body, b)
        compiled[n] = jax.jit(loop).lower(A, B0).compile()

    best = {n: float("inf") for n in lengths}
    for t in range(trials):
        for n in lengths:
            t0 = time.time()
            y = compiled[n](A, B0)
            _ = float(jnp.sum(y.astype(jnp.float32)))
            best[n] = min(best[n], time.time() - t0)
    slope = _fit_min(best)
    tflops = 2 * m**3 / slope / 1e12
    rec = {"probe": "matmul_tflops", "dtype": dtype, "m": m,
           "s_per_matmul": round(slope, 5), "tflops": round(tflops, 1)}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    probe_device()
    probe_triad()
    probe_matmul(dtype="bf16")
    probe_matmul(dtype="f32")


if __name__ == "__main__":
    main()
