#!/usr/bin/env python
"""Comm microbenchmarks (SURVEY.md §3.4) — halo/psum latency + overlap check.

Measures, over a D-device mesh (the fake 8-device CPU mesh in this sandbox;
unchanged on a real pod slice where the same collectives ride ICI):

  ppermute   ring halo exchange latency vs halo width (rows), k fixed —
             the per-iteration boundary traffic of the row-sharded SpMM
             (parallel/halo.py ring_halos).
  psum       k x k Gram all-reduce latency vs k — the only other
             per-iteration collective in the solvers (Grams are contracted
             to k x k BEFORE the psum; see solvers/common.py).
  overlap    decomposition of the distributed DIA apply into interior-only
             and halo-only timings: full ~= max(parts) means the compiler
             overlapped the interior kernel with the halo exchange,
             full ~= sum(parts) means it serialized them (SURVEY.md §8 hard
             part 3). Also inspects the compiled HLO schedule for ops
             placed between collective-permute-{start,done} (async overlap
             as scheduled, independent of timing noise) and can dump a
             jax.profiler trace (--trace DIR) for manual inspection.

Timing uses chained-loop least-squares slopes (same methodology as bench.py:
cancels per-dispatch overhead; every timed region force-fetches a value).

Usage: python bench_comm.py [--devices 8] [--k 32] [--trace DIR] [--out F]
Emits one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _slope(compiled, make_arg, lengths, trials=3, pre=()):
    """Least-squares slope of best-of-``trials`` wall times vs loop length."""
    import jax.numpy as jnp
    from blockcg_tpu.utils.platform import lsq_slope

    best = {}
    for n in lengths:
        b = float("inf")
        for t in range(trials):
            x = make_arg(1.0 + 1e-6 * (t + 1))
            _ = float(jnp.sum(x))
            t0 = time.time()
            y = compiled[n](*pre, x)
            _ = float(jnp.sum(y))
            b = min(b, time.time() - t0)
        best[n] = b
    return max(lsq_slope(best), best[max(lengths)] / max(lengths) * 1e-3)


def _chained(mesh, axis, step, spec, lengths):
    """Compile shard_map'd fori_loops of ``step`` chained N times."""
    import jax
    from jax import lax
    from blockcg_tpu.parallel.api import shard_map

    out = {}
    for n in lengths:
        def body(x, n=n):
            return lax.fori_loop(
                0, n, lambda i, u: lax.optimization_barrier(step(u)), x,
                unroll=False,
            )
        out[n] = jax.jit(shard_map(
            body, mesh=mesh, in_specs=(spec,), out_specs=spec,
            check_vma=True,
        ))
    return out


def bench_ppermute(mesh, axis, k, lengths=(8, 72, 136)):
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from blockcg_tpu.parallel.halo import ring_halos

    D = len(mesh.devices.flat)
    rng = np.random.default_rng(0)
    for bw in (16, 64, 256, 1024):
        nl = 2 * bw

        def step(u, bw=bw):
            hl, hr = ring_halos(u, bw, axis)
            return 0.5 * u + 0.25 * jnp.concatenate([hl, hr], axis=1)

        compiled = _chained(mesh, axis, step, P(None, axis), lengths)
        make = lambda s: jnp.asarray(
            s * rng.standard_normal((k, nl * D)), dtype=jnp.float32)
        dt = _slope(compiled, make, lengths)
        yield {
            "bench": "comm_ppermute", "devices": D, "k": k, "halo_rows": bw,
            "bytes_per_dev": 2 * k * bw * 4, "latency_us": round(dt * 1e6, 2),
            "gbps_per_dev": round(2 * k * bw * 4 / dt / 1e9, 3),
        }


def bench_psum(mesh, axis, lengths=(8, 72, 136)):
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import PartitionSpec as P

    D = len(mesh.devices.flat)
    rng = np.random.default_rng(1)
    for k in (4, 8, 16, 32, 64):
        def step(g, D=D):
            # + 0*g keeps the loop carry device-varying (psum output is
            # axis-invariant, which shard_map's vma check rejects as a
            # fori_loop carry).
            return lax.psum(g, axis) / (2.0 * D) + 0.0 * g

        compiled = _chained(mesh, axis, step, P(axis, None), lengths)
        make = lambda s: jnp.asarray(
            s * rng.standard_normal((D * k, k)), dtype=jnp.float32)
        dt = _slope(compiled, make, lengths)
        yield {
            "bench": "comm_psum", "devices": D, "k": k,
            "bytes": k * k * 4, "latency_us": round(dt * 1e6, 2),
        }


def bench_overlap(mesh, axis, k, trace_dir=None, lengths=(4, 36, 68)):
    """Interior/halo/full decomposition of the distributed DIA apply."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from blockcg_tpu.operators import DIAOperator
    from blockcg_tpu.parallel import partition_dia
    from blockcg_tpu.parallel.halo import ring_halos
    from blockcg_tpu.parallel.api import shard_map
    from blockcg_tpu.problems import laplacian_dia

    D = len(mesh.devices.flat)
    op = laplacian_dia((8 * D, 64, 64), dtype=jnp.float32)
    dop = partition_dia(op, D)
    rng = np.random.default_rng(2)

    def interior_of(op, u):
        return DIAOperator(diags=op.diags_int, offsets=op.offsets).matmat_t(u)

    def halo_of(op, u):
        hl, hr = ring_halos(u, op.bw, axis)
        return u.at[:, : op.bw].add(0.25 * hl).at[:, -op.bw:].add(0.25 * hr)

    from jax import lax

    def chained_with_op(step, lengths):
        # The operator must travel through in_specs (sharded leaves), not a
        # closure (closures broadcast the GLOBAL arrays to every device).
        out = {}
        for n in lengths:
            def body(op, x, n=n):
                return lax.fori_loop(
                    0, n,
                    lambda i, u: lax.optimization_barrier(0.5 * step(op, u)),
                    x, unroll=False,
                )
            out[n] = jax.jit(shard_map(
                body, mesh=mesh, in_specs=(dop.in_specs(), P(None, axis)),
                out_specs=P(None, axis), check_vma=True,
            ))
        return out

    times = {}
    for name, step in (("full", lambda op, u: op.matmat_t(u)),
                       ("interior", lambda op, u: interior_of(op, u)),
                       ("halo", lambda op, u: halo_of(op, u))):
        compiled = chained_with_op(step, lengths)
        make = lambda s: jnp.asarray(
            s * rng.standard_normal((k, op.n)), dtype=jnp.float32)
        times[name] = _slope(compiled, make, lengths, pre=(dop,))

    # Static evidence: does the compiled schedule start the collective
    # before the interior work and finish it after? Count ops between
    # collective-permute start/done in the optimized HLO.
    def one(op_, u):
        return op_.matmat_t(u)

    fn = jax.jit(shard_map(one, mesh=mesh,
                           in_specs=(dop.in_specs(), P(None, axis)),
                           out_specs=P(None, axis), check_vma=True))
    x = jnp.asarray(rng.standard_normal((k, op.n)), dtype=jnp.float32)
    hlo = fn.lower(dop, x).compile().as_text()
    between = 0
    in_flight = 0
    for line in hlo.splitlines():
        ls = line.strip()
        if "collective-permute-start" in ls:
            in_flight += 1
        elif "collective-permute-done" in ls:
            in_flight = max(0, in_flight - 1)
        elif in_flight and (" = fusion" in ls or " = f32" in ls):
            between += 1
    s = times["interior"] + times["halo"]
    m = max(times["interior"], times["halo"])
    ratio = (times["full"] - m) / max(s - m, 1e-12)
    rec = {
        "bench": "comm_overlap", "devices": D, "k": k, "n": op.n,
        "halo_rows": dop.bw,
        "full_us": round(times["full"] * 1e6, 2),
        "interior_us": round(times["interior"] * 1e6, 2),
        "halo_us": round(times["halo"] * 1e6, 2),
        # 0 -> perfectly overlapped (full == max), 1 -> fully serialized
        "serialization": round(float(np.clip(ratio, 0, 2)), 3),
        "hlo_ops_inside_permute_window": between,
        "hlo_async_permute": between > 0,
    }
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            for _ in range(10):
                x = fn(dop, 0.99 * x)
            jax.block_until_ready(x)
        rec["trace_dir"] = trace_dir
    yield rec


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--trace", default=None)
    ap.add_argument("--out", default="PROGRESS_BENCH.jsonl")
    args = ap.parse_args()

    import os

    # Default to the fake CPU mesh WITHOUT touching the default backend
    # first: probing it initializes the (possibly single-chip, possibly
    # tunneled) TPU client, which this sandbox pins via sitecustomize.
    # Set BLOCKCG_COMM_TPU=1 on a real pod slice to use the TPU mesh.
    if not os.environ.get("BLOCKCG_COMM_TPU"):
        from blockcg_tpu.utils.platform import force_cpu_mesh

        force_cpu_mesh(args.devices)
    import jax
    from blockcg_tpu.parallel import row_mesh

    mesh = row_mesh(args.devices)
    axis = "rows"
    for gen in (bench_ppermute(mesh, axis, args.k), bench_psum(mesh, axis),
                bench_overlap(mesh, axis, args.k, args.trace)):
        for rec in gen:
            rec["device"] = str(jax.devices()[0])
            print(json.dumps(rec), flush=True)
            if args.out:
                with open(args.out, "a") as f:
                    f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
