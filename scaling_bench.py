#!/usr/bin/env python
"""Weak-scaling benchmark — north-star: >= 80 % efficiency at N >= 2 hosts.

Row-partitioned SBCGrQ on a 3D Laplacian whose row count grows with the
device count (constant work per device), timed per iteration. On a pod
slice, launch one process per host with the usual coordinator variables and
add ``--distributed``; this script then calls ``jax.distributed.initialize``
and the SAME code runs SPMD over all chips (mesh over ICI within a host,
DCN across hosts) — the solver code is device-count agnostic (SURVEY.md §8
hard part 5).

This sandbox has ONE real chip, so true scaling curves cannot be measured
here; what CAN be validated everywhere:
  - the full sharded program (halo ppermute + interior kernel + psum Gram)
    compiles and matches the single-device solve (tests/test_distributed.py,
    tests/test_dist_cbdia.py, fake 8-device CPU mesh);
  - the communication volume model printed below: per iteration each device
    sends 2 halos (k x bw x 4 B) + three k x k psums — independent of n/D,
    so weak scaling is communication-bound only when
    t_halo ~ 2*k*bw*4 / BW_ici exceeds the overlappable interior SpMM time.

Usage:
  python scaling_bench.py                  # single process, all local devices
  python scaling_bench.py --devices 4
  python scaling_bench.py --distributed --coordinator host0:1234 \
      --num-processes 8 --process-id $ID    # one per host on a pod
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", type=int, default=None,
                    help="limit local device count (default: all)")
    ap.add_argument("--base-shape", type=int, nargs=3, default=(64, 64, 64),
                    help="per-device 3D Laplacian block (z grows with D)")
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--iters", type=int, default=300,
                    help="fixed iteration count (>= 200: this sandbox's "
                         "tunnel adds ~0.5 s fixed dispatch per sharded call)")
    ap.add_argument("--distributed", action="store_true")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    import os

    if args.distributed:
        # Pod runs: make sure the async collective-permute path is on so the
        # halo exchange can overlap the interior kernel (bench_comm.py's
        # overlap check is the validator; these are the defaults on recent
        # libtpu, asserted here so a regression is visible in the flags).
        flags = os.environ.get("LIBTPU_INIT_ARGS", "")
        for f in ("--xla_tpu_enable_async_collective_permute=true",):
            if f not in flags:
                flags = (flags + " " + f).strip()
        os.environ["LIBTPU_INIT_ARGS"] = flags

    import jax

    if args.distributed:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    elif os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # This sandbox pre-imports jax with the TPU platform pinned by a
        # sitecustomize hook; the env var alone does not stick (see
        # __graft_entry__._ensure_cpu_mesh). Honor a requested CPU run.
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from blockcg_tpu.parallel import partition_dia, row_mesh, solve_sbcgrq_dist
    from blockcg_tpu.problems import laplacian_dia

    ndev = args.devices or len(jax.devices())
    if ndev > len(jax.devices()):
        raise SystemExit(
            f"--devices {ndev} > {len(jax.devices())} available on this "
            f"backend ({jax.default_backend()}). For a fake multi-device "
            "CPU mesh run with XLA_FLAGS="
            "--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu "
            "(row_mesh(D) on fewer real devices otherwise fails deep in "
            "sharding with a confusing broadcast-shape error).")
    bz, by, bx = args.base_shape
    results = []
    for D in [d for d in (1, 2, 4, 8, 16, 32) if d <= ndev]:
        # weak scaling: z-extent grows with D -> n/D constant
        shape = (bz * D, by, bx)
        op = laplacian_dia(shape, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        B = jnp.asarray(rng.standard_normal((op.n, args.k)), dtype=jnp.float32)
        mesh = row_mesh(D)
        dop = partition_dia(op, D)
        # fixed-iteration run (tol=0 would never stop; use tiny tol + cap)
        t0 = time.time()
        X, info = solve_sbcgrq_dist(dop, B, mesh, tol=1e-30,
                                    max_iter=args.iters)
        it = int(info.iterations)
        compile_s = time.time() - t0
        t0 = time.time()
        X, info = solve_sbcgrq_dist(dop, B * 1.000001, mesh, tol=1e-30,
                                    max_iter=args.iters)
        it = int(info.iterations)
        wall = time.time() - t0
        per_iter = wall / max(it, 1)
        halo_bytes = 2 * args.k * dop.bw * 4
        rec = {
            "devices": D,
            "n": op.n,
            "rows_per_device": op.n // D,
            "iters": it,
            "s_per_iter": round(per_iter, 6),
            "halo_bytes_per_dev_per_iter": halo_bytes,
            "compile_s": round(compile_s, 2),
        }
        if results:
            rec["weak_scaling_eff"] = round(
                results[0]["s_per_iter"] / per_iter, 4
            )
        results.append(rec)
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
