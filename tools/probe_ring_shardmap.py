#!/usr/bin/env python
"""Ring stencil kernel INSIDE shard_map on real TPU hardware.

VERDICT r4 weak 3: the manual-DMA ring kernel had never executed inside a
shard_map body on a TPU — fake-mesh tests run interpret mode, and the chip
shard_map smoke solves n=256 (far below ring dispatch). This is the
composition a pod actually runs (Pallas manual-DMA + shard_map + ppermute
halos), and the ring family has a documented hardware-only failure class
(in-flight DMA aborts at kernel end). A 1-device mesh exercises the full
machinery — sharding specs, check_vma lowering, ppermute (maps to self),
psum — with the local shard large enough (128^3 = 2.1M rows) that the
interior apply auto-dispatches the ring kernel (dist_ops.DistDIAOperator
reuses DIAOperator dispatch; x_reads ~ 3 at this size).

Done-criterion: ring-in-shard_map solve parity with the single-device
solve (same iteration count +-2, true relres <= tol).

Usage (real chip): python tools/probe_ring_shardmap.py [--dim 128]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--tol", type=float, default=1e-6)
    args = ap.parse_args()

    import blockcg_tpu as bc
    from blockcg_tpu.operators.dia import DIAOperator
    from blockcg_tpu.parallel import partition_dia, row_mesh, solve_sbcgrq_dist
    from blockcg_tpu.problems import laplacian_dia

    op = laplacian_dia((args.dim, args.dim, args.dim), dtype=jnp.float32)
    rng = np.random.default_rng(23)
    B = jnp.asarray(rng.standard_normal((op.n, args.k)), jnp.float32)

    mesh = row_mesh(1)
    dop = partition_dia(op, 1)
    # dispatch evidence: does the INTERIOR operator (what runs inside the
    # shard_map body) ring at the local shard size?
    interior = DIAOperator(diags=dop.diags_int, offsets=dop.offsets)
    Xs_shape = jax.ShapeDtypeStruct((args.k, dop.nl), jnp.float32)
    print(json.dumps({
        "probe": "ring_shardmap", "dim": args.dim, "k": args.k,
        "n": op.n, "interior_ring": bool(interior._use_ring(Xs_shape)),
        "device": jax.devices()[0].device_kind,
    }), flush=True)

    def timed(name, solve):
        t0 = time.time()
        X, info = solve(B)
        iters = int(info.iterations)
        wall = time.time() - t0  # includes compile on first call
        t0 = time.time()
        X, info = solve(B * (1.0 + 1e-6))
        iters = int(info.iterations)
        warm = time.time() - t0
        # Residual on HOST scipy: X returns with the mesh's NamedSharding,
        # and a plain-operator Pallas apply on a mesh-sharded array fails
        # ("pallas_call requires all mesh axes to be Manual") — first run.
        from blockcg_tpu.problems import laplacian_scipy

        a = laplacian_scipy((args.dim,) * 3)
        Xh = np.asarray(jax.device_get(X), np.float64)
        b = np.asarray(jax.device_get(B), np.float64) * (1.0 + 1e-6)
        R = a @ Xh - b
        rel = float((np.linalg.norm(R, axis=0)
                     / np.linalg.norm(b, axis=0)).max())
        print(json.dumps({"probe": "ring_shardmap", "arm": name,
                          "iters": iters, "cold_s": round(wall, 2),
                          "warm_s": round(warm, 3),
                          "true_relres": f"{rel:.2e}"}), flush=True)
        return iters

    it_d = timed("shard_map_1dev", lambda b: solve_sbcgrq_dist(
        dop, b, mesh, tol=args.tol, max_iter=500))
    it_s = timed("single_device", lambda b: bc.solve_sbcgrq(
        op, b, tol=args.tol, max_iter=500, qr_passes=1))
    print(json.dumps({"probe": "ring_shardmap",
                      "iter_delta": abs(it_d - it_s),
                      "parity": abs(it_d - it_s) <= 2}), flush=True)


if __name__ == "__main__":
    main()
