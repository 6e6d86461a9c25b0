"""Full-size config 5 on ONE chip — the bf16-field capacity run.

BASELINE.json configs[4]: 3D Laplacian 256^3 (16.7M rows), 64 RHS, SBCGrQ.
Full size exceeds single-chip HBM in f32 (5 live k=64 f32 fields = 21 GB);
this script runs it via the memory-lean composition (solve_refined_lean):

- operator diagonals bf16 (Laplacian entries 0/-1/6 are EXACT in bf16);
- inner SBCGrQ solves with bf16 fields (f32 in-kernel accumulation,
  ops/fused.py + ops/stencil.py), on 32-wide column slices;
- f32 lanes-major outer accumulator, donated through cycles;
- B regenerated on device from a fixed PRNG key each cycle (never stored).

Memory budget at full size (n = 16,777,216, k = 64; GB = 2^30 B):

    operator diags (7, n) bf16          0.22 GB   persistent
    outer X (64, n) f32                 4.00 GB   persistent
    cycle:  Z = A X temp (64, n) f32    4.00 GB   transient
            B (64, n) bf16              2.00 GB   transient (regenerated)
            Rn (64, n) bf16             2.00 GB   lives into the inner
    inner (kb = 32): 6 bf16 fields      6.00 GB   transient
    ----------------------------------------------------------------
    peak ~ 12.2 GB (cycle) / 12.2 GB (inner)      < 16 GB HBM

Usage: python bench_config5.py [--scale S] [--tol T] [--kb KB]
Prints one JSON line per run; --scale 1.0 is the full-size row.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0,
                    help="linear scale of the 256^3 grid (0.25 -> 64^3)")
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--kb", type=int, default=32,
                    help="inner solve column-block width")
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--inner-tol", type=float, default=5e-3)
    ap.add_argument("--max-cycles", type=int, default=12)
    ap.add_argument("--inner-max-iter", type=int, default=3000)
    ap.add_argument("--deflate", action="store_true",
                    help="converged-column deflation in the lean inner "
                         "slices (lanes-major width-halving driver; "
                         "VERDICT r4 item 8 capacity A/B)")
    ap.add_argument("--verify", action="store_true",
                    help="host f64 true-residual check (scale <= 0.5 only: "
                    "needs an (n, k) f64 host matmul)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke runs; the default "
                    "targets the real chip and BLOCKS if the tunnel is down)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from blockcg_tpu.problems import laplacian_dia
    from blockcg_tpu.solvers.refine import solve_refined_lean

    L = int(round(256 * args.scale))
    shape = (L, L, L)
    op = laplacian_dia(shape, dtype=jnp.bfloat16)
    n = op.n
    key = jax.random.PRNGKey(1729)

    t0 = time.perf_counter()
    X, info = solve_refined_lean(
        op, key, args.k, tol=args.tol, inner_tol=args.inner_tol,
        max_cycles=args.max_cycles, inner_max_iter=args.inner_max_iter,
        inner_block=args.kb, deflate=args.deflate, verbose=True,
    )
    jax.block_until_ready(X)
    wall = time.perf_counter() - t0
    # Free the cold run's 4 GB accumulator BEFORE the warm one allocates —
    # holding both OOM'd the full-size run (CHIP_QUEUE_r3.log 14:10,
    # RESOURCE_EXHAUSTED on the warm re-run).
    del X, info
    # warm re-run (compiles cached) for the honest time-to-tol
    t0 = time.perf_counter()
    X, info = solve_refined_lean(
        op, key, args.k, tol=args.tol, inner_tol=args.inner_tol,
        max_cycles=args.max_cycles, inner_max_iter=args.inner_max_iter,
        inner_block=args.kb, deflate=args.deflate,
    )
    jax.block_until_ready(X)
    warm = time.perf_counter() - t0

    rec = {
        "bench": "config5_capacity",
        "shape": list(shape),
        "n": n,
        "k": args.k,
        "kb": args.kb,
        "scale": args.scale,
        "tol": args.tol,
        "cycles": int(info.iterations),
        "matvecs": int(info.matvecs),
        "max_relres": float(jnp.max(info.relres)),
        "converged": bool(info.converged.all()),
        "wall_cold_s": round(wall, 3),
        "wall_warm_s": round(warm, 3),
        "field_dtype": "bfloat16",
        "outer_dtype": "float32",
        "deflate": bool(args.deflate),
    }
    if args.verify and args.scale <= 0.5:
        from blockcg_tpu.problems import laplacian_scipy

        a = laplacian_scipy(shape)
        B = np.asarray(
            jax.random.normal(key, (args.k, n), jnp.float32)
            .astype(jnp.bfloat16).astype(jnp.float32)).T.astype(np.float64)
        R = a @ np.asarray(X, np.float64) - B
        rec["true_relres"] = float(
            (np.linalg.norm(R, axis=0) / np.linalg.norm(B, axis=0)).max())
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
