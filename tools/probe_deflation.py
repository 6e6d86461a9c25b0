"""Deflation A/B: wall-time, not just column-passes (VERDICT r2 weak 4).

Round 2 asserted converged-column deflation's win in matvec COLUMN-passes
(>=15% cut on spread-RHS); the open risk is that width-halving restarts
(one extra SpMM + a cached compile each) lose wall-time anyway. This probe
times the fixed-width solve against the deflated solve on a problem whose
RHS convergence is genuinely spread (columns scaled across 3 decades, so
half the block converges early), warm-timed best-of-3 with value fetches.

Emits one JSON line per arm. Run on the real chip (chip queue);
--cpu gives a methodology smoke run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=64, help="3D grid edge")
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import blockcg_tpu as bc
    from blockcg_tpu.problems import laplacian_dia

    op = laplacian_dia((args.dim,) * 3, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    B = rng.standard_normal((op.n, args.k)).astype(np.float32)
    # Spread the per-column convergence the way the deflation fixture does
    # (tests/test_deflate.py::_spread_rhs): half the columns are single
    # analytic 3D Laplacian eigenmodes — a Krylov method retires each in a
    # couple of iterations, and mid-spectrum modes span almost no useful
    # directions for the dense random (hard) half, so deflating them loses
    # little shared-Krylov benefit. (The round-3 first cut smoothed random
    # vectors with Richardson steps instead; that concentrates columns on
    # the dense low-lambda CLUSTER, which is slow for CG — the measured
    # col_cut was only 4%, CHIP_QUEUE_r3.log deflation-ab.)
    d = args.dim
    ii = np.arange(d).reshape(-1, 1, 1) + 1.0
    jj = np.arange(d).reshape(1, -1, 1) + 1.0
    ll = np.arange(d).reshape(1, 1, -1) + 1.0

    def eig(p, q, r):
        v = (np.sin(np.pi * p * ii / (d + 1))
             * np.sin(np.pi * q * jj / (d + 1))
             * np.sin(np.pi * r * ll / (d + 1)))
        return (v / np.linalg.norm(v)).reshape(-1)

    modes = [(p, q, r) for p in range(2, 5) for q in range(2, 4)
             for r in range(2, 5)]
    for j in range(args.k // 2):
        B[:, j] = eig(*modes[j % len(modes)])
    B[:, args.k // 2:] /= np.linalg.norm(B[:, args.k // 2:], axis=0,
                                         keepdims=True)
    B = jnp.asarray(B, jnp.float32)

    def timed(label, fn, **kw):
        X, info = fn(op, B, tol=args.tol, max_iter=3000, **kw)
        jax.block_until_ready(X)
        _ = float(jnp.max(info.relres))  # force
        best = float("inf")
        for t in range(3):
            bs = B * (1.0 + 1e-6 * (t + 1))
            _ = float(jnp.sum(bs))
            t0 = time.time()
            X, info = fn(op, bs, tol=args.tol, max_iter=3000, **kw)
            _ = float(jnp.max(info.relres))
            best = min(best, time.time() - t0)
        rec = {"probe": "deflation_ab", "arm": label,
               "n": op.n, "k": args.k, "tol": args.tol,
               "seconds": round(best, 4),
               "iterations": int(info.iterations),
               "matvecs": int(info.matvecs),
               "converged": bool(info.converged.all())}
        if info.matvec_cols is not None:
            rec["matvec_cols"] = int(info.matvec_cols)
        print(json.dumps(rec), flush=True)
        return rec

    fixed = timed("fixed", bc.solve_sbcgrq)
    defl = timed("deflated", bc.solve_sbcgrq_deflated)
    print(json.dumps({
        "probe": "deflation_ab", "arm": "verdict",
        "speedup": round(fixed["seconds"] / max(defl["seconds"], 1e-9), 3),
        "col_cut": round(1 - defl.get("matvec_cols", 0)
                         / max(fixed["matvecs"] * args.k, 1), 3),
    }), flush=True)


if __name__ == "__main__":
    main()
