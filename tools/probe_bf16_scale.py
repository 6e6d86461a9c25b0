"""bf16-vs-f32 A/B at the size where bandwidth matters (VERDICT r3 item 8).

Round 3 compared the tiers only at 262k rows (scale 0.25), where dispatch
overhead and VMEM residency flatten the difference (+16% throughput measured
against a 2x bandwidth story). This probe runs the A/B at >=2.1M rows (128^3,
k in {32, 64}) — squarely in the HBM-streaming regime — and reports, per
(k, tier):

  1. donated-apply SpMM throughput (Gnnz/s) — the raw 2x-bytes effect;
  2. iterations to a matched tol=5e-3 (above the bf16 relres floor, so both
     tiers can hit it with a plain solve) — the precision cost in iteration
     count;
  3. time-to-1e-6 at matched ACCURACY: f32 plain solve_sbcgrq vs the bf16
     tier's intended deployment (solve_refined: bf16 inner solves, f32
     residual rebases) — the number that picks the default tier.

Timing per BASELINE.md rules: warm best-of-3, forced value fetches.
Run on the real chip; --cpu smoke-checks plumbing at 32^3.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _best_of(fn, trials=3):
    best = float("inf")
    out = None
    for _ in range(trials):
        t0 = time.time()
        out = fn()
        best = min(best, time.time() - t0)
    return best, out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=128, help="3D grid edge")
    ap.add_argument("--ks", type=int, nargs="+", default=[32, 64])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip-solves", action="store_true",
                    help="apply-throughput arms only")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import blockcg_tpu as bc
    from blockcg_tpu.problems import laplacian_dia
    from bench import measure_apply

    dims = (args.dim,) * 3
    n = dims[0] * dims[1] * dims[2]
    print(json.dumps({"probe": "bf16_scale", "n": n,
                      "device": str(jax.devices()[0].device_kind)}),
          flush=True)

    rng = np.random.default_rng(7)
    for k in args.ks:
        B32 = jnp.asarray(rng.standard_normal((n, k)), dtype=jnp.float32)
        for tier in ("f32", "bf16"):
            dtype = jnp.float32 if tier == "f32" else jnp.bfloat16
            op = laplacian_dia(dims, dtype=dtype)
            Xt = op.to_internal(B32.T.astype(dtype))

            dt = measure_apply(op, Xt, donate=True)
            rec = {"probe": "bf16_scale", "case": "apply", "k": k,
                   "tier": tier, "apply_ms": round(dt * 1e3, 4),
                   "gnnzs": round(op.nnz / dt / 1e9, 2)}
            print(json.dumps(rec), flush=True)
            del Xt

            if args.skip_solves:
                continue

            # (2) iterations at matched tol above the bf16 floor
            B = B32.astype(dtype)
            X, info = bc.solve_sbcgrq(op, B, tol=5e-3)
            _ = int(info.iterations)  # warm
            t_plain, (X, info) = _best_of(
                lambda: _fetch(bc.solve_sbcgrq(op, B, tol=5e-3)))
            print(json.dumps({
                "probe": "bf16_scale", "case": "plain_5e-3", "k": k,
                "tier": tier, "seconds": round(t_plain, 4),
                "iterations": int(info.iterations),
                "max_relres": float(jnp.max(info.relres)),
                "gnnzs": round(op.nnz * int(info.iterations) * k
                               / t_plain / 1e9, 2)}), flush=True)
            del X, B

            # (3) time-to-1e-6 at matched accuracy
            if tier == "f32":
                X, info = bc.solve_sbcgrq(op, B32, tol=1e-6)
                _ = int(info.iterations)
                t_acc, (X, info) = _best_of(
                    lambda: _fetch(bc.solve_sbcgrq(op, B32, tol=1e-6)))
                iters, relres = int(info.iterations), float(jnp.max(info.relres))
            else:
                X, info = bc.solve_refined(op, B32, tol=1e-6, inner_tol=5e-3)
                _ = int(info.iterations)
                t_acc, (X, info) = _best_of(
                    lambda: _fetch(bc.solve_refined(op, B32, tol=1e-6,
                                                    inner_tol=5e-3)))
                iters, relres = int(info.iterations), float(jnp.max(info.relres))
            print(json.dumps({
                "probe": "bf16_scale", "case": "to_1e-6", "k": k,
                "tier": tier, "seconds": round(t_acc, 4),
                "iterations": iters, "max_relres": relres}), flush=True)
            del X, op


def _fetch(pair):
    X, info = pair
    _ = int(info.iterations)
    return X, info


if __name__ == "__main__":
    main()
