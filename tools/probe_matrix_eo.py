#!/usr/bin/env python
"""Matrix-link even-odd Schur solve vs full-lattice solve on chip.

VERDICT r4 item 1: `dirac_gauged_matrix_eo` (problems/dirac_eo.py) — the
even-odd Schur reduction of the matrix-valued-link (SU(N)-style) gauged
Dirac operator, whose parity hops are general BlockDIAOperators on the
half lattice (the one gauged family the const-hop kernel cannot express)
— landed after round 4's last chip window and has zero hardware evidence.
This probe benchmarks the composition that motivates it: EO halving
(~2x fewer iterations on a ~sqrt-conditioned half-size system) times the
ring block kernel (ops/block_stencil_ring.py) on the half-lattice hops.

Both arms solve the SAME full system A X = B (dirac_gauged_matrix) to the
same tol; correctness is the true full-system residual in host f64.

Usage (real chip): python tools/probe_matrix_eo.py [--L 32] [--k 12]
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


def true_relres(op, X, B) -> float:
    # merged-path apply (the flat (k, n) entry routes the 3D-view kernel,
    # which scoped-vmem-OOMs at small k on this chip — first probe run)
    Ym = op.matmat_t(op.to_internal(jnp.asarray(X).T))
    Y = np.asarray(jax.device_get(op.from_internal(Ym))).T
    R = Y.astype(np.float64) - np.asarray(jax.device_get(B), np.float64)
    b = np.asarray(jax.device_get(B), np.float64)
    return float((np.linalg.norm(R, axis=0)
                  / np.linalg.norm(b, axis=0)).max())


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--L", type=int, default=32)
    ap.add_argument("--k", type=int, default=12)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iter", type=int, default=300)
    ap.add_argument("--diag", action="store_true",
                    help="also time raw apply chains (full vs Schur vs "
                         "single hop) to locate the EO per-iteration cost")
    args = ap.parse_args()

    import blockcg_tpu as bc
    from blockcg_tpu.problems import dirac_gauged_matrix
    from blockcg_tpu.problems.dirac_eo import (
        dirac_gauged_matrix_eo, solve_dirac_eo)

    t0 = time.time()
    full = dirac_gauged_matrix(args.L, m=0.5, dtype=jnp.float32)
    eo = dirac_gauged_matrix_eo(args.L, m=0.5, dtype=jnp.float32)
    build_s = time.time() - t0

    rng = np.random.default_rng(17)
    B = jnp.asarray(rng.standard_normal((full.n, args.k)), jnp.float32)

    # dispatch evidence: which kernel does each arm's hot apply ride?
    m = full.bs * args.k
    Xfull = jax.ShapeDtypeStruct((m, full.ns), jnp.float32)
    Xhalf = jax.ShapeDtypeStruct((m, eo.hop_eo.ns), jnp.float32)
    rec = {
        "probe": "matrix_eo", "L": args.L, "k": args.k, "tol": args.tol,
        "build_s": round(build_s, 1),
        "full_ring": bool(full._use_ring(Xfull)),
        "eo_hop_ring": bool(eo.hop_eo._use_ring(Xhalf)),
        "full_n": full.n, "schur_n": eo.schur.n,
        "device": jax.devices()[0].device_kind,
    }
    print(json.dumps(rec), flush=True)

    arms = {}

    def run(name, solve):
        X, info = solve(B)          # compile + warm
        iters = int(info.iterations)
        rel = true_relres(full, X, B)
        best = float("inf")
        for t in range(3):
            bs_ = B * (1.0 + 1e-6 * (t + 1))   # defeat tunnel result cache
            _ = float(jnp.sum(bs_))            # materialize input
            t0 = time.time()
            X, info = solve(bs_)
            iters = int(info.iterations)       # forced value fetch
            best = min(best, time.time() - t0)
        arms[name] = dict(wall_s=round(best, 4), iters=iters,
                          relres=f"{rel:.2e}")
        print(json.dumps({"probe": "matrix_eo", "arm": name, **arms[name]}),
              flush=True)

    run("full_sbcgrq", lambda b: bc.solve_sbcgrq(
        full, b, tol=args.tol, max_iter=args.max_iter))
    run("eo_schur_sbcgrq", lambda b: solve_dirac_eo(
        eo, b, tol=args.tol, max_iter=args.max_iter))

    if args.diag:
        # Raw apply-chain costs (fresh chains — both arms carry the same
        # while-carry-copy artifact, so the RATIO is honest): where does
        # the EO iteration's 2.4x-per-iteration cost come from?
        from bench import measure_apply

        rngd = np.random.default_rng(3)
        Xf = full.to_internal(jnp.asarray(
            rngd.standard_normal((args.k, full.n)), jnp.float32))
        dtf = measure_apply(full, Xf, lengths=(8, 72, 136))
        print(json.dumps({"probe": "matrix_eo", "arm": "full_apply_chain",
                          "apply_ms": round(dtf * 1e3, 4)}), flush=True)
        Xh = eo.schur.to_internal(jnp.asarray(
            rngd.standard_normal((args.k, eo.schur.n)), jnp.float32))
        dts = measure_apply(eo.schur, Xh, lengths=(8, 72, 136))
        print(json.dumps({"probe": "matrix_eo", "arm": "schur_apply_chain",
                          "apply_ms": round(dts * 1e3, 4)}), flush=True)
        dth = measure_apply(eo.hop_eo, Xh, lengths=(8, 72, 136))
        print(json.dumps({"probe": "matrix_eo", "arm": "single_hop_chain",
                          "apply_ms": round(dth * 1e3, 4)}), flush=True)

    ratio = arms["full_sbcgrq"]["wall_s"] / arms["eo_schur_sbcgrq"]["wall_s"]
    print(json.dumps({"probe": "matrix_eo", "speedup_eo_vs_full":
                      round(ratio, 3)}), flush=True)


if __name__ == "__main__":
    main()
