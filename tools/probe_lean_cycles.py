#!/usr/bin/env python
"""Diagnose the config-5 stagnant-cycle alternation (VERDICT r4 item 4).

The full-size run contracts ~30x on odd cycles and only ~1.2x on even ones
(CHIP_QUEUE_r4.log:218-221) — ~500 of 2132 matvecs burn in near-no-op
cycles. This probe reproduces the alternation at small scale (CPU-safe) and
prints the PER-COLUMN relres trajectory, which the production driver's
``max`` reporting hides, plus per-slice assignments — separating the
candidate mechanisms:

  (a) a column-population effect (a few laggard columns alternate while the
      rest contract steadily; max tracks the laggards),
  (b) a genuine all-column alternation (every column stalls together), and
  (c) a kb-slicing artifact (laggards cluster in one slice).

Variants: --kb (slice width; kb=k disables slicing), --dtype f32 (is it a
bf16-tier effect?), --inner-tol.

Usage: python tools/probe_lean_cycles.py --cpu --dim 48 --k 8 --kb 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=48)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--kb", type=int, default=4)
    ap.add_argument("--dtype", choices=("bf16", "f32"), default="bf16")
    ap.add_argument("--inner-tol", type=float, default=5e-3)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-cycles", type=int, default=10)
    ap.add_argument("--qr-passes", type=int, default=1)
    ap.add_argument("--replace-every", type=int, default=0,
                    help="in-loop residual replacement period for the "
                         "INNER solves (the drift-control hypothesis: on "
                         "smooth RHS the inner's recursive residual "
                         "diverges from truth in bf16, so its claimed tol "
                         "is fiction and the cycle stalls)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from blockcg_tpu.problems import laplacian_dia
    from blockcg_tpu.solvers.refine import _lean_cycle
    from blockcg_tpu.solvers.sbcgrq import _sbcgrq_impl
    from blockcg_tpu.operators.base import astype as op_astype

    cdt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    op = laplacian_dia((args.dim,) * 3, dtype=cdt)
    op_out = op if cdt == jnp.float32 else op_astype(op, jnp.float32)
    n, k, kb = op.n, args.k, args.kb
    key = jax.random.PRNGKey(0)

    print(json.dumps({"probe": "lean_cycles", "dim": args.dim, "n": n,
                      "k": k, "kb": kb, "dtype": args.dtype,
                      "inner_tol": args.inner_tol,
                      "qr_passes": args.qr_passes}), flush=True)

    Xt = jnp.zeros((k, n), jnp.float32)
    Dt = jnp.zeros((k, n), cdt)
    scale = jnp.ones((k,), jnp.float32)
    total_inner = 0
    for cycles in range(args.max_cycles + 1):
        Xt, Rn, scale, relres = _lean_cycle(
            op_out, Xt, Dt, scale, key, k, jnp.dtype(jnp.bfloat16),
            jnp.dtype(cdt))
        rr = np.asarray(relres, np.float64)
        print(json.dumps({
            "cycle": cycles, "max": f"{rr.max():.3e}",
            "min": f"{rr.min():.3e}", "med": f"{np.median(rr):.3e}",
            "argmax": int(rr.argmax()), "argmax_slice": int(rr.argmax()) // kb,
            "per_col": [f"{v:.2e}" for v in rr],
        }), flush=True)
        if rr.max() <= args.tol:
            break
        if cycles == args.max_cycles:
            break
        parts = []
        for jj in range(k // kb):
            Bs = Rn[jj * kb:(jj + 1) * kb]
            Dj, info_j = _sbcgrq_impl(
                op, Bs, jnp.zeros((kb, n), cdt), args.inner_tol,
                2000, qr_passes=args.qr_passes,
                replace_every=args.replace_every,
                axis_name=None, record_history=False)
            print(json.dumps({
                "cycle": cycles, "slice": jj, "inner_iters":
                    int(info_j.iterations),
                "inner_relres": f"{float(jnp.max(info_j.relres)):.3e}"}),
                flush=True)
            parts.append(Dj)
            total_inner += int(info_j.matvecs)
        Dt = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    print(json.dumps({"probe": "lean_cycles", "summary": True,
                      "inner_tol": args.inner_tol, "kb": kb,
                      "replace_every": args.replace_every,
                      "cycles": cycles, "total_inner_matvecs": total_inner,
                      "final_max_relres": f"{float(rr.max()):.3e}"}),
          flush=True)


if __name__ == "__main__":
    main()
