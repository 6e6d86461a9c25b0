#!/usr/bin/env python
"""Post-outage chip probes (round 3, new axon plugin dated 2026-08-18).

Two regressions appeared with the replaced PJRT plugin
(/opt/axon/libaxon_pjrt.so, mtime 2026-08-18 13:05 — swapped during the
2-day tunnel outage):

1. MIXED-DTYPE APPLY: solve_refined_lean's outer residual (f32 field
   through a bf16-diags operator) flooded at ~1.7e-3 on chip while the
   true residual was 2.6e-7 (CHIP_QUEUE_r3.log config5 steps). Interpret
   mode is exact, CPU converges — chip-only. Probe: compare the mixed
   Pallas apply against the XLA fallback and the f32-widened Pallas apply
   on identical data, on the chip.

2. CONFIG-3 STENCIL SLOWDOWN: the f32 64^3 k=32 stencil apply measured
   0.080 ms (round 1, old plugin; bit-identical kernel code in f32) but
   0.241 ms today. Dirac const-hop is unchanged (67.5 Gnnz/s both days),
   so the chip is fine; suspect Mosaic scheduling of this kernel changed.
   Probe: sweep plan shapes (R, H split) and the gram-fused variant to
   find what the new compiler likes.

Usage (real chip): python tools/probe_r3_regression.py [--skip-sweep]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def probe_mixed_dtype(shape=(32, 32, 32), k=32):
    from blockcg_tpu.operators.base import astype as op_astype
    from blockcg_tpu.problems import laplacian_dia

    op16 = laplacian_dia(shape, dtype=jnp.bfloat16)
    op32 = op_astype(op16, jnp.float32)
    rng = np.random.default_rng(0)
    Xt = jnp.asarray(rng.standard_normal((k, op16.n)), dtype=jnp.float32)

    y_mixed = np.asarray(op16.matmat_t(Xt), np.float64)  # Pallas on chip
    y_f32 = np.asarray(op32.matmat_t(Xt), np.float64)    # pure-f32 Pallas
    y_xla = np.asarray(op16._matmat_t_xla(Xt), np.float64)

    ref = np.abs(y_f32).max()
    rec = {
        "probe": "mixed_dtype_apply",
        "n": op16.n, "k": k,
        "max_rel_err_mixed_vs_f32": float(np.abs(y_mixed - y_f32).max() / ref),
        "max_rel_err_xla_vs_f32": float(np.abs(y_xla - y_f32).max() / ref),
        "note": "f32 field through bf16-diags operator; >1e-6 on the mixed "
                "row = the chip Pallas mixed-dtype path is wrong (the lean "
                "fix routes outer applies through the f32-widened op "
                "regardless)",
    }
    print(json.dumps(rec), flush=True)
    return rec


def probe_stencil_sweep(shape=(64, 64, 64), k=32):
    """Per-plan apply timing for the config-3 stencil under the new plugin."""
    from bench import measure_apply
    from blockcg_tpu.ops import stencil
    from blockcg_tpu.problems import laplacian_dia

    op = laplacian_dia(shape, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    Xt = jnp.asarray(rng.standard_normal((k, op.n)), dtype=jnp.float32)

    # Baseline: current planner's choice through the operator.
    p = stencil.plan(op.n, k, op.offsets)
    dt = measure_apply(op, Xt)
    print(json.dumps({
        "probe": "stencil_plan_current", "R": p.R, "H": p.H,
        "far": list(p.far), "x_reads": p.x_reads,
        "apply_ms": round(dt * 1e3, 4),
        "gnnzs": round(op.nnz / dt / 1e9, 2),
    }), flush=True)

    # Sweep: force alternative (R, H) pairs by monkeypatching the planner.
    n = op.n
    orig_plan = stencil.plan
    candidates = []
    for R in (128, 256, 512, 1024, 2048, 4096, 8192):
        for H in (0, 128, 256, 512, 1024, 4096):
            if n % R or (H and R % H):
                continue
            near = tuple(o for o in op.offsets if abs(o) <= H)
            far = tuple(o for o in op.offsets if abs(o) > H and o % R == 0)
            if len(near) + len(far) != len(op.offsets):
                continue
            cand = stencil.StencilPlan(R, H, far, near)
            # VMEM estimate from the planner's model
            win = max(k, 8) * (R + 2 * H)
            vmem = 4 * (2 * win + win + 2 * len(far) * max(k, 8) * R
                        + 2 * max(k, 8) * R + 2 * max(len(op.offsets), 8) * R)
            if vmem <= stencil._VMEM_BUDGET:
                candidates.append(cand)
    out = []
    for cand in candidates:
        stencil.plan = lambda *a, _c=cand, **kw: _c
        try:
            jax.clear_caches()
            dt = measure_apply(op, Xt)
            rec = {
                "probe": "stencil_plan_sweep", "R": cand.R, "H": cand.H,
                "nfar": len(cand.far), "x_reads": cand.x_reads,
                "apply_ms": round(dt * 1e3, 4),
                "gnnzs": round(op.nnz / dt / 1e9, 2),
            }
            out.append(rec)
            print(json.dumps(rec), flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must survive bad plans
            print(json.dumps({
                "probe": "stencil_plan_sweep", "R": cand.R, "H": cand.H,
                "error": str(e)[:120],
            }), flush=True)
        finally:
            stencil.plan = orig_plan
    if out:
        best = min(out, key=lambda r: r["apply_ms"])
        print(json.dumps({"probe": "stencil_sweep_best", **best}), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--skip-sweep", action="store_true")
    args = ap.parse_args()
    probe_mixed_dtype()
    if not args.skip_sweep:
        probe_stencil_sweep()


if __name__ == "__main__":
    main()
