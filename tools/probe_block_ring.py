#!/usr/bin/env python
"""Ring vs windowed general matrix-link block kernel at 32^4 (VERDICT r3
item 7 / BASELINE.md round-4 matrix-link "Open" note).

The round-4 analysis pinned the general block kernel's bound as schedule/
HBM, not VPU: broadcast-FMA attainable is 10.6 TFLOP/s (probe-links-mxu
RESIZED) while the kernel achieves 1.3, and the windowed HBM schedule pays
x_reads ~ 3 plus — in every chained benchmark — one full while-carry field
copy per apply. This probe measures the round-4 fix (the rolling-ring
block kernel, ops/block_stencil_ring.py, x_reads = 1.0) with the
artifact-free methodology:

- ``*_gram_chain`` arms: the timing loop's dependence rides the fused
  (m, m) Gram through the kernels' ``seed`` operand, so the field output Y
  stays loop-local and the chain pays NO carry copy (CLAUDE.md benchmark
  invariant). Legal for PERIODIC operators (nonzero toroidal wraps).
- ``ring_donated`` arm (open BC, wrap_zero): chains the in-place apply —
  the cross-check that the gram-seed methodology and the donation
  methodology agree on kernel cost.
- ``*_fresh`` arms: the old (carry-copy-contaminated) numbers, kept so the
  artifact's size is on the record next to the honest ones.

Usage (real chip): python tools/probe_block_ring.py [--L 32] [--ks 12,16]
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


def models(op, m, calib_gbs, ring_plan, win_plan):
    """Byte models and Gnnz/s ceilings for both schedules."""
    cr = len(op.offsets) * op.bs * op.bs
    it = op.blocks.dtype.itemsize
    fit = 4  # f32 fields in this probe
    ring_bytes = fit * 2 * m * op.ns + it * cr * op.ns
    win_bytes = (fit * m * op.ns * (win_plan.x_reads + 1)
                 + it * cr * op.ns) if win_plan else None
    out = {"ring_ceiling_gnnzs":
           round(calib_gbs * 1e9 * op.nnz / ring_bytes / 1e9, 2)}
    if getattr(op, "fold", ()):
        crf = len(op.fold_offsets) * op.bs * op.bs
        folded_bytes = fit * 2 * m * op.ns + it * crf * op.ns
        out["folded_ceiling_gnnzs"] = round(
            calib_gbs * 1e9 * op.nnz / folded_bytes / 1e9, 2)
    if win_bytes:
        out["windowed_ceiling_gnnzs"] = round(
            calib_gbs * 1e9 * op.nnz / win_bytes / 1e9, 2)
        out["windowed_x_reads"] = round(win_plan.x_reads, 2)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--L", type=int, default=32)
    ap.add_argument("--ks", type=str, default="12,16")
    ap.add_argument("--skip-fresh", action="store_true")
    ap.add_argument("--bf16-blocks", action="store_true",
                    help="also measure ring arms with bf16-stored "
                         "coefficients (f32 fields, f32 in-kernel algebra) "
                         "— the coefficient stream dominates the periodic "
                         "operator's traffic (1088 of 1600 B/site at k=16)")
    args = ap.parse_args()
    ks = tuple(int(s) for s in args.ks.split(","))

    from bench import calibrate_bw, measure_apply, measure_gram_chain
    from blockcg_tpu.ops import block_stencil, block_stencil_ring
    from blockcg_tpu.problems import dirac_gauged_matrix

    import os
    os.environ["BLOCKCG_FOLD"] = "1"  # build folded twins for the probe arms
    calib = calibrate_bw()
    print(json.dumps({"probe": "block_ring", "L": args.L,
                      "calib_gbs": round(calib, 1),
                      "device": jax.devices()[0].device_kind}), flush=True)

    rng = np.random.default_rng(0)
    for bc in ("periodic", "open"):
        op = dirac_gauged_matrix(args.L, m=0.5, bc=bc, dtype=jnp.float32)
        for k in ks:
            m = op.bs * k
            Xm = op.to_internal(jnp.asarray(
                rng.standard_normal((k, op.n)), dtype=jnp.float32))
            rp = block_stencil_ring.plan(op.ns, m, op.bs, op.offsets)
            wp = block_stencil.plan_m(op.ns, m, op.bs, op.offsets)
            base = {"probe": "block_ring", "bc": bc, "L": args.L, "k": k,
                    "m": m, "ring_R": rp.R if rp else None,
                    "ring_S": rp.S if rp else None}
            base.update(models(op, m, calib, rp, wp))

            # correctness spot-check before timing (hardware-only bugs)
            Yw = block_stencil.block_stencil_spmm_m_t(
                op.blocks, op.offsets, Xm)
            Yr = block_stencil_ring.ring_block_spmm_m_t(
                op.blocks, op.offsets, Xm)
            err = float(jnp.max(jnp.abs(Yw - Yr)) / jnp.max(jnp.abs(Yw)))
            base["ring_vs_windowed_err"] = f"{err:.2e}"
            assert err < 1e-4, base

            arms = []
            if bc == "periodic":
                arms += [("windowed_gram_chain",
                          lambda: measure_gram_chain(op, Xm, False)),
                         ("ring_gram_chain",
                          lambda: measure_gram_chain(op, Xm, True,
                                                     fold=False))]
                if op.fold:
                    # round-5 folded-wrap kernel (9 streamed diagonals):
                    # the dispatch default; plain-ring above is the control
                    arms.append(
                        ("ring_folded_gram_chain",
                         lambda: measure_gram_chain(op, Xm, True,
                                                    fold=True)))
                if not args.skip_fresh:
                    import os
                    def fresh_windowed():
                        os.environ["BLOCKCG_RING_MAX_MB"] = "0"
                        try:
                            return measure_apply(op, Xm,
                                                 lengths=(8, 136, 264))
                        finally:
                            del os.environ["BLOCKCG_RING_MAX_MB"]
                    arms += [("windowed_fresh_chain", fresh_windowed),
                             ("ring_fresh_chain",
                              lambda: measure_apply(op, Xm,
                                                    lengths=(8, 136, 264)))]
            else:
                # A dispatch fallback (no ring plan, or donation refused by
                # wrap_zero) would silently time a fresh windowed apply
                # under the 'ring_donated' label — fail loudly instead
                # (advisor r4).
                assert rp is not None and op.wrap_zero, (
                    "open-BC donated arm requires a ring plan and wrap_zero",
                    rp, op.wrap_zero)
                arms += [("ring_donated_chain",
                          lambda: measure_apply(op, Xm, donate=True,
                                                lengths=(8, 136, 264))),
                         ("ring_gram_chain",
                          lambda: measure_gram_chain(op, Xm, True))]
            if args.bf16_blocks:
                from blockcg_tpu.operators.bdia import BlockDIAOperator

                opb = BlockDIAOperator(
                    blocks=op.blocks.astype(jnp.bfloat16),
                    offsets=op.offsets, wrap_zero=op.wrap_zero)
                object.__setattr__(opb, "_nnz", op.nnz)
                if bc == "periodic":
                    arms.append(("ring_gram_chain_bf16blocks",
                                 lambda: measure_gram_chain(opb, Xm, True)))
                else:
                    arms.append(("ring_donated_chain_bf16blocks",
                                 lambda: measure_apply(
                                     opb, Xm, donate=True,
                                     lengths=(8, 136, 264))))
            for name, fn in arms:
                dt = fn()
                rec = dict(base)
                rec.update({
                    "arm": name,
                    "apply_ms": round(dt * 1e3, 4),
                    "gnnzs": round(op.nnz / dt / 1e9, 2),
                    "gflops": round(2 * op.nnz * k / dt / 1e9, 1),
                })
                print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
