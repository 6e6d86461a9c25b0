#!/usr/bin/env python
"""Windowed-vs-ring crossover for the merged general block kernel.

VERDICT r4 item 2: `BlockDIAOperator._use_ring` gained the small-n guard
(refuse the ring when the windowed plan's x_reads <= 2 — mirror of the
scalar DIA guard); this probe measures the windowed and ring gram-chains
across lattice sizes to place/validate the threshold from data. Round-4
single point: L=8 windowed 286 vs ring 79.6 Gnnz/s (CHIP_QUEUE_r4.log).

Both arms use the artifact-free gram-seed chain (bench.measure_gram_chain;
loop dependence rides the fused Gram's seed operand, the field output is
loop-local — no XLA while-carry field copy). Loop lengths scale with the
problem so the marginal signal clears the ~30 ms tunnel dispatch jitter.

Usage (real chip): python tools/probe_block_ring_crossover.py [--Ls 8,16,24,32]
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


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--Ls", type=str, default="8,16,24,32")
    ap.add_argument("--k", type=int, default=12)
    args = ap.parse_args()

    from bench import measure_gram_chain
    from blockcg_tpu.ops import block_stencil, block_stencil_ring
    from blockcg_tpu.problems import dirac_gauged_matrix

    print(json.dumps({"probe": "block_ring_crossover", "k": args.k,
                      "device": jax.devices()[0].device_kind}), flush=True)
    rng = np.random.default_rng(0)
    for L in (int(s) for s in args.Ls.split(",")):
        op = dirac_gauged_matrix(L, m=0.5, bc="periodic", dtype=jnp.float32)
        m = op.bs * args.k
        Xm = op.to_internal(jnp.asarray(
            rng.standard_normal((args.k, op.n)), dtype=jnp.float32))
        wp = block_stencil.plan_m(op.ns, m, op.bs, op.offsets)
        ring_ok = block_stencil_ring.available(
            op.ns, m, op.bs, op.offsets, itemsize=4, coeff_itemsize=4)
        # marginal-vs-jitter sizing: longest loop ~0.7 s of kernel time
        est = op.nnz / 50e9
        n_long = max(264, int(0.7 / est) // 8 * 8)
        lengths = (8, (8 + n_long) // 2, n_long)
        base = {"probe": "block_ring_crossover", "L": L, "ns": op.ns,
                "m": m, "nnz": op.nnz,
                "windowed_x_reads":
                    None if wp is None else round(wp.x_reads, 2),
                "guard_uses_ring": bool(op._use_ring(
                    jax.ShapeDtypeStruct((m, op.ns), jnp.float32))),
                "lengths": lengths}
        arms = []
        if wp is not None:
            arms.append(("windowed", False))
        if ring_ok:
            arms.append(("ring", True))
        for name, use_ring in arms:
            dt = measure_gram_chain(op, Xm, use_ring, lengths=lengths)
            rec = dict(base)
            rec.update({"arm": name, "apply_ms": round(dt * 1e3, 4),
                        "gnnzs": round(op.nnz / dt / 1e9, 2)})
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
