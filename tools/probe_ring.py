#!/usr/bin/env python
"""Ring vs windowed stencil kernel on the real chip (round 3).

The windowed kernel re-reads X per far offset (x_reads≈3 at >=1M rows,
measured 6.2 Gnnz/s); the ring kernel (ops/stencil_ring.py) fetches each
block once (x_reads=1.0, ceiling 18.8 Gnnz/s at the 765 GB/s calibration).
Correctness first (vs the windowed kernel on identical data), then
throughput at solver-relevant sizes, f32 and bf16.

Run on the real chip: python tools/probe_ring.py
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from bench import measure_apply
from blockcg_tpu.ops import stencil, stencil_ring
from blockcg_tpu.problems import laplacian_dia


@jax.tree_util.register_static
class _RingOp:
    """Forces ring dispatch regardless of the DIA auto-selector.
    ``wrap_zero`` gates the donated apply exactly as DIAOperator does."""

    def __init__(self, diags, offsets, wrap_zero=False):
        object.__setattr__(self, "diags", diags)
        object.__setattr__(self, "offsets", offsets)
        object.__setattr__(self, "wrap_zero", wrap_zero)

    def matmat_t(self, Xt, donate=False):
        return stencil_ring.ring_spmm_t(self.diags, self.offsets, Xt,
                                        donate=donate and self.wrap_zero)


def main():
    rng = np.random.default_rng(0)
    for shape, k in [((64, 64, 64), 32), ((128, 128, 64), 32),
                     ((128, 128, 128), 32), ((256, 128, 128), 32),
                     ((128, 128, 128), 64)]:
        op = laplacian_dia(shape, dtype=jnp.float32)
        n = op.n
        if not stencil_ring.available(n, k, op.offsets):
            print(json.dumps({"probe": "ring", "shape": list(shape), "k": k,
                              "skip": "no ring plan"}), flush=True)
            continue
        Xt = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)

        # correctness vs the windowed kernel on chip
        y_win = stencil.stencil_spmm_t(op.diags, op.offsets, Xt)
        y_ring = stencil_ring.ring_spmm_t(op.diags, op.offsets, Xt)
        err = float(jnp.max(jnp.abs(y_win - y_ring)) /
                    (jnp.max(jnp.abs(y_win)) + 1e-30))

        dt_win = measure_apply(op, Xt)
        ring_op = _RingOp(op.diags, op.offsets, wrap_zero=op.wrap_zero)
        dt_ring = measure_apply(ring_op, Xt)
        # donated chain: the artifact-free number (fresh-output chains pay
        # a full XLA carry copy per apply — BASELINE.md round 4)
        dt_don = measure_apply(ring_op, Xt, donate=True)
        pw = stencil.plan(n, k, op.offsets)
        pr = stencil_ring.plan(n, k, op.offsets)
        print(json.dumps({
            "probe": "ring", "shape": list(shape), "n": n, "k": k,
            "rel_err_vs_windowed": err,
            "win_ms": round(dt_win * 1e3, 4),
            "ring_ms": round(dt_ring * 1e3, 4),
            "ring_donated_ms": round(dt_don * 1e3, 4),
            "win_gnnzs": round(op.nnz / dt_win / 1e9, 2),
            "ring_gnnzs": round(op.nnz / dt_ring / 1e9, 2),
            "ring_donated_gnnzs": round(op.nnz / dt_don / 1e9, 2),
            "win_x_reads": pw.x_reads if pw else None,
            "ring_R": pr.R, "ring_S": pr.S, "ring_H": pr.H,
            "speedup": round(dt_win / dt_don, 2),
        }), flush=True)

    # bf16 fields at 128^3 (the config-5 per-shard regime)
    op = laplacian_dia((128, 128, 128), dtype=jnp.bfloat16)
    k = 32
    Xt = jnp.asarray(rng.standard_normal((k, op.n)), jnp.bfloat16)
    ring_op = _RingOp(op.diags, op.offsets, wrap_zero=op.wrap_zero)
    dt_ring = measure_apply(ring_op, Xt, donate=True)
    print(json.dumps({
        "probe": "ring", "shape": [128, 128, 128], "k": k, "dtype": "bf16",
        "ring_donated_ms": round(dt_ring * 1e3, 4),
        "ring_donated_gnnzs": round(op.nnz / dt_ring / 1e9, 2),
    }), flush=True)

    # gram-fused ring variant (solver inner loop shape)
    op = laplacian_dia((128, 128, 128), dtype=jnp.float32)
    Xt = jnp.asarray(rng.standard_normal((32, op.n)), jnp.float32)

    @jax.tree_util.register_static
    class _RingGramOp:
        def matmat_t(self, Xt_):
            y, g = stencil_ring.ring_spmm_gram_t(op.diags, op.offsets, Xt_)
            return y + 0.0 * g[0, 0]

    dt = measure_apply(_RingGramOp(), Xt)
    print(json.dumps({
        "probe": "ring_gram", "shape": [128, 128, 128], "k": 32,
        "ms": round(dt * 1e3, 4),
        "gnnzs": round(op.nnz / dt / 1e9, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
