#!/usr/bin/env python
"""Streaming-regime SpMM A/B: windowed vs ring vs DONATED ring (r4 item 1).

Round-3 streaming numbers (6.2 windowed / 9.0 ring Gnnz/s at 128^3) were
measured through fresh-output chained-apply loops, which
tools/probe_write_alias.py showed carry a benchmark artifact: a fresh
Pallas output entering the fori_loop carry costs a FULL extra field copy
per apply (+2 HBM passes = +36.6 B/nnz at k=32/7-pt). The donated ring
chain (Y aliased onto the dead chain input) is artifact-free and is also
the faithful model of in-solve SpMM cost (solver bodies hold Z as a
loop-local temp — no carry copy there either).

Cases (k=32, f32), each with the measured apply time, Gnnz/s, the
implied bandwidth of its OWN traffic model, and the count of full-field
copies XLA placed in the compiled loop body (the artifact, made visible):

  windowed   BLOCKCG_NO_RING path, fresh output   x_reads=3.03 (+copy)
  ring       ring kernel, fresh output            x_reads=1    (+copy)
  ring_don   ring kernel, donated output          x_reads=1    (no copy)

Sizes: 128^3 (2.1M rows, 256 MB field) and 256x128^2 (4.2M, 512 MB).
Prints one JSON line per case. Run on the real chip.
"""

from __future__ import annotations

import functools
import json
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from bench import measure_apply, calibrate_bw
from blockcg_tpu.problems import laplacian_dia
from blockcg_tpu.ops import stencil, stencil_ring


def _copies_in_loop(op, Xt, donate):
    """Count full-field copy ops in the compiled 8-apply loop body."""
    def loop(o, v):
        def it(i, u):
            y = o.matmat_t(u, donate=True) if donate else o.matmat_t(u)
            idx = (slice(None),) * (y.ndim - 1) + (slice(0, 128),)
            return jax.lax.optimization_barrier(y.at[idx].multiply(0.5))
        return jax.lax.fori_loop(0, 8, it, v, unroll=False)

    txt = jax.jit(loop).lower(op, Xt).compile().as_text()
    k, n = Xt.shape
    pat = re.compile(rf"f32\[{k},{n}\]\{{[^}}]*\}} copy\(")
    return len(pat.findall(txt))


def run_case(name, op, Xt, x_reads, donate, calib):
    dt = measure_apply(op, Xt, donate=donate)
    k, n = Xt.shape
    ndiag = len(op.offsets)
    nnz = op.nnz
    traffic = 4 * (k * n * x_reads + ndiag * n + k * n)
    ncopies = _copies_in_loop(op, Xt, donate)
    out = {
        "probe": "ring_donate", "case": name, "n": n, "k": k,
        "apply_ms": round(dt * 1e3, 4),
        "gnnzs": round(nnz / dt / 1e9, 2),
        "x_reads": round(x_reads, 2),
        "model_gbs": round(traffic / dt / 1e9, 1),
        "frac_of_calib": round(traffic / dt / 1e9 / calib, 3),
        "loop_field_copies": ncopies,
        "ceiling_gnnzs": round(calib * 1e9 * nnz
                               / traffic / 1e9, 2),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    import os

    calib = calibrate_bw()
    print(json.dumps({"probe": "ring_donate", "calib_gbs": round(calib, 1),
                      "device": str(jax.devices()[0])}), flush=True)
    for shape in ((128, 128, 128), (256, 128, 128)):
        n = int(np.prod(shape))
        op = laplacian_dia(shape, dtype=jnp.float32)
        rng = np.random.default_rng(1)
        Xt = jnp.asarray(rng.standard_normal((32, n)), jnp.float32)

        pw = stencil.plan(n, 32, op.offsets)
        os.environ["BLOCKCG_NO_RING"] = "1"
        run_case(f"windowed_{n}", op, Xt, pw.x_reads, False, calib)
        del os.environ["BLOCKCG_NO_RING"]
        assert op._use_ring(Xt), "ring gate refused the streaming size"
        run_case(f"ring_{n}", op, Xt, 1.0, False, calib)
        run_case(f"ring_donated_{n}", op, Xt, 1.0, True, calib)


if __name__ == "__main__":
    main()
