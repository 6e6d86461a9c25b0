#!/usr/bin/env python
"""Large-n stencil efficiency diagnostic (round 3).

At >=1M rows the 7-pt stencil streams at ~6.2 Gnnz/s = 481 GB/s of modeled
traffic = 63% of the 765 GB/s calibration (BASELINE.md round-3). Where does
the gap come from? Isolate the access-pattern components at 128^3, k=32:

  near-only   operator (offsets 0, +-1, +-128;   x_reads 1.03): halo path
  far-only    operator (offsets 0, +-16384;      x_reads 3.00): far windows
  full 7-pt   operator (both):                   x_reads 3.03
  copy        y = 2x Pallas kernel, same (k, n) shape: streaming ceiling

If near-only streams near the copy rate, the far-window refetches are the
loss and a rolling-ring kernel (each X block fetched once) is worth ~3x.
If even the copy kernel sits at ~60%, the loss is shape- or DMA-granularity
-bound and the fix is layout, not scheduling.

Run on the real chip: python tools/probe_stencil_bigN.py
"""

from __future__ import annotations

import functools
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import measure_apply
from blockcg_tpu.operators.dia import DIAOperator
from blockcg_tpu.ops import stencil


def _op(n, offsets, dtype=jnp.float32):
    rng = np.random.default_rng(0)
    diags = jnp.asarray(
        rng.standard_normal((len(offsets), n)).astype(np.float32) * 0.1, dtype)
    return DIAOperator(diags=diags, offsets=tuple(offsets))


@functools.partial(jax.jit, static_argnames=())
def _copy2x(Xt):
    k, n = Xt.shape
    R = 8192

    def kernel(x_ref, y_ref):
        y_ref[:] = x_ref[:] * 2.0

    return pl.pallas_call(
        kernel,
        grid=(n // R,),
        in_specs=[pl.BlockSpec((k, R), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((k, R), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, n), Xt.dtype),
    )(Xt)


@jax.tree_util.register_static
class _CopyOp:
    """measure_apply-compatible wrapper for the copy kernel (static pytree:
    measure_apply traces the operator as a jit argument)."""

    def matmat_t(self, Xt):
        return _copy2x(Xt)


def main():
    n = 128 * 128 * 128
    k = 32
    rng = np.random.default_rng(1)
    Xt = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)

    cases = {
        "near_only": (0, 1, -1, 128, -128),
        "far_only": (0, 16384, -16384),
        "full_7pt": (0, 1, -1, 128, -128, 16384, -16384),
    }
    for name, offs in cases.items():
        op = _op(n, offs)
        p = stencil.plan(n, k, op.offsets)
        dt = measure_apply(op, Xt)
        traffic = 4 * (k * n * p.x_reads + len(offs) * n + k * n)
        print(json.dumps({
            "probe": "stencil_bigN", "case": name, "n": n, "k": k,
            "ndiag": len(offs), "R": p.R, "H": p.H, "x_reads": p.x_reads,
            "apply_ms": round(dt * 1e3, 4),
            "gnnzs": round(len(offs) * n / dt / 1e9, 2),
            "modeled_gbs": round(traffic / dt / 1e9, 1),
        }), flush=True)

    dt = measure_apply(_CopyOp(), Xt)
    print(json.dumps({
        "probe": "stencil_bigN", "case": "copy2x", "n": n, "k": k,
        "apply_ms": round(dt * 1e3, 4),
        "modeled_gbs": round(2 * 4 * k * n / dt / 1e9, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
