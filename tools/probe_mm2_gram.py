#!/usr/bin/env python
"""Why does mm2_update_gram run at 329 GB/s when px_update runs at 670?

(CHIP_QUEUE_r5.log probe-px/mm2: the SBCGrQ tail's last headroom.) The
kernels differ in one structural way: mm2 pairs a STREAMED field output
with a REVISITED (k, k) Gram output block (+= every grid step). Suspect:
the revisited output forces Mosaic to serialize the output pipeline.

Variants measured (all donated, 128^3, k=32):
  shipped     — mm2_update_gram as-is (revisited g_ref accumulation)
  scratch_g   — G accumulated in VMEM scratch, g_ref written ONCE at the
                last grid step
  no_gram     — same kernel minus the Gram entirely (isolates gram cost)

Usage (real chip): python tools/probe_mm2_gram.py
"""

from __future__ import annotations

import functools
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIGHEST = jax.lax.Precision.HIGHEST
CP = pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024)


def make_mm2(variant: str, k: int, lanes: int, R: int):
    nb = lanes // R

    def dot_kk(m, x):
        return jax.lax.dot_general(m, x, (((1,), (0,)), ((), ())),
                                   precision=HIGHEST,
                                   preferred_element_type=jnp.float32)

    def dot_gram(u, v):
        return jax.lax.dot_general(u, v, (((1,), (1,)), ((), ())),
                                   precision=HIGHEST,
                                   preferred_element_type=jnp.float32)

    if variant == "scratch_g":
        def kernel(m1_ref, m2_ref, b1_ref, b2_ref, y_ref, g_ref, acc_ref):
            i = pl.program_id(0)
            y = dot_kk(m1_ref[:, :], b1_ref[:]) + dot_kk(m2_ref[:, :],
                                                         b2_ref[:])
            y_ref[:] = y
            t = dot_gram(y, y)

            @pl.when(i == 0)
            def _():
                acc_ref[:, :] = t

            @pl.when(i > 0)
            def _():
                acc_ref[:, :] += t

            @pl.when(i == nb - 1)
            def _():
                g_ref[:, :] = acc_ref[:, :]
        scratch = [pltpu.VMEM((k, k), jnp.float32)]
    elif variant == "no_gram":
        def kernel(m1_ref, m2_ref, b1_ref, b2_ref, y_ref, g_ref):
            i = pl.program_id(0)
            y = dot_kk(m1_ref[:, :], b1_ref[:]) + dot_kk(m2_ref[:, :],
                                                         b2_ref[:])
            y_ref[:] = y

            @pl.when(i == 0)
            def _():
                g_ref[:, :] = jnp.zeros((k, k), jnp.float32)
        scratch = []
    else:  # shipped structure
        def kernel(m1_ref, m2_ref, b1_ref, b2_ref, y_ref, g_ref):
            i = pl.program_id(0)
            y = dot_kk(m1_ref[:, :], b1_ref[:]) + dot_kk(m2_ref[:, :],
                                                         b2_ref[:])
            y_ref[:] = y
            t = dot_gram(y, y)

            @pl.when(i == 0)
            def _():
                g_ref[:, :] = t

            @pl.when(i > 0)
            def _():
                g_ref[:, :] += t
        scratch = []

    spec = pl.BlockSpec((k, R), lambda i: (0, i), memory_space=pltpu.VMEM)
    kk = pl.BlockSpec((k, k), lambda i: (0, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def mm2(M1, M2, B1, B2):
        return pl.pallas_call(
            kernel, grid=(nb,),
            in_specs=[kk, kk, spec, spec],
            out_specs=(spec, kk),
            out_shape=(jax.ShapeDtypeStruct((k, lanes), jnp.float32),
                       jax.ShapeDtypeStruct((k, k), jnp.float32)),
            input_output_aliases={2: 0},
            scratch_shapes=scratch,
            compiler_params=CP,
        )(M1, M2, B1, B2)

    return mm2


def main():
    from blockcg_tpu.utils.platform import lsq_slope

    k, n = 32, 128 ** 3
    rng = np.random.default_rng(0)
    A0 = jnp.asarray(np.eye(k) * 0.5, jnp.float32)
    Zt = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    W0 = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)

    ref_g = None
    for R in (8192, 16384):
        if n % R:
            continue
        for variant in ("shipped", "scratch_g", "no_gram"):
            mm2 = make_mm2(variant, k, n, R)

            def make_loop(nn):
                def loop(W, Z):
                    def body(i, Wc):
                        V, G = mm2(A0, -A0, Wc, Z)
                        return jax.lax.optimization_barrier(
                            V + jnp.float32(1e-30) * G[0, 0])
                    return jax.lax.fori_loop(0, nn, body, W, unroll=False)
                return loop

            lengths = (8, 136)
            comp = {nn: jax.jit(make_loop(nn)).lower(W0, Zt).compile()
                    for nn in lengths}
            best = {}
            for nn in lengths:
                b = float("inf")
                for t in range(3):
                    out = comp[nn](W0 * (1 + 1e-6 * t), Zt)
                    _ = float(jnp.sum(out))
                    t0 = time.time()
                    out = comp[nn](W0 * (1 + 1e-6 * (t + 7)), Zt)
                    _ = float(jnp.sum(out))
                    b = min(b, time.time() - t0)
                best[nn] = b
            dt = lsq_slope(best)
            if dt <= 0:
                dt = best[max(lengths)] / max(lengths)
            V, G = mm2(A0, -A0, W0, Zt)
            gsum = float(jnp.sum(G))
            if variant == "shipped" and R == 8192:
                ref_g = gsum
            print(json.dumps({
                "probe": "mm2_gram", "variant": variant, "R": R,
                "ms": round(dt * 1e3, 4),
                "gbs_3pass": round(3 * 4 * k * n / dt / 1e9, 1),
                "gram_sum": gsum,
                "gram_ok": (variant == "no_gram" or ref_g is None
                            or abs(gsum - ref_g) < 1e-3 * abs(ref_g)),
            }), flush=True)


if __name__ == "__main__":
    main()
