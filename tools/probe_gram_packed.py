#!/usr/bin/env python
"""Gram-dot MXU packing A/B: (k, R) self-gram vs full-array packed form.

The tail's remaining bound after the mm2 stacking (CHIP_QUEUE_r5.log
stacked-mm2): the Gram dot (k,R)@(R,k) has a k x k = 32 x 32 output —
(32/128)^2 = 1/16 of the systolic array. Packing 4 lane-chunks into the
sublane axis, Vr (4k, R/4), and taking G' = Vr Vr^T (128 x 128, full
array) costs 4x the MACs at 16x the utilization = net 4x IF the packing
copy (4 lane-slice moves into a (4k, R/4) scratch) is cheap. G is the
sum of G' 's four k x k diagonal blocks.

Usage (real chip): python tools/probe_gram_packed.py
"""

from __future__ import annotations

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


def make_gram(variant: str, k: int, lanes: int, R: int):
    nb = lanes // R

    def kernel(s_ref, u_ref, o_ref):
        i = pl.program_id(0)
        u = u_ref[:]
        if variant == "naive":
            g = jax.lax.dot_general(u, u, (((1,), (1,)), ((), ())),
                                    precision=HIGHEST,
                                    preferred_element_type=jnp.float32)
        else:  # packed
            R4 = R // 4
            ur = jnp.concatenate([u[:, j * R4:(j + 1) * R4]
                                  for j in range(4)], axis=0)  # (4k, R/4)
            gp = jax.lax.dot_general(ur, ur, (((1,), (1,)), ((), ())),
                                     precision=HIGHEST,
                                     preferred_element_type=jnp.float32)
            g = (gp[:k, :k] + gp[k:2 * k, k:2 * k]
                 + gp[2 * k:3 * k, 2 * k:3 * k] + gp[3 * k:, 3 * k:])

        @pl.when(i == 0)
        def _():
            o_ref[:, :] = g + s_ref[:, :]

        @pl.when(i > 0)
        def _():
            o_ref[:, :] += g

    spec = pl.BlockSpec((k, R), lambda i: (0, i), memory_space=pltpu.VMEM)
    kk = pl.BlockSpec((k, k), lambda i: (0, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def gram(seed, U):
        return pl.pallas_call(
            kernel, grid=(nb,), in_specs=[kk, spec], out_specs=kk,
            out_shape=jax.ShapeDtypeStruct((k, k), jnp.float32),
            compiler_params=CP,
        )(seed, U)

    return gram


def main():
    from blockcg_tpu.utils.platform import lsq_slope

    k, n = 32, 128 ** 3
    rng = np.random.default_rng(0)
    U0 = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)

    ref = None
    for R in (8192, 16384):
        for variant in ("naive", "packed"):
            gram = make_gram(variant, k, n, R)

            def make_loop(nn):
                def loop(U):
                    def body(i, carry):
                        # seed-chained dependence: no extra field pass,
                        # no loop hoisting (CLAUDE.md benchmark invariant)
                        return gram(carry * jnp.float32(1e-30), U)
                    return jax.lax.fori_loop(
                        0, nn, body, jnp.zeros((k, k), jnp.float32),
                        unroll=False)
                return loop

            lengths = (8, 136)
            comp = {nn: jax.jit(make_loop(nn)).lower(U0).compile()
                    for nn in lengths}
            best = {}
            for nn in lengths:
                b = float("inf")
                for t in range(3):
                    out = comp[nn](U0 * (1 + 1e-6 * t))
                    _ = float(jnp.sum(out))
                    t0 = time.time()
                    out = comp[nn](U0 * (1 + 1e-6 * (t + 7)))
                    _ = float(jnp.sum(out))
                    b = min(b, time.time() - t0)
                best[nn] = b
            dt = lsq_slope(best)
            if dt <= 0:
                dt = best[max(lengths)] / max(lengths)
            g = gram(jnp.zeros((k, k), jnp.float32), U0)
            gs = float(jnp.sum(g))
            if ref is None:
                ref = gs
            print(json.dumps({
                "probe": "gram_packed", "variant": variant, "R": R,
                "ms": round(dt * 1e3, 4),
                "gbs_1read": round(4 * k * n / dt / 1e9, 1),
                "gram_ok": abs(gs - ref) < 1e-4 * abs(ref),
            }), flush=True)


if __name__ == "__main__":
    main()
