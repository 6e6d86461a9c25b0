#!/usr/bin/env python
"""px_update restructure A/B: two stacked dots vs ONE (2k, 2k) dot.

The SBCGrQ tail runs at ~560 GB/s in-solve vs the 745 GB/s calibration
(CHIP_QUEUE_r5.log profile-tail-128) — the per-iteration floor's last
identified headroom. px_update currently issues two MXU dots per tile
(Pn: (k,2k)@(2k,R); Xn: (k,k)@(k,R)); the candidate merges them into one
(2k,2k)@(2k,R) dot ([Pn; dX] = [[M1, rho], [0, C]] @ [W; P]) — fewer MXU
instructions per tile, bigger contraction, one extra VPU add (Xn = X+dX).

Both variants are implemented INLINE here (the shipped kernel is
untouched); chains are donated so no carry-copy artifact. If the one-dot
form wins >=10%, patch ops/fused.px_update.

Usage (real chip): python tools/probe_px_onedot.py [--n 2097152] [--k 32]
"""

from __future__ import annotations

import argparse
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


def make_px(variant: str, k: int, lanes: int, R: int):
    nb = lanes // R

    def kernel(m1_ref, rho_ref, c_ref, w_ref, p_ref, x_ref, pn_ref, xn_ref):
        if variant == "twodot":
            m1rh = jnp.concatenate([m1_ref[:, :], rho_ref[:, :]], axis=1)
            wp = jnp.concatenate([w_ref[:], p_ref[:]], axis=0)
            pn = jax.lax.dot_general(
                m1rh, wp, (((1,), (0,)), ((), ())), precision=HIGHEST,
                preferred_element_type=jnp.float32)
            xn = x_ref[:] + jax.lax.dot_general(
                c_ref[:, :], p_ref[:], (((1,), (0,)), ((), ())),
                precision=HIGHEST, preferred_element_type=jnp.float32)
        else:  # onedot
            z = jnp.zeros((k, k), jnp.float32)
            wt = jnp.concatenate([
                jnp.concatenate([m1_ref[:, :], rho_ref[:, :]], axis=1),
                jnp.concatenate([z, c_ref[:, :]], axis=1)], axis=0)
            wp = jnp.concatenate([w_ref[:], p_ref[:]], axis=0)
            y = jax.lax.dot_general(
                wt, wp, (((1,), (0,)), ((), ())), precision=HIGHEST,
                preferred_element_type=jnp.float32)
            pn = y[:k]
            xn = x_ref[:] + y[k:]
        pn_ref[:] = pn
        xn_ref[:] = xn

    spec = pl.BlockSpec((k, R), lambda i: (0, i), memory_space=pltpu.VMEM)
    kk = pl.BlockSpec((k, k), lambda i: (0, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def px(M1, rho, C, W, P, X):
        return pl.pallas_call(
            kernel, grid=(nb,),
            in_specs=[kk, kk, kk, spec, spec, spec],
            out_specs=(spec, spec),
            out_shape=(jax.ShapeDtypeStruct((k, lanes), jnp.float32),
                       jax.ShapeDtypeStruct((k, lanes), jnp.float32)),
            input_output_aliases={4: 0, 5: 1},
            compiler_params=CP,
        )(M1, rho, C, W, P, X)

    return px


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128 ** 3)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--R", type=int, default=8192)
    args = ap.parse_args()
    k, n = args.k, args.n

    from blockcg_tpu.utils.platform import lsq_slope

    rng = np.random.default_rng(0)
    A0 = jnp.asarray(np.eye(k) * 0.5, jnp.float32)
    W = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    P0 = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    X0 = jnp.zeros((k, n), jnp.float32)

    for variant in ("twodot", "onedot"):
        px = make_px(variant, k, n, args.R)

        def make_loop(nn):
            def loop(Wa, P, X):
                def body(i, c):
                    Pc, Xc = c
                    Pn, Xn = px(A0, A0, A0, Wa, Pc, Xc)
                    return (jax.lax.optimization_barrier(Pn),
                            jax.lax.optimization_barrier(Xn))
                return jax.lax.fori_loop(0, nn, body, (P, X), unroll=False)
            return loop

        lengths = (8, 136)
        compiled = {nn: jax.jit(make_loop(nn)).lower(W, P0, X0).compile()
                    for nn in lengths}
        best = {}
        for nn in lengths:
            b = float("inf")
            for t in range(3):
                out = compiled[nn](W * (1 + 1e-6 * t), P0, X0)
                _ = float(jnp.sum(out[0]))
                t0 = time.time()
                out = compiled[nn](W * (1 + 1e-6 * (t + 10)), P0, X0)
                _ = float(jnp.sum(out[0]))
                b = min(b, time.time() - t0)
            best[nn] = b
        dt = lsq_slope(best)
        if dt <= 0:
            dt = best[max(lengths)] / max(lengths)
        gbs = 5 * 4 * k * n / dt / 1e9
        print(json.dumps({"probe": "px_onedot", "variant": variant,
                          "R": args.R, "ms": round(dt * 1e3, 4),
                          "gbs_5pass": round(gbs, 1)}), flush=True)
        # correctness cross-check between variants
        Pn, Xn = px(A0, A0, A0, W, P0 * 1.0, X0)
        print(json.dumps({"variant": variant,
                          "checksum": float(jnp.sum(Pn) + jnp.sum(Xn))}),
              flush=True)


if __name__ == "__main__":
    main()
