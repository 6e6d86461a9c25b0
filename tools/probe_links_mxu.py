#!/usr/bin/env python
"""Matrix-valued-link kernel probe (VERDICT round-1 item 6).

The general per-site block-stencil kernel (runtime bs x bs link matrices,
the SU(N)-style case that cannot factorize onto the const-hop MXU path)
measured ~32 Gnnz/s — far from both the HBM roofline and the const-hop
kernel. This probe localizes the bound with three measurements on the
real chip:

1. k sweep (k = 12 vs 16): m = bs*k = 48 is NOT a multiple of the 8-row
   sublane tile, so every spin-plane slice w[b*k:(b+1)*k] is misaligned
   and Mosaic inserts realignment copies; k = 16 (m = 64) is aligned. If
   ns-normalized apply time is ~flat from k=12 to k=16 despite 33% more
   math, misalignment is the drag and padding k is the fix.

2. VPU broadcast-FMA roofline: a VMEM-resident kernel doing exactly the
   general kernel's inner op (coeff (1, R) broadcast-multiplied into a
   (k, R) accumulator) with no HBM traffic — the attainable ceiling for
   this op shape. The general kernel's achieved FMA rate divided by this
   says whether the kernel is VPU-op-bound (ratio ~1: the kernel IS the
   hardware limit, and only fewer FLOPs — const-hop factorization — can
   win) or schedule-bound (ratio << 1: fix the kernel).

3. The same roofline with a full (k, R) coefficient (no broadcast) —
   isolates the sublane-broadcast cost itself.

The MXU staging alternative (pre-expanded block-diagonal operands) is
ruled out by arithmetic, not measurement: staging G=32 sites into a
(128, 128) bf16 block-diagonal operand stores 16384 slots for 512
payload values — 32x memory blowup. Streaming it from HBM costs
9 offsets x 1 KiB/site = 9 KiB/site vs the VPU path's ~1.4 KiB/site:
>6x MORE HBM traffic on a bandwidth-limited chip, i.e. a guaranteed
loss regardless of MXU rate. Building it on the fly in VMEM writes 32x
more scratch bytes than the FMAs it replaces. (Numbers recorded in
PARITY.md "Known gaps".)

Usage (real chip): python tools/probe_links_mxu.py [--L 16] [--reps 32]
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


def probe_general_kernel(L, ks=(12, 16)):
    from bench import measure_apply
    from blockcg_tpu.problems import dirac_gauged_matrix

    # the genuine matrix-link subject (non-factorizable per-site blocks)
    op = dirac_gauged_matrix(L, m=0.5, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    out = []
    for k in ks:
        Xt = op.to_internal(jnp.asarray(
            rng.standard_normal((k, op.n)), dtype=jnp.float32))
        dt = measure_apply(op, Xt)
        rec = {
            "probe": "general_block_kernel", "L": L, "k": k,
            "m": 4 * k, "aligned": (4 * k) % 8 == 0,
            "apply_ms": round(dt * 1e3, 4),
            "gnnzs": round(op.nnz / dt / 1e9, 2),
            "gflops": round(2 * op.nnz * k / dt / 1e9, 1),
            "ns_normalized_us_per_Msite": round(dt / op.ns * 1e12, 2),
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
    return out


def _fma_kernel(reps, bcast, k, nacc, c_ref, x_ref, y_ref):
    # Both arms index a DIFFERENT coefficient slice per rep. The round-3
    # probe reused one (k, R) coefficient for every non-broadcast rep, so
    # `c * x` was a common subexpression — CSE collapsed reps multiplies
    # into one, inflating that arm's "FLOP rate" ~2x (the reported 15.3
    # TFLOP/s / 2.4x-penalty numbers in CHIP_QUEUE_r3.log measured the
    # rewrite, not the hardware). Distinct slices defeat the rewrite.
    #
    # ``nacc`` independent accumulator chains model the real kernel's ILP:
    # the general block kernel interleaves bs=4 acc[a] chains, while a
    # single chain serializes on the FMA's latency — nacc=1 measures the
    # latency bound, nacc=4 the kernel-shaped attainable rate.
    accs = [jnp.zeros_like(x_ref[:]) for _ in range(nacc)]
    nc = c_ref.shape[0] // (1 if bcast else k)
    for r in range(reps):
        if bcast:
            c = c_ref[r % nc, :].reshape(1, -1)   # (1, R) sublane broadcast
        else:
            j = (r % nc) * k
            c = c_ref[j:j + k, :]                  # full (k, R), no broadcast
        accs[r % nacc] = accs[r % nacc] + c * x_ref[:]
    acc = accs[0]
    for a in accs[1:]:
        acc = acc + a
    y_ref[:] = acc


def probe_vpu_roofline(k=12, R=512, nb=8192, reps=128, trials=5):
    """Attainable VPU broadcast-FMA rate with all operands VMEM-resident.

    Measurement rules for this sandbox (BASELINE.md): inputs are
    pre-materialized OUTSIDE the timed region (an eager `X * scalar` inside
    it costs a ~400 ms per-fresh-scalar compile), every timed sample force-
    fetches a value, and the rate comes from DIFFERENCING two compiled
    reps-counts — the dispatch overhead and the X/Y HBM passes are
    identical in both, so the delta isolates the in-VMEM FMA work.

    Sizing: the marginal work must clear the tunnel's one-sided ±10 ms
    jitter. The round-3/first-round-4 shapes (nb=2048, reps 16 vs 64) put
    only ~1.2 GFLOP in the delta — ~1 ms at 1 TFLOP/s, inside the noise
    (the non-broadcast delta measured NEGATIVE, CHIP_QUEUE_r4.log
    probe-links-mxu FIXED). nb=8192, reps 32 vs 128 puts ~9.7 GFLOP in
    the delta: 1.5-10 ms across the plausible 1-6 TFLOP/s range, resolved
    by best-of-5 minima.
    """
    rng = np.random.default_rng(1)
    reps_lo = max(reps // 4, 1)
    # pre-materialized varied inputs (the tunnel caches repeat executions)
    Xs = [jnp.asarray(rng.standard_normal((k, nb * R)), dtype=jnp.float32)
          for _ in range(trials)]
    for x in Xs:
        _ = float(jnp.sum(x))
    out = []
    for bcast, nacc in ((True, 1), (True, 4), (False, 1), (False, 4)):
        C = jnp.asarray(
            rng.standard_normal((reps if bcast else reps * k, R)),
            dtype=jnp.float32)
        best = {}
        for nrep in (reps_lo, reps):
            fn = pl.pallas_call(
                functools.partial(_fma_kernel, nrep, bcast, k, nacc),
                grid=(nb,),
                in_specs=[
                    pl.BlockSpec(C.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((k, R), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((k, R), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((k, nb * R), jnp.float32),
            )
            jfn = jax.jit(fn)
            _ = float(jnp.sum(jfn(C, Xs[0])))  # warm/compile
            b = float("inf")
            for x in Xs:
                t0 = time.time()
                y = jfn(C, x)
                _ = float(jnp.sum(y))
                b = min(b, time.time() - t0)
            best[nrep] = b
        dt = max(best[reps] - best[reps_lo], 1e-9)
        flops = 2 * (reps - reps_lo) * k * R * nb
        rec = {
            "probe": "vpu_fma_roofline", "k": k, "R": R,
            "broadcast_coeff": bcast, "nacc": nacc,
            "reps_pair": [reps_lo, reps],
            "ms_pair": [round(best[reps_lo] * 1e3, 3),
                        round(best[reps] * 1e3, 3)],
            "gflops_marginal": round(flops / dt / 1e9, 1),
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--L", type=int, default=16)
    ap.add_argument("--reps", type=int, default=128)
    ap.add_argument("--skip-roofline", action="store_true",
                    help="general-kernel measurement only (kernel A/Bs)")
    ap.add_argument("--interpret-check", action="store_true",
                    help="tiny CPU interpret-mode smoke of the probe kernel")
    args = ap.parse_args()

    if args.interpret_check:
        jax.config.update("jax_platforms", "cpu")
        # correctness: reps x (broadcast FMA) == manual numpy
        k, R, nb, reps = 8, 128, 2, 3
        rng = np.random.default_rng(2)
        X = rng.standard_normal((k, nb * R)).astype(np.float32)
        for bcast in (True, False):
            C = rng.standard_normal(
                (reps if bcast else reps * k, R)).astype(np.float32)
            fn = pl.pallas_call(
                functools.partial(_fma_kernel, reps, bcast, k, 2),
                grid=(nb,),
                in_specs=[
                    pl.BlockSpec(C.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((k, R), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((k, R), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((k, nb * R), jnp.float32),
                interpret=True,
            )
            got = np.asarray(fn(jnp.asarray(C), jnp.asarray(X)))
            want = np.zeros_like(X)
            for b in range(nb):
                sl = slice(b * R, (b + 1) * R)
                for r in range(reps):
                    c = C[r][None, :] if bcast else C[r * k:(r + 1) * k]
                    want[:, sl] += c * X[:, sl]
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        print("interpret check ok")
        return

    probe_general_kernel(args.L)
    if not args.skip_roofline:
        probe_vpu_roofline(reps=args.reps)


if __name__ == "__main__":
    main()
