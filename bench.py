"""Headline benchmark — prints ONE JSON line for the driver.

Metric: SpMM nnz/s per chip on north-star config 3 (3D 7-pt Laplacian 64^3,
262k rows, k=32 RHS block) through the Pallas stencil kernel, plus SBCGrQ
time-to-tol on the same config as extra fields.

vs_baseline: the reference (lkeegan/blockCG) publishes no numbers
(BASELINE.md); the baseline is the north-star target "70% of roofline
nnz/s". The config-3 roofline at the measured achievable HBM bandwidth
(611 GB/s, axpy-calibrated on this chip) with X read once is
611e9 / 40.6 B/nnz = 15.05 Gnnz/s, so baseline = 10.5 Gnnz/s.
vs_baseline >= 1.0 means the target is met.

Timing notes (this sandbox): the TPU tunnel caches repeat executions and
block_until_ready does not force execution — so we AOT-compile fori_loops of
N chained applies, time first executions with a value fetch, and difference
two loop lengths.
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_NNZS = 10.5e9  # 70% of config-3 stencil roofline @ 611 GB/s


def _timed_loop(compiled, x, n_ignored):
    t0 = time.time()
    y = compiled(x)
    _ = float(jnp.sum(y[0] if isinstance(y, tuple) else y))
    return time.time() - t0


def measure_apply(op, Xt, lengths=(8, 264, 520), trials=3, rounds=3,
                  donate=False):
    """Seconds per operator apply.

    Times jitted fori_loops of N chained applies for several N and fits the
    marginal cost (least-squares slope of times vs N), which cancels the
    per-execution fixed overhead of this sandbox's TPU tunnel (~30 ms
    dispatch+fetch, with ±10 ms one-sided jitter). Noise handling: take the
    per-length MINIMUM across all rounds x trials, then fit ONE slope.
    Tunnel noise is one-sided (hiccups only add time), so per-length minima
    converge to the true times; by contrast min-of-per-round-slope-fits —
    the first round-3 scheme — is biased LOW (a hiccup on a short loop
    tilts that round's slope down, and the min keeps the luckiest tilt).
    The long loops keep residual noise small: ±2 ms on a 520-apply loop is
    ±4 us/apply. Falls back to the longest loop's average if the fitted
    slope is non-positive.

    ``donate=True`` chains through the operator's in-place apply
    (``matmat_t(u, donate=True)`` — DIA ring path): without it, the fresh
    Pallas output entering the fori_loop carry costs XLA a FULL extra
    field copy per apply (measured 2x on the copy kernel,
    tools/probe_write_alias.py), so fresh-output chains measure
    kernel + copy, not the kernel. Solver bodies don't pay that copy for
    the SpMM (Z is a loop-local temp there), so the donated chain is the
    number that represents in-solve SpMM cost.
    """
    def nudge(u):
        # Tiny in-place mutation (128 lanes) so chained applies can't be
        # cached/hoisted, without a full-array pass per iteration (a *0.05
        # barrier multiply costs an extra read+write of the whole block —
        # ~20% on the fastest kernels).
        idx = (slice(None),) * (u.ndim - 1) + (slice(0, 128),)
        return u.at[idx].multiply(0.5)

    if donate:
        def apply_once(o, u):
            return o.matmat_t(u, donate=True)
    else:
        def apply_once(o, u):
            return o.matmat_t(u)

    compiled = {}
    for n in lengths:
        def loop(o, v, n=n):
            return jax.lax.fori_loop(
                0, n,
                lambda i, u: jax.lax.optimization_barrier(
                    nudge(apply_once(o, u))),
                v, unroll=False,
            )
        compiled[n] = jax.jit(loop).lower(op, Xt).compile()

    from blockcg_tpu.utils.platform import lsq_slope

    best = {n: float("inf") for n in lengths}
    for r in range(rounds):
        for n in lengths:
            for t in range(trials):
                xs = Xt * (1.0 + 1e-6 * (r * trials + t + 1))
                _ = float(jnp.sum(xs))  # materialize input
                t0 = time.time()
                y = compiled[n](op, xs)
                _ = float(jnp.sum(y))
                best[n] = min(best[n], time.time() - t0)
    s = lsq_slope(best)
    if s <= 0:  # tunnel noise won every sample; conservative upper bound
        nmax = max(lengths)
        return best[nmax] / nmax
    return s


def measure_gram_chain(op, Xm, use_ring, lengths=(8, 136, 264),
                       trials=3, rounds=3, fold="auto"):
    """Seconds per gram-fused merged block apply, loop dependence routed
    through the kernels' (m, m) ``seed`` operand.

    The artifact-free chain for operators whose donated apply is ILLEGAL
    (periodic operators: nonzero toroidal wrap coefficients): the field
    output Y stays loop-local — no XLA while-carry field copy — and the
    carry is the small Gram, which re-enters the next apply as a real
    kernel input so the loop body cannot be hoisted (CLAUDE.md benchmark
    invariant). Same noise handling as measure_apply: per-length MINIMA
    across rounds x trials, then one least-squares slope."""
    import functools

    from blockcg_tpu.ops.block_stencil import block_stencil_spmm_m_gram_t
    from blockcg_tpu.ops.block_stencil_ring import ring_block_spmm_m_gram_t
    from blockcg_tpu.utils.platform import lsq_slope

    # Folded periodic wraps (ring only): "auto" follows the operator's
    # dispatch default (opt-in via BLOCKCG_FOLD — chip-measured SLOWER,
    # see BlockDIAOperator._use_fold); True forces the folded stream
    # (probe arm), False the plain one (control arm).
    if fold == "auto":
        use_fold = bool(use_ring
                        and getattr(op, "_use_fold", lambda: False)())
    else:
        use_fold = bool(use_ring and fold and getattr(op, "fold", ()))
    if use_fold:
        offsets, fold_t = op.fold_offsets, op.fold
        coeffs = op.blocks_folded
    else:
        offsets, fold_t = op.offsets, ()
        coeffs = op.blocks

    def fn(blocks, offs, X, seed):
        if use_ring:
            return ring_block_spmm_m_gram_t(blocks, offs, X, seed=seed,
                                            fold=fold_t)
        return block_stencil_spmm_m_gram_t(blocks, offs, X, seed=seed)

    def loop(blocks, X, g0, n):
        def body(i, g):
            _, G = fn(blocks, offsets, X, g * jnp.float32(1e-30))
            return G
        return jax.lax.fori_loop(0, n, body, g0, unroll=False)

    m = Xm.shape[0]
    g0 = jnp.zeros((m, m), jnp.float32)
    compiled = {}
    for n in lengths:
        compiled[n] = jax.jit(
            functools.partial(loop, n=n)).lower(coeffs, Xm, g0).compile()

    best = {n: float("inf") for n in lengths}
    for r in range(rounds):
        for n in lengths:
            for t in range(trials):
                gs = g0 + 1e-6 * (r * trials + t + 1)
                _ = float(jnp.sum(gs))
                t0 = time.time()
                g = compiled[n](coeffs, Xm, gs)
                _ = float(jnp.sum(g))
                best[n] = min(best[n], time.time() - t0)
    s = lsq_slope(best)
    if s <= 0:
        nmax = max(lengths)
        return best[nmax] / nmax
    return s


def calibrate_bw(n_lanes: int = 4 * 1024 * 1024, k: int = 32,
                 lengths=(4, 36, 68)) -> float:
    """Measured achievable HBM bandwidth (GB/s) on THIS chip, in-run.

    Two calibrators, best-of: a fused Pallas Gram (2 field reads/call,
    measured 830 GB/s round 1) and an XLA triad (2 reads + 1 write). The
    per-config rooflines and frac_of_measured_bw below are stated against
    this number, not the 819 GB/s v5e spec — the chip has measured above
    spec (BASELINE.md round-1 notes), which made spec-derived ceilings
    incoherent (kernels 'above 100%'): VERDICT r2 weak item 2.
    """
    from blockcg_tpu.ops import fused
    from blockcg_tpu.utils.platform import lsq_slope

    rng = np.random.default_rng(3)
    U = jnp.asarray(rng.standard_normal((k, n_lanes)), dtype=jnp.float32)
    V = jnp.asarray(rng.standard_normal((k, n_lanes)), dtype=jnp.float32)

    def time_loop(make_loop, nbytes_per_iter):
        compiled = {}
        for n in lengths:
            compiled[n] = jax.jit(make_loop(n)).lower(U, V).compile()
        best = {}
        for n in lengths:
            b = float("inf")
            for t in range(3):
                t0 = time.time()
                y = compiled[n](U, V)
                _ = float(jnp.sum(y[0] if isinstance(y, tuple) else y))
                b = min(b, time.time() - t0)
            best[n] = b
        slope = lsq_slope(best)
        if slope <= 0:
            slope = best[max(lengths)] / max(lengths)
        return nbytes_per_iter / slope

    # Fused Gram: reads U and V once per call (k x k output negligible).
    # The loop-carried dependence goes through the kernel's additive seed
    # input — REAL data flow, zero extra field traffic. Neither a tuple
    # optimization_barrier (elements are independent: the invariant Gram
    # hoists out of the loop and the "bandwidth" reads 2.9 TB/s —
    # CHIP_QUEUE_r3b.log) nor a `v + eps*carry` dependence (adds an
    # uncounted read+write pair per iteration and halves the reported BW)
    # measures the kernel honestly.
    def gram_loop(n):
        def loop(u, v):
            def body(i, carry):
                return fused.gram(u, v, 1e-30 * carry)
            return jax.lax.fori_loop(0, n, body,
                                     jnp.zeros((k, k), jnp.float32))
        return loop

    gram_bw = time_loop(gram_loop, 2 * 4 * k * n_lanes)

    # Triad: y = u + 0.5 y (2 reads + 1 write per iteration).
    def triad_loop(n):
        def loop(u, v):
            return jax.lax.fori_loop(
                0, n,
                lambda i, y: jax.lax.optimization_barrier(u + 0.5 * y),
                v)
        return loop

    triad_bw = time_loop(triad_loop, 3 * 4 * k * n_lanes)
    return max(gram_bw, triad_bw) / 1e9


def stencil_bytes_per_nnz(op, k: int) -> tuple[float, float]:
    """(bytes/apply, bytes/nnz) for the DIA stencil kernel from the
    PLANNER'S actual x_reads — not the x-read-once idealization that made
    round-1/2 kernels measure 'above the ceiling' (VERDICT r2 weak 2)."""
    from blockcg_tpu.ops import stencil

    ndiag, n = op.diags.shape
    p = stencil.plan(n, k, op.offsets)
    x_reads = p.x_reads if p is not None else float(ndiag)
    esz = jnp.dtype(op.dtype).itemsize
    bytes_apply = esz * (ndiag * n + (x_reads + 1.0) * k * n)
    return bytes_apply, bytes_apply / op.nnz


def _probe_backend(timeout_s: int = 300) -> str | None:
    """Probe TPU backend liveness in a SUBPROCESS with a timeout.

    The axon tunnel has been observed down for hours (2026-08-17), during
    which backend init blocks indefinitely with no error — probing in-process
    would hang the driver's whole round-end pipeline. Returns an error
    string, or None when the backend is up."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices())"],
            capture_output=True, timeout=timeout_s, text=True,
        )
    except subprocess.TimeoutExpired:
        return f"backend init did not complete within {timeout_s}s"
    if r.returncode != 0:
        return (r.stderr.strip().splitlines() or ["backend init failed"])[-1]
    return None


def main():
    err = _probe_backend()
    if err is not None:
        print(json.dumps({
            "metric": "SpMM nnz/s per chip (config 3: 3D Laplacian 64^3, k=32, Pallas stencil)",
            "value": None,
            "unit": "Gnnz/s",
            "vs_baseline": None,
            "error": f"TPU backend unavailable: {err}",
        }))
        raise SystemExit(1)

    import blockcg_tpu as bc
    from blockcg_tpu.problems import dirac_cbdia, laplacian_dia

    op = laplacian_dia((64, 64, 64), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    Xt = jnp.asarray(rng.standard_normal((32, op.n)), dtype=jnp.float32)

    dt = measure_apply(op, Xt)
    nnzs = op.nnz / dt

    # One consistent roofline (VERDICT r2 item 4): ceiling = in-run
    # calibrated bandwidth / planner-derived bytes-per-nnz; the kernel's
    # implied bandwidth is reported as a fraction of the CALIBRATED number.
    calib_bw = calibrate_bw()
    bytes_apply, bpn = stencil_bytes_per_nnz(op, Xt.shape[0])
    roofline_nnzs = calib_bw * 1e9 / bpn
    implied_bw = bytes_apply / dt / 1e9

    # Streaming-regime apply (VERDICT r3 item 5): the contract regime is
    # the >=1M-row 3D Laplacian where the working set CANNOT sit in VMEM.
    # Chained through the DONATED ring apply — the artifact-free chain
    # (fresh-output chains pay a full XLA carry copy per apply; see
    # tools/probe_write_alias.py / probe_ring_donate.py, CHIP_QUEUE_r4.log:
    # 17.8 Gnnz/s donated vs 9.0 fresh at 128^3).
    op_s = laplacian_dia((128, 128, 64), dtype=jnp.float32)  # 1,048,576 rows
    Xs = jnp.asarray(rng.standard_normal((32, op_s.n)), dtype=jnp.float32)
    dt_s = measure_apply(op_s, Xs, donate=True)
    k_s, ndiag_s = Xs.shape[0], len(op_s.offsets)
    streaming_traffic = 4.0 * (k_s * op_s.n * 1.0 + ndiag_s * op_s.n
                               + k_s * op_s.n)  # ring: X once + diags + Y
    streaming_gnnzs = op_s.nnz / dt_s / 1e9

    # Config 4 (Dirac 32^4, k=12) SpMM as an extra data point.
    op4 = dirac_cbdia(32, m=0.5, dtype=jnp.float32)
    X4 = op4.to_internal(
        jnp.asarray(rng.standard_normal((12, op4.n)), dtype=jnp.float32)
    )
    dt4 = measure_apply(op4, X4)

    # Matrix-valued-link (SU(N)-style) general block kernel at 32^4 — the
    # problem family the const-hop factorization cannot express, measured
    # with the gram-seed chain (artifact-free for this periodic operator;
    # see measure_gram_chain / tools/probe_block_ring.py). Guarded: a
    # failure here must not take down the headline metric.
    matrix_link: dict = {}
    try:
        from blockcg_tpu.ops import block_stencil_ring
        from blockcg_tpu.problems import dirac_gauged_matrix

        opm = dirac_gauged_matrix(32, m=0.5, dtype=jnp.float32)
        k_m = 12
        # Dedicated rng (advisor r4): drawing from the shared `rng` here
        # would shift the headline SBCGrQ B draw below relative to every
        # pre-round-4 baseline row (and make it depend on whether this
        # guarded block fails before its draw).
        rng_m = np.random.default_rng(1234)
        Xm = opm.to_internal(jnp.asarray(
            rng_m.standard_normal((k_m, opm.n)), dtype=jnp.float32))
        use_ring = block_stencil_ring.available(
            opm.ns, opm.bs * k_m, opm.bs, opm.offsets)
        dt_m = measure_gram_chain(opm, Xm, use_ring)
        matrix_link = {
            "matrix_link_gnnzs": round(opm.nnz / dt_m / 1e9, 2),
            "matrix_link_kernel": "ring" if use_ring else "windowed",
        }
    except Exception as e:  # pragma: no cover - chip-env guard
        matrix_link = {"matrix_link_error": f"{type(e).__name__}: {e}"}

    # The literal north-star composition (VERDICT r4 item 5): "SBCGrQ
    # converges to ||R||/||B|| <= 1e-10 on a 1M-row 3D Laplacian with 32
    # RHS" — run at 128^3 = 2.1M rows (> the 1M the contract names) through
    # the current stack (ring kernel + donation + f64-outer refinement) and
    # recorded as one number in the driver JSON. Guarded like matrix_link.
    northstar: dict = {}
    try:
        from blockcg_tpu.solvers.refine import solve_refined

        op_ns = laplacian_dia((128, 128, 128), dtype=jnp.float32)
        rng_ns = np.random.default_rng(5678)
        B_ns = jnp.asarray(rng_ns.standard_normal((op_ns.n, 32)),
                           dtype=jnp.float32)
        # Schedule tuned by measurement (CHIP_QUEUE_r5.log
        # probe-northstar-tuning): inner_tol 3e-6 / adaptive 1-pass QR
        # converges in 2 cycles, 386 matvecs, 2.04 s, relres 4.4e-11 —
        # vs 3.47 s at the generic defaults (1e-5 / 2).
        ns_kw = dict(tol=1e-10, inner_tol=3e-6, qr_passes=1)
        X_ns, info_ns = solve_refined(op_ns, B_ns, **ns_kw)  # warm/compile
        _ = int(info_ns.iterations)
        ns_s = float("inf")
        for t in range(2):
            bs_ns = B_ns * (1.0 + 1e-6 * (t + 1))
            _ = float(jnp.sum(bs_ns))
            t0 = time.time()
            X_ns, info_ns = solve_refined(op_ns, bs_ns, **ns_kw)
            _ = int(info_ns.iterations)
            ns_s = min(ns_s, time.time() - t0)
        northstar = {
            "northstar_1e10_s": round(ns_s, 3),
            "northstar_relres": float(jnp.max(info_ns.relres)),
            "northstar_rows": op_ns.n,
        }
    except Exception as e:  # pragma: no cover - chip-env guard
        northstar = {"northstar_error": f"{type(e).__name__}: {e}"}

    # SBCGrQ time-to-tol on the same config (32 RHS, tol 1e-6).
    B = jnp.asarray(rng.standard_normal((op.n, 32)), dtype=jnp.float32)
    X, info = bc.solve_sbcgrq(op, B, tol=1e-6, max_iter=300)
    _ = int(info.iterations)  # warm/compile + force
    solve_s = float("inf")
    for t in range(3):
        bs_ = B * (1.0 + 1e-6 * (t + 1))
        _ = float(jnp.sum(bs_))
        t0 = time.time()
        X, info = bc.solve_sbcgrq(op, bs_, tol=1e-6, max_iter=300)
        iters = int(info.iterations)
        solve_s = min(solve_s, time.time() - t0)

    print(json.dumps({
        "metric": "SpMM nnz/s per chip (config 3: 3D Laplacian 64^3, k=32, Pallas stencil)",
        "value": round(nnzs / 1e9, 3),
        "unit": "Gnnz/s",
        "vs_baseline": round(nnzs / BASELINE_NNZS, 3),
        "calib_bw_gbs": round(calib_bw, 1),
        "roofline_gnnzs": round(roofline_nnzs / 1e9, 3),
        "frac_of_roofline": round(nnzs / roofline_nnzs, 3),
        "frac_of_measured_bw": round(implied_bw / calib_bw, 3),
        # frac > 1 is real, not an error: the 32 MB chained-loop carry
        # stays VMEM-resident at 64^3 (128 MB VMEM), so X never re-streams
        # from HBM — the roofline is an HBM-streaming model. See the size
        # sweep in BASELINE.md round-3 measurements (>=1M-row problems
        # stream at ~6.2 Gnnz/s = 63% of calibration).
        "working_set_vmem_resident": bool(bytes_apply - 4 * op.nnz < 128e6),
        # The contract regime (>=1M rows, nothing VMEM-resident): donated
        # ring-kernel chain on a 1,048,576-row 3D Laplacian, k=32.
        "streaming_gnnzs": round(streaming_gnnzs, 2),
        "streaming_frac_of_bw": round(
            streaming_traffic / dt_s / 1e9 / calib_bw, 3),
        "streaming_ms": round(dt_s * 1e3, 4),
        "spmm_ms": round(dt * 1e3, 4),
        "sbcgrq_time_to_tol_s": round(solve_s, 3),
        "sbcgrq_iters": iters,
        "sbcgrq_max_relres": float(jnp.max(info.relres)),
        "dirac32_gnnzs": round(op4.nnz / dt4 / 1e9, 3),
        **matrix_link,
        **northstar,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
