"""Split the SBCGrQ per-iteration tail cost on the real chip.

Components timed separately (slope method over chained fori_loops, which
cancels the ~30 ms tunnel dispatch overhead — see bench.py measure_apply):

  1. k x k coefficient chain (chol_inverse + qr_factors_from_gram + kk_mms)
  2. fused field kernels (f_mm_update_gram + f_qr_px_update) at config-3 size
  3. full solve: qr_passes 1 vs 2 x replace_every {0, 25, 50} — iters + time
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from blockcg_tpu.solvers.common import (
    chol_inverse_spd,
    kk_mm,
    qr_factors_from_gram,
)


def slope_time(make_loop, lengths=(64, 768), trials=3, args=()):
    # Large fields must be ARGUMENTS, not closure captures: captured
    # constants are baked into the program and the remote-compile upload
    # hits the tunnel's HTTP body limit at 128^3 sizes (413, first
    # profile-tail-128 run, CHIP_QUEUE_r5.log).
    compiled = {n: jax.jit(make_loop(n)).lower(*args).compile()
                for n in lengths}
    best = {}
    for n in lengths:
        b = float("inf")
        for _ in range(trials):
            t0 = time.time()
            out = compiled[n](*args)
            _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
            b = min(b, time.time() - t0)
        best[n] = b
    from blockcg_tpu.utils.platform import lsq_slope

    return lsq_slope(best)


def main(sections=(1, 2, 3)):
    k = 32
    rng = np.random.default_rng(0)
    V = rng.standard_normal((256, k))
    G0 = jnp.asarray(V.T @ V, dtype=jnp.float32)
    S0 = jnp.asarray(rng.standard_normal((k, k)), dtype=jnp.float32)

    if 1 in sections:
        run_kk(k, G0, S0)
    if 2 in sections:
        run_field(k, rng)
    if 3 in sections:
        run_solves(rng, k)
    if 4 in sections:
        # Streaming size (VERDICT r4 item 9): per-kernel split + in-solve
        # ms/iter at 128^3, where nothing is VMEM-resident. Pass target:
        # apply ~2.2 + mm2 3 + px 5 = 10.2; the measured 4.68 ms/iter
        # implies ~13 — this section locates the excess.
        print("--- streaming size 128^3 ---")
        run_field(k, rng, n3=128 ** 3, split=True)
        run_solves(rng, k, dim=128, variants=[(1, 0)])


def run_kk(k, G0, S0):
    # --- 1. k x k chain (one SBCGrQ iteration's coefficient algebra) ------
    def kk_iter(carry):
        G, S = carry
        alpha = chol_inverse_spd(G)  # stands in for (P^H Z)^{-1}
        M1, R1 = qr_factors_from_gram(G)
        S2 = kk_mm(R1, S)
        C = kk_mm(S2.T, jnp.conj(alpha))
        G2 = kk_mm(M1, kk_mm(G, M1.T))  # keep G SPD-ish and data-dependent
        G2 = 0.5 * (G2 + G2.T) + jnp.eye(k) * 1e-3
        return (jax.lax.optimization_barrier(G2 + G0 * 1e-6),
                jax.lax.optimization_barrier(S2 + C * 1e-6))

    def make_kk_loop(n):
        def loop():
            return jax.lax.fori_loop(
                0, n, lambda i, c: kk_iter(c), (G0, S0), unroll=False
            )
        return loop

    t_kk = slope_time(make_kk_loop, lengths=(64, 768))
    print(f"kk-chain per iter: {t_kk*1e6:.1f} us")

    # chol_inverse alone
    def make_chol_loop(n):
        def loop():
            def body(i, G):
                A = chol_inverse_spd(G)
                G2 = 0.5 * (A + A.T) + jnp.eye(k) * 1.0
                return jax.lax.optimization_barrier(G2)
            return jax.lax.fori_loop(0, n, body, G0, unroll=False)
        return loop

    t_chol = slope_time(make_chol_loop, lengths=(64, 768))
    print(f"chol_inverse_spd per call: {t_chol*1e6:.1f} us")

    # qr_factors_from_gram alone
    def make_qrf_loop(n):
        def loop():
            def body(i, G):
                M1, R1 = qr_factors_from_gram(G)
                G2 = kk_mm(M1, kk_mm(G, M1.T))
                G2 = 0.5 * (G2 + G2.T) + jnp.eye(k) * 1e-3
                return jax.lax.optimization_barrier(G2 + G0 * 1e-6)
            return jax.lax.fori_loop(0, n, body, G0, unroll=False)
        return loop

    t_qrf = slope_time(make_qrf_loop, lengths=(64, 768))
    print(f"qr_factors_from_gram per call: {t_qrf*1e6:.1f} us")


def run_field(k, rng, n3=64 * 64 * 64, split=False):
    # --- 2. fused field kernels (config-3 size by default; section 4 runs
    # the 128^3 streaming size where VMEM residency cannot flatter) -------
    Zt = jnp.asarray(rng.standard_normal((k, n3)), dtype=jnp.float32)
    Qt = jnp.asarray(rng.standard_normal((k, n3)), dtype=jnp.float32)
    Pt = jnp.asarray(rng.standard_normal((k, n3)), dtype=jnp.float32)
    Xt = jnp.zeros((k, n3), jnp.float32)
    A0 = jnp.asarray(np.eye(k) * 0.5, dtype=jnp.float32)

    from blockcg_tpu.ops import fused

    def make_field_loop(n):
        def loop(Q0, P0, X0, Z0):
            def body(i, c):
                Q, P, X = c
                V, G = fused.mm_update_gram(A0, Q, P)
                M1, R1 = qr_factors_from_gram(G)
                Qn, Pn, Xn = fused.qr_px_update(M1, V, A0, P, A0, X)
                return (jax.lax.optimization_barrier(Qn),
                        jax.lax.optimization_barrier(Pn),
                        jax.lax.optimization_barrier(Xn))
            return jax.lax.fori_loop(0, n, body, (Q0, P0, X0), unroll=False)
        return loop

    t_field = slope_time(make_field_loop, lengths=(8, 136),
                         args=(Qt, Pt, Xt, Zt))
    print(f"fused V-update(3p) + qrf + tail(6p) per iter: {t_field*1e3:.3f} ms"
          f"  ({9*k*n3*4/t_field/1e9:.0f} GB/s over 9 passes)")

    # Implicit-Q round-2 chain: V = Mqr W - alpha Z (+Gram), then
    # P' = Mqr2 W2 + rho^H P / X' = X + C P — 8 passes total.
    def make_iq_loop(n):
        def loop(Q0, P0, X0, Z0):
            def body(i, c):
                W, P, X = c
                V, G = fused.mm2_update_gram(A0, W, -A0, Z0)
                M1, R1 = qr_factors_from_gram(G)
                Pn, Xn = fused.px_update(M1, V, A0, P, A0, X)
                return (jax.lax.optimization_barrier(V),
                        jax.lax.optimization_barrier(Pn),
                        jax.lax.optimization_barrier(Xn))
            return jax.lax.fori_loop(0, n, body, (Q0, P0, X0), unroll=False)
        return loop

    t_iq = slope_time(make_iq_loop, lengths=(8, 136),
                      args=(Qt, Pt, Xt, Zt))
    print(f"implicit-Q mm2(3p) + qrf + px(5p) per iter: {t_iq*1e3:.3f} ms"
          f"  ({8*k*n3*4/t_iq/1e9:.0f} GB/s over 8 passes)")

    if not split:
        return

    # Per-kernel split at this size (VERDICT r4 item 9: which kernel is
    # below streaming bandwidth at 128^3?). Both kernels donate their dead
    # field operand, so the chained carries pay no XLA copy.
    def make_mm2_loop(n):
        def loop(Q0, P0, X0, Z0):
            def body(i, W):
                V, G = fused.mm2_update_gram(A0, W, -A0, Z0)
                return jax.lax.optimization_barrier(
                    V + jnp.float32(1e-30) * G[0, 0])
            return jax.lax.fori_loop(0, n, body, Q0, unroll=False)
        return loop

    t_mm2 = slope_time(make_mm2_loop, lengths=(8, 136),
                       args=(Qt, Pt, Xt, Zt))
    print(f"  mm2_update_gram alone (3p): {t_mm2*1e3:.3f} ms"
          f"  ({3*k*n3*4/t_mm2/1e9:.0f} GB/s)")

    def make_px_loop(n):
        def loop(Q0, P0, X0, Z0):
            def body(i, c):
                P, X = c
                Pn, Xn = fused.px_update(A0, Q0, A0, P, A0, X)
                return (jax.lax.optimization_barrier(Pn),
                        jax.lax.optimization_barrier(Xn))
            return jax.lax.fori_loop(0, n, body, (P0, X0), unroll=False)
        return loop

    t_px = slope_time(make_px_loop, lengths=(8, 136),
                      args=(Qt, Pt, Xt, Zt))
    print(f"  px_update alone (5p): {t_px*1e3:.3f} ms"
          f"  ({5*k*n3*4/t_px/1e9:.0f} GB/s)")


def run_solves(rng, k, dim=64, variants=None):
    # --- 3. full solves (config 3 by default; section 4 runs 128^3) -------
    from blockcg_tpu.problems import laplacian_dia
    from blockcg_tpu.solvers.sbcgrq import solve_sbcgrq

    op = laplacian_dia((dim, dim, dim), dtype=jnp.float32)
    B = jnp.asarray(rng.standard_normal((op.n, k)), dtype=jnp.float32)
    for qp, re_ in (variants or
                    [(qp, re_) for qp in (2, 1) for re_ in (0, 50, 25)]):
            X, info = solve_sbcgrq(op, B, tol=1e-6, max_iter=400,
                                   qr_passes=qp, replace_every=re_)
            _ = int(info.iterations)  # compile+force
            best = float("inf")
            for t in range(3):
                bs_ = B * (1.0 + 1e-6 * (t + 1))
                _ = float(jnp.sum(bs_))
                t0 = time.time()
                X, info = solve_sbcgrq(op, bs_, tol=1e-6, max_iter=400,
                                       qr_passes=qp, replace_every=re_)
                it = int(info.iterations)
                best = min(best, time.time() - t0)
            mrel = float(jnp.max(info.relres))
            print(f"qr_passes={qp} replace_every={re_:3d}: {best:.3f} s, "
                  f"{it} iters, {best/it*1e3:.3f} ms/iter, relres {mrel:.2e}")


if __name__ == "__main__":
    import sys
    secs = tuple(int(c) for c in (sys.argv[1] if len(sys.argv) > 1 else "123"))
    main(secs)
