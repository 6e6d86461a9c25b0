"""SBCGrQ — thin-QR-stabilized block CG (T-S3, the flagship solver).

Reference equivalent: R7 (SURVEY.md §3.1); recurrence per SURVEY.md §1.2
(Dubrulle BIT 41 (2001) "rQ" stabilization, numerically validated there):

    [Q, S] = thinQR(B - A X0);  P = Q
    loop:
        Z   = A P                          # the hot SpMM
        a   = (P^T Z)^{-1}                 # k x k Cholesky inverse
        X  += P (a S)
        [Q, r] = thinQR(Q - Z a)           # re-orthonormalize the residual
        S   = r S                          # true residual R = Q S throughout
        P   = Q + P r^T

Invariant (unit-tested): ``B - A X == Q S`` at every iteration. Convergence
monitoring (T-C4) is free: per-RHS residual norms are the column norms of the
k x k ``S`` because Q has orthonormal columns — no (n,k) reduction needed.

Internal layout is lanes-major (see solvers/common.py) in the operator's
field view — flat (k, n) or (k, bs, ns) for block operators. Transposed
recurrence (alpha^T = conj(alpha): it is a Hermitian inverse; rho^{H,T} =
conj(rho)):

    Xt += S^T conj(alpha) Pt ;  Vt = Qt - conj(alpha) Zt
    Pt  = Qt + conj(rho) Pt

The thin QR is distributed CholeskyQR2 (T-C3): the only cross-device traffic
per iteration is one halo exchange inside ``op`` plus two k x k psums
(SURVEY.md §4.3). Residual replacement (T-C5): every ``replace_every``
iterations the true residual is recomputed with one extra SpMM and Q/S/P are
refreshed, repairing f32 drift.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from blockcg_tpu.types import SolverInfo
from blockcg_tpu.solvers.common import (
    chol_inverse_spd,
    cholqr_fused_t,
    f_matmat_gram,
    f_mm_update_gram,
    f_qr_px_update,
    kk_mm,
    qr_passes_from_gram,
    row_norms2_t,
)


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iter",
        "qr_passes",
        "replace_every",
        "axis_name",
        "record_history",
    ),
)
def _sbcgrq_impl(
    op, Bt, X0t, tol, max_iter, qr_passes, replace_every, axis_name, record_history
):
    rdtype = jnp.real(Bt).dtype
    bnorm = jnp.sqrt(row_norms2_t(Bt, axis_name, codec=op))
    bnorm = jnp.where(bnorm > 0, bnorm, jnp.asarray(1.0, rdtype))
    tol_arr = jnp.asarray(tol, rdtype)

    def fresh_qs(Xt):
        """True residual, re-factorized: one extra SpMM + thin QR."""
        Rt = Bt - op.matmat_t(Xt)
        Qt, S = cholqr_fused_t(Rt, passes=qr_passes, axis_name=axis_name,
                               codec=op)
        return Qt, S

    Q0t, S0 = fresh_qs(X0t)
    hist0 = jnp.full((max_iter,), jnp.nan, rdtype) if record_history else None

    def relres_of(S):
        # R = Q S with orthonormal Q: per-RHS residual norm = ||S e_j||.
        return jnp.sqrt(jnp.sum(jnp.real(S * jnp.conj(S)), axis=0)) / bnorm

    def cond(state):
        _, _, S, _, it, _, _ = state
        return jnp.logical_and(it < max_iter, jnp.any(relres_of(S) > tol_arr))

    def body(state):
        Xt, Qt, S, Pt, it, mv, hist = state
        # SpMM with the P^H A P Gram fused into the kernel when the operator
        # supports it (stencil ops emit it from tiles already in VMEM).
        Zt, M = f_matmat_gram(op, Pt, axis_name)
        alpha = chol_inverse_spd(M)  # Hermitian
        # Lanes-major transposed recurrence: the column-world updates
        # X += P(alpha S) and V = Q - Z alpha transpose to
        # Xt += S^T alpha^T Pt and Vt = Qt - alpha^T Zt, and alpha^T =
        # conj(alpha) for the Hermitian inverse (no-op when real).
        # Every (n, k)-sized step below is a fused one-HBM-pass kernel
        # (T-K2): the V update also emits V V^H, whose diagonal carries the
        # CholQR equilibration norms — the QR needs no extra field passes.
        alpha_t = jnp.conj(alpha)
        Vt, G = f_mm_update_gram(-alpha_t, Zt, Qt, axis_name, codec=op)
        Mi, Wt, rho = qr_passes_from_gram(G, Vt, qr_passes, axis_name,
                                         codec=op)
        # Final QR pass fused with the search-direction AND solution
        # updates (both read P; one pass). Column-world P = Q + P rho^H and
        # X += P (alpha S) transpose to Pt = Qt + conj(rho) Pt and
        # Xt += (S^T alpha^T) Pt — using the PRE-update Pt in both.
        Qt, Pt, Xt = f_qr_px_update(
            Mi, Wt, jnp.conj(rho), Pt, kk_mm(S.T, alpha_t), Xt, codec=op
        )
        S = kk_mm(rho, S)
        mv = mv + 1

        if replace_every > 0:
            def replace(args):
                Xt, _, _, _, mv = args
                Qn, Sn = fresh_qs(Xt)
                return (Xt, Qn, Sn, Qn, mv + 1)

            do = (it + 1) % replace_every == 0
            Xt, Qt, S, Pt, mv = lax.cond(
                do, replace, lambda a: a, (Xt, Qt, S, Pt, mv)
            )

        if hist is not None:
            hist = hist.at[it].set(jnp.max(relres_of(S)))
        return (Xt, Qt, S, Pt, it + 1, mv, hist)

    state0 = (X0t, Q0t, S0, Q0t, jnp.int32(0), jnp.int32(1), hist0)
    Xt, Qt, S, Pt, it, mv, hist = lax.while_loop(cond, body, state0)
    relres = relres_of(S)
    info = SolverInfo(
        iterations=it,
        relres=relres,
        converged=relres <= tol_arr,
        matvecs=mv,
        history=hist,
    )
    return Xt, info


def solve_sbcgrq(
    op: Any,
    B: jax.Array,
    X0: jax.Array | None = None,
    *,
    tol: float = 1e-6,
    max_iter: int = 1000,
    qr_passes: int = 2,
    replace_every: int = 0,
    axis_name: str | None = None,
    record_history: bool = False,
) -> tuple[jax.Array, SolverInfo]:
    """Solve ``A X = B`` (A SPD, B (n, k)) by stabilized block CG (SBCGrQ)."""
    if B.ndim == 1:
        raise ValueError("solve_sbcgrq expects an (n, k) block; use solve_cg for k=1")
    if qr_passes < 1:
        raise ValueError("qr_passes must be >= 1")
    # Solver state lives in the operator's internal field view (e.g.
    # (k, bs, ns) for block operators) — converted once here, not per apply.
    Bt = op.to_internal(B.T)
    X0t = jnp.zeros_like(Bt) if X0 is None else op.to_internal(X0.T)
    Xt, info = _sbcgrq_impl(
        op, Bt, X0t, tol, max_iter, qr_passes, replace_every, axis_name,
        record_history,
    )
    return op.from_internal(Xt).T, info
