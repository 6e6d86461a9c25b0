"""Block CG solver (T-S2), O'Leary 1980. Reference equivalent: R6
(SURVEY.md §3.1, recurrence §1.2): all k right-hand sides share one block
Krylov space; the per-iteration coefficients are k x k SPD solves.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from blockcg_tpu.types import SolverInfo
from blockcg_tpu.solvers.common import (
    HIGHEST,
    block_dot,
    chol_solve_spd,
    col_norms2,
)


def _mm(a, b):
    return jnp.matmul(a, b, precision=HIGHEST, preferred_element_type=a.dtype)


@functools.partial(
    jax.jit, static_argnames=("max_iter", "axis_name", "record_history")
)
def _bcg_impl(op, B, X0, tol, max_iter, axis_name, record_history):
    dtype = B.dtype
    bnorm2 = col_norms2(B, axis_name)
    bnorm2 = jnp.where(bnorm2 > 0, bnorm2, jnp.asarray(1.0, dtype))
    tol2 = jnp.asarray(tol, dtype) ** 2 * bnorm2

    R0 = B - op(X0)
    S0 = block_dot(R0, R0, axis_name)
    hist0 = jnp.full((max_iter,), jnp.nan, dtype) if record_history else None

    def cond(state):
        _, _, _, S, it, _ = state
        return jnp.logical_and(it < max_iter, jnp.any(jnp.diag(S) > tol2))

    def body(state):
        X, R, P, S, it, hist = state
        Z = op(P)
        M = block_dot(P, Z, axis_name)  # P^T A P
        alpha = chol_solve_spd(M, S)  # M alpha = S
        X = X + _mm(P, alpha)
        R = R - _mm(Z, alpha)
        S_new = block_dot(R, R, axis_name)
        beta = chol_solve_spd(S, S_new)  # S beta = S'
        P = R + _mm(P, beta)
        if hist is not None:
            hist = hist.at[it].set(jnp.sqrt(jnp.max(jnp.diag(S_new) / bnorm2)))
        return (X, R, P, S_new, it + 1, hist)

    X, R, P, S, it, hist = lax.while_loop(
        cond, body, (X0, R0, R0, S0, jnp.int32(0), hist0)
    )
    relres = jnp.sqrt(jnp.diag(S) / bnorm2)
    info = SolverInfo(
        iterations=it,
        relres=relres,
        converged=relres <= tol,
        matvecs=it + 1,
        history=hist,
    )
    return X, info


def solve_bcg(
    op: Any,
    B: jax.Array,
    X0: jax.Array | None = None,
    *,
    tol: float = 1e-6,
    max_iter: int = 1000,
    axis_name: str | None = None,
    record_history: bool = False,
) -> tuple[jax.Array, SolverInfo]:
    """Solve ``A X = B`` (A SPD, B an (n, k) block) by O'Leary block CG.

    Convergence rule matches the reference: every RHS must satisfy
    ``||R e_j|| <= tol * ||B e_j||`` (SURVEY.md §1.2). Prefer
    ``solve_sbcgrq`` when k is large or iteration counts are high — plain BCG
    loses rank in the Gram matrices as columns converge.
    """
    if B.ndim == 1:
        raise ValueError("solve_bcg expects an (n, k) block; use solve_cg for k=1")
    if X0 is None:
        X0 = jnp.zeros_like(B)
    return _bcg_impl(op, B, X0, tol, max_iter, axis_name, record_history)
