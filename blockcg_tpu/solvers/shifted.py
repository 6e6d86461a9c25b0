"""Multi-shift CG (T-S4; reference R8 equivalent, SURVEY.md §1.1/§3.1).

Solves ``(A + sigma_j I) x_j = b`` for many shifts sigma_j >= 0 with ONE
Krylov space — one SpMV per iteration total, plus O(nshift) scalar
recurrences and (nshift, n) vector updates. Standard lattice-QCD machinery
(B. Jegerlehner, hep-lat/9612014, "Krylov space solvers for shifted linear
systems"): the shifted residuals stay collinear with the seed residual,
``r_sigma^i = zeta_sigma^i r^i``, and the zeta factors obey a three-term
scalar recurrence.

Seed system is sigma = 0 (A itself). Shift state carries a leading
``nshift`` axis over the lanes-major (n,) vectors (SURVEY.md §1.2 "shifted
extension": a leading-dimension change, not a rewrite).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from blockcg_tpu.types import SolverInfo
from blockcg_tpu.solvers.common import psum_if


@functools.partial(
    jax.jit, static_argnames=("max_iter", "axis_name", "record_history")
)
def _shifted_cg_impl(op, b, sigmas, tol, max_iter, axis_name, record_history):
    dtype = b.dtype
    rdtype = jnp.real(b).dtype
    nshift = sigmas.shape[0]
    bnorm2 = psum_if(jnp.real(jnp.vdot(b, b)), axis_name)
    bnorm2 = jnp.where(bnorm2 > 0, bnorm2, jnp.asarray(1.0, rdtype))
    tol2 = jnp.asarray(tol, rdtype) ** 2 * bnorm2

    r0 = b
    p0 = b
    rho0 = bnorm2
    xs0 = jnp.zeros((nshift,) + b.shape, dtype)
    ps0 = jnp.broadcast_to(b, (nshift,) + b.shape).astype(dtype)
    # The shift recurrence scalars (zeta, alpha, beta) are REAL for
    # Hermitian A and real shifts — only the vectors carry the dtype.
    zeta0 = jnp.ones((nshift,), rdtype)   # zeta^i
    zeta_m0 = jnp.ones((nshift,), rdtype)  # zeta^{i-1}
    hist0 = jnp.full((max_iter,), jnp.nan, rdtype) if record_history else None

    # state: (xs, ps, r, p, rho, zeta, zeta_m, alpha_old, beta_old, it, hist)
    state0 = (
        xs0, ps0, r0, p0, rho0, zeta0, zeta_m0,
        jnp.asarray(1.0, rdtype), jnp.asarray(0.0, rdtype), jnp.int32(0),
        hist0,
    )

    def shifted_resnorm2(zeta, rho):
        # ||r_sigma||^2 = zeta^2 ||r||^2
        return zeta * zeta * rho

    def cond(state):
        _, _, _, _, rho, zeta, _, _, _, it, _ = state
        active = shifted_resnorm2(zeta, rho) > tol2
        return jnp.logical_and(it < max_iter, jnp.any(active))

    def body(state):
        xs, ps, r, p, rho, zeta, zeta_m, a_old, b_old, it, hist = state
        z = op.matvec(p)
        # p^H A p and r^H r are real for Hermitian A — take the real part
        # explicitly (the imaginary rounding residue would otherwise flip
        # the while_loop carry to a complex dtype and fail to trace).
        denom = psum_if(jnp.real(jnp.vdot(p, z)), axis_name)
        alpha = rho / denom
        # zeta recurrence (Jegerlehner eq. (2.44)-style, seed sigma = 0)
        num = zeta * zeta_m * a_old
        den = alpha * b_old * (zeta_m - zeta) + zeta_m * a_old * (1.0 + sigmas * alpha)
        zeta_new = num / den
        alpha_s = alpha * zeta_new / zeta

        # freeze converged shifts (their zeta/den can degenerate)
        active = shifted_resnorm2(zeta, rho) > tol2
        zeta_new = jnp.where(active, zeta_new, zeta)
        alpha_s = jnp.where(active, alpha_s, 0.0)

        xs = xs + alpha_s[:, None] * ps
        r_new = r - alpha * z
        rho_new = psum_if(jnp.real(jnp.vdot(r_new, r_new)), axis_name)
        beta = rho_new / rho
        beta_s = beta * (zeta_new / zeta) ** 2
        ps = zeta_new[:, None] * r_new[None, :] + beta_s[:, None] * ps
        p_new = r_new + beta * p
        if hist is not None:
            worst = jnp.max(shifted_resnorm2(zeta_new, rho_new) / bnorm2)
            hist = hist.at[it].set(jnp.sqrt(worst))
        return (
            xs, ps, r_new, p_new, rho_new, zeta_new, zeta, alpha, beta,
            it + 1, hist,
        )

    xs, ps, r, p, rho, zeta, zeta_m, a_old, b_old, it, hist = lax.while_loop(
        cond, body, state0
    )
    relres = jnp.sqrt(shifted_resnorm2(zeta, rho) / bnorm2)
    info = SolverInfo(
        iterations=it,
        relres=relres,
        converged=relres <= tol,
        matvecs=it,
        history=hist,
    )
    return xs, info


def solve_shifted_cg(
    op: Any,
    b: jax.Array,
    sigmas,
    *,
    tol: float = 1e-6,
    max_iter: int = 1000,
    axis_name: str | None = None,
    record_history: bool = False,
) -> tuple[jax.Array, SolverInfo]:
    """Solve ``(A + sigma_j I) x_j = b`` for all shifts at once.

    Args:
      op: SPD LinearOperator (the unshifted A — the seed system).
      b: (n,) right-hand side.
      sigmas: (nshift,) shifts, each >= 0.

    Returns:
      (X, info): X is (n, nshift); ``info.relres``/``converged`` are
      per-shift.
    """
    if b.ndim != 1:
        raise ValueError("solve_shifted_cg expects a single (n,) RHS")
    sig = jnp.asarray(sigmas, dtype=jnp.real(b).dtype)
    xs, info = _shifted_cg_impl(
        op, b, sig, tol, max_iter, axis_name, record_history
    )
    return xs.T, info
