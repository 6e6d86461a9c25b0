"""Solver configuration and result types.

Reference equivalent: the reference solvers take ``(X, B, A, tol)`` and return
an iteration count (SURVEY.md §4.1). Here options/results are structured so the
info can flow out of jitted ``lax.while_loop`` bodies as a pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SolverOptions:
    """Options shared by all solvers (static under jit).

    Attributes:
      tol: per-RHS relative residual target, ``max_j ||R e_j|| / ||B e_j|| <= tol``.
      max_iter: hard iteration cap for the ``lax.while_loop``.
      qr_passes: CholeskyQR passes in the thin-QR stage. 1 (the default,
        matching solve_sbcgrq) runs a single CholeskyQR with an adaptive
        second pass under ``lax.cond`` when the Gram is ill-conditioned;
        2 forces CholeskyQR2 unconditionally.
      replace_every: residual-replacement period (0 = never). Every
        ``replace_every`` iterations the true residual ``B - A X`` is recomputed
        with one extra SpMM and the Q/S factorization is refreshed
        (SURVEY.md T-C5).
      record_history: if True, solvers record the per-iteration max relative
        residual into a ``(max_iter,)`` ring buffer returned in ``SolverInfo``.
    """

    tol: float = 1e-6
    max_iter: int = 1000
    qr_passes: int = 1
    replace_every: int = 0
    record_history: bool = False

    def kwargs(self, *, drop: tuple = ()) -> dict:
        """Expand into solver keyword arguments:
        ``solve_sbcgrq(op, B, **opts.kwargs())``. The SBCGrQ family (and
        its dist mirrors) accepts every name; for solvers without the rQ
        stage pass ``drop=("qr_passes", "replace_every")``
        (solve_bcg / solve_cg)."""
        d = dataclasses.asdict(self)
        for k in drop:
            d.pop(k, None)
        return d


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SolverInfo:
    """Result metadata, device-resident (a pytree, safe to return from jit).

    Attributes:
      iterations: number of iterations executed.
      relres: per-RHS relative residual estimate at exit, shape (k,).
      converged: True where ``relres <= tol``, shape (k,).
      matvecs: number of operator applications (SpMMs) performed.
      history: optional (max_iter,) max-relative-residual trace (NaN-padded),
        present only when ``SolverOptions.record_history`` was set.
      per_rhs_iters: optional (k,) int32 — iterations each RHS column spent
        unconverged (T-C4 "per-RHS iteration counts"; reference R9 reports a
        single count, SURVEY.md §3.1). Solvers that monitor per RHS fill it.
      matvec_cols: optional scalar — total SpMM column-passes (sum of
        block-width x matvecs over deflation stages); the bandwidth-weighted
        work metric that converged-column deflation reduces.
      breakdown: optional device bool (SBCGrQ family) — True when some
        thin-QR's achieved orthogonality error exceeded 1% (k x k-side
        estimate, solvers/common.qr_ortho_err): the residual block was
        numerically rank-deficient beyond CholeskyQR2 repair (e.g.
        near-duplicate RHS columns with kappa(B) >> 1/sqrt(eps)). The
        S-based monitor is then unreliable — deduplicate/drop dependent
        columns, or solve with ``replace_every`` so the true residual
        re-anchors the recurrence.
    """

    iterations: jax.Array
    relres: jax.Array
    converged: jax.Array
    matvecs: jax.Array
    history: Any = None
    per_rhs_iters: Any = None
    matvec_cols: Any = None
    breakdown: Any = None

    def __repr__(self) -> str:  # pragma: no cover - debug convenience
        try:
            return (
                f"SolverInfo(iterations={int(self.iterations)}, "
                f"max_relres={float(jnp.max(self.relres)):.3e}, "
                f"converged={bool(jnp.all(self.converged))}, "
                f"matvecs={int(self.matvecs)})"
            )
        except Exception:
            return object.__repr__(self)
