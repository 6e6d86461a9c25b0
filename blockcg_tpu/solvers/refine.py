"""Mixed-precision iterative refinement to 1e-10 (T-C5; SURVEY.md §8 #1).

f32 epsilon is ~1.2e-7 and the TPU MXU has no native f64, so a single f32
Krylov solve cannot reach the north-star tolerance of 1e-10. The standard,
defensible route (SURVEY.md hard part #1) is iterative refinement:

    X = 0 (f64)
    repeat:
        R = B - A X           # true residual in f64 (XLA-emulated on TPU,
                              #   one SpMM per cycle — off the hot path)
        stop if max_j ||R e_j|| / ||B e_j|| <= tol
        D = inner_solve(A_f32, R_f32, tol=inner_tol)   # hot f32 SBCGrQ
        X += D

Each cycle contracts the residual by roughly ``inner_tol`` (plus a
kappa(A)*eps_32 floor per cycle), so 1e-10 takes 2–3 cycles at
inner_tol=1e-5. The residual-replacement machinery inside SBCGrQ
(replace_every) is the same mechanism applied within a cycle.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from blockcg_tpu.types import SolverInfo
from blockcg_tpu.operators.base import astype as op_astype
from blockcg_tpu.solvers.sbcgrq import solve_sbcgrq
from blockcg_tpu.solvers.bcg import solve_bcg


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def _refine_cycle(op64, X, D, scale, B64, bnorm, compute_dtype):
    """One compiled outer-refinement program (f64; XLA-emulated on TPU):
    apply the previous cycle's correction, recompute the true residual,
    rescale it per-RHS, and cast the next inner RHS — one dispatch per
    cycle instead of the former eager chain (the ~30 ms-per-dispatch
    tunnel made the eager version host-bound; same pattern as
    poly.py:_cheb_cycle). First cycle passes D = 0."""
    X = X + D.astype(X.dtype) * scale[None, :]
    R = B64 - op64.matmat(X)
    nrm = jnp.linalg.norm(R, axis=0)
    relres = nrm / bnorm
    sc = jnp.where(nrm > 0, nrm, jnp.ones_like(nrm))
    R_next = (R / sc[None, :]).astype(compute_dtype)
    return X, R_next, sc, relres


def solve_refined(
    op,
    B: jax.Array,
    *,
    tol: float = 1e-10,
    inner_tol: float = 1e-5,
    max_cycles: int = 8,
    inner_solver: str = "sbcgrq",
    inner_max_iter: int = 2000,
    qr_passes: int = 2,
    replace_every: int = 0,
    solve_fn: Callable | None = None,
    op64=None,
    checkpoint_path: str | None = None,
    verbose: bool = False,
) -> tuple[jax.Array, SolverInfo]:
    """Solve ``A X = B`` to a tolerance below f32 reach.

    Args:
      op: operator in its compute dtype (f32 — the hot path).
      B: (n, k) right-hand sides (any float dtype; promoted to f64).
      tol: outer true-residual target.
      inner_tol: per-cycle f32 solve target (1e-4..1e-6 sensible).
      solve_fn: optional override ``(op, R32, tol) -> (D, info)`` — e.g. a
        distributed closure; defaults to solve_sbcgrq/solve_bcg.
      op64: optional full-precision operator for the outer residual. Default
        is ``op`` promoted to f64 — exact for operators whose entries are
        f32-representable (stencil coefficients, lattice hoppings); pass the
        original f64 operator when the matrix data itself was rounded to f32,
        otherwise the reachable tolerance floors at the rounding error.

    Returns:
      (X, SolverInfo) with X in f64; ``info.iterations`` counts refinement
      cycles, ``info.matvecs`` totals inner + outer operator applications.
    """
    if solve_fn is None:
        if inner_solver == "sbcgrq":
            def solve_fn(o, r, t):
                return solve_sbcgrq(
                    o, r, tol=t, max_iter=inner_max_iter,
                    qr_passes=qr_passes, replace_every=replace_every,
                )
        elif inner_solver == "bcg":
            def solve_fn(o, r, t):
                return solve_bcg(o, r, tol=t, max_iter=inner_max_iter)
        else:
            raise ValueError(f"unknown inner solver {inner_solver!r}")

    compute_dtype = op.dtype
    cplx = jnp.issubdtype(jnp.dtype(B.dtype), jnp.complexfloating)
    f64 = jnp.complex128 if cplx else jnp.float64
    # The outer residual genuinely needs f64 (XLA-emulated on TPU); without
    # the x64 flag jnp.float64 silently degrades to f32 and refinement stalls
    # at the f32 noise floor (~5e-7). The flag is scoped to the f64 pieces
    # only — the hot f32 inner solve traces outside it.
    with jax.enable_x64(True):
        if op64 is None:
            op64 = op_astype(op, f64)
        B64 = B.astype(f64)
        bnorm = jnp.linalg.norm(B64, axis=0)
        bnorm = jnp.where(bnorm > 0, bnorm, 1.0)
        X = jnp.zeros_like(B64)
        if checkpoint_path is not None:  # resume = warm start (SURVEY.md §6)
            from blockcg_tpu.utils.checkpoint import load_checkpoint

            ckpt = load_checkpoint(checkpoint_path)
            if ckpt is not None:
                X = ckpt[0].astype(f64)
                if verbose:
                    print(f"[refine] resumed from {checkpoint_path} (cycle {ckpt[1]})")
        # Cycle 0 of the compiled outer program (D = 0): true residual,
        # per-RHS scaling (so the f32 inner solver sees O(1) columns —
        # residuals span decades across cycles), next inner RHS. One
        # dispatch; the scale/relres host round-trips of the former eager
        # version are gone.
        zero_d = jnp.zeros(B.shape, compute_dtype)
        ones = jnp.ones_like(bnorm)
        X, R_in, scale, relres = _refine_cycle(
            op64, X, zero_d, ones, B64, bnorm, jnp.dtype(compute_dtype)
        )
        already_done = bool(jnp.max(relres) <= tol)

    matvecs = 1
    cycles = 0
    if already_done:
        max_cycles = 0  # e.g. resumed from a converged checkpoint
    for cycles in range(1, max_cycles + 1):
        D, inner_info = solve_fn(op, R_in, inner_tol)
        matvecs += int(inner_info.matvecs)
        with jax.enable_x64(True):
            X, R_in, scale, relres = _refine_cycle(
                op64, X, jnp.asarray(D), scale, B64, bnorm,
                jnp.dtype(compute_dtype),
            )
        matvecs += 1
        if checkpoint_path is not None:
            from blockcg_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(checkpoint_path, X, iteration=cycles)
        done = bool(jnp.max(relres) <= tol)
        if verbose:
            print(
                f"[refine] cycle {cycles}: max relres = "
                f"{float(jnp.max(relres)):.3e}"
            )
        if done:
            break

    with jax.enable_x64(True):
        info = SolverInfo(
            iterations=jnp.int32(cycles),
            relres=relres,
            converged=relres <= tol,
            matvecs=jnp.int32(matvecs),
        )
    return X, info
