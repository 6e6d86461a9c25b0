"""Converged-column deflation for block solvers (T-C4, SURVEY.md §3.2).

O'Leary's variable-block-size device (SURVEY.md §8 hard part 4): once
columns of the RHS block converge, iterating them further wastes SpMM and
update bandwidth — on TPU the field traffic is proportional to the block
width k, and with spread-difficulty RHS the worst column can keep the whole
block hot for 2x its useful life.

TPU-native shape constraint: XLA wants static shapes, so columns cannot be
dropped inside the jitted ``lax.while_loop``. Instead the solve restarts at
**halving widths**: the inner SBCGrQ stage exits as soon as the number of
unconverged columns reaches half the current width (the ``active_floor``
stop-rule hook in ``_sbcgrq_impl``), the converged columns are frozen, and
the survivors warm-start a stage of half the width. Each restart costs one
extra SpMM (the fresh thin-QR of the true residual — the same cost as a
residual replacement) and each width compiles once (cached thereafter).

Widths are padded to a multiple of 8 — the f32 sublane quantum of the
lanes-major (k, n) fields; narrower would pad silently and save nothing.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from blockcg_tpu.types import SolverInfo
from blockcg_tpu.solvers.sbcgrq import solve_sbcgrq


def _ceil_to(x: int, q: int) -> int:
    return ((x + q - 1) // q) * q


def solve_sbcgrq_deflated(
    op,
    B: jax.Array,
    X0: jax.Array | None = None,
    *,
    tol: float = 1e-6,
    max_iter: int = 1000,
    qr_passes: int = 1,
    replace_every: int = 0,
    min_width: int = 8,
    width_quantum: int = 8,
) -> tuple[jax.Array, SolverInfo]:
    """SBCGrQ with converged-column deflation (width-halving restarts).

    Returns (X, info) like ``solve_sbcgrq``; additionally ``info`` carries
    ``per_rhs_iters`` (iterations each column spent active, summed over
    stages) and ``matvec_cols`` (total SpMM column-passes = sum of
    stage_width x stage_matvecs — the bandwidth-weighted work metric that
    deflation actually reduces).
    """

    def stage(Bs, X0s, budget, floor):
        # max_iter fixed (static jit key); the shrinking budget rides the
        # traced iter_cap so every stage at a given width shares one
        # compilation (see _sbcgrq_impl).
        return solve_sbcgrq(
            op, Bs, X0s, tol=tol, max_iter=max_iter, iter_cap=budget,
            qr_passes=qr_passes, replace_every=replace_every,
            active_floor=floor,
        )

    return _deflated_driver(stage, B, X0, tol=tol, max_iter=max_iter,
                            min_width=min_width, width_quantum=width_quantum)


def _deflated_driver(
    stage, B, X0, *, tol, max_iter, min_width, width_quantum
) -> tuple[jax.Array, SolverInfo]:
    """Width-halving restart loop around a stage solver.

    ``stage(Bs, X0s, budget, floor) -> (X, info)`` runs the inner SBCGrQ
    with the ``active_floor`` stop rule; the single-device and the
    row-sharded entry points (parallel/api.py solve_sbcgrq_deflated_dist)
    share this host loop — column subsetting happens on the (n, k)
    API-boundary arrays either way.
    """
    n, k = B.shape
    if k < 2 * min_width:
        X, info = stage(B, X0, max_iter, 0)
        info.matvec_cols = info.matvecs * k
        return X, info

    X = jnp.zeros_like(B) if X0 is None else X0
    active = np.arange(k)
    per_rhs = np.zeros(k, np.int64)
    relres_out = np.full(k, np.nan)
    conv_out = np.zeros(k, bool)
    iters_total = 0
    mv_total = 0
    mv_cols = 0
    any_breakdown = False

    while True:
        na = len(active)
        w = _ceil_to(na, width_quantum)
        halving = w > min_width and iters_total < max_iter
        floor = w // 2 if halving else 0
        idx = jnp.asarray(active)
        Bs = jnp.zeros((n, w), B.dtype).at[:, :na].set(B[:, idx])
        X0s = jnp.zeros((n, w), B.dtype).at[:, :na].set(X[:, idx])
        budget = max(max_iter - iters_total, 1)
        D, info = stage(Bs, X0s, budget, floor)
        X = X.at[:, idx].set(D[:, :na])
        if info.breakdown is not None:
            any_breakdown = any_breakdown or bool(info.breakdown)
        stage_iters = int(info.iterations)
        stage_mv = int(info.matvecs)
        iters_total += stage_iters
        mv_total += stage_mv
        mv_cols += stage_mv * w
        pr = np.asarray(info.per_rhs_iters)[:na]
        rr = np.asarray(info.relres)[:na]
        per_rhs[active] += pr
        relres_out[active] = rr
        conv_out[active] = rr <= tol
        still = active[rr > tol]
        if len(still) == 0 or not halving or iters_total >= max_iter:
            break
        if len(still) == na and stage_iters >= budget:
            break  # no progress left in the budget
        active = still

    info = SolverInfo(
        iterations=jnp.int32(iters_total),
        relres=jnp.asarray(relres_out, jnp.real(B).dtype),
        converged=jnp.asarray(conv_out),
        matvecs=jnp.int32(mv_total),
        per_rhs_iters=jnp.asarray(per_rhs, jnp.int32),
        matvec_cols=jnp.int32(mv_cols),
        breakdown=jnp.asarray(any_breakdown),
    )
    return X, info
