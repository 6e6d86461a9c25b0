"""Automatic operator-format selection from a scipy sparse matrix.

Reference equivalent: R1 (SURVEY.md §3.1) — Eigen's sparse-times-dense takes
ANY sparsity and the library user never chooses a kernel. Here the fast path
depends on structure, so ``from_scipy_auto`` inspects the matrix (host-side,
cheap integer scans) and picks the best TPU container:

  1. few distinct diagonals        -> DIAOperator (Pallas stencil kernel)
  2. tile-densifiable under RCM    -> TiledOperator(reorder="rcm")
                                      (sparse-tile MXU kernel; bf16 tiles
                                      optional via tile_dtype)
  3. bounded row width             -> ELLOperator (XLA fixed-width gather)
  4. otherwise                     -> CSROperator (XLA segment-sum)

The RCM choice applies in a permuted row order; every operator exposes
``to_solver_order`` / ``from_solver_order`` (identity by default,
operators/base.py) so caller code is format-agnostic:

    op = from_scipy_auto(a)
    X, info = solve_sbcgrq(op, op.to_solver_order(B))
    X = op.from_solver_order(X)

The tiled-vs-gather decision uses CHIP-MEASURED rate models
(bench_scattered.py + tools/probe_gather_bound.py on the v5e,
BASELINE.md 2026-08-18, k=32):

  tiled(RCM) nnz/s ~= 49 Gnnz/s x tile fill   (linear model matches the
      measured delaunay/RGG/expander sweep to within 3%: fills 0.072% ->
      3.24% measured 0.036 -> 1.59 Gnnz/s)
  ELL nnz/s       ~= 0.55 Gnnz/s x (mean_deg / max_deg)^2   (0.55 is the
      measured random-row-gather speed of light; the quadratic padding
      penalty fits the measured regular/uniform/delaunay/RGG points
      within ~35%)

Tiling wins when its predicted rate clears the ELL prediction by a 1.3x
margin AND the fill clears the hard floor ``min_fill`` (default 0.28% =
break-even against the WORST measured gather rate 0.14 Gnnz/s).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _predicted_rcm_fill(a, T: int = 128):
    """(fill, ntiles, perm) of P A P^T under RCM, without building tiles.
    The perm is returned so the selected TiledOperator reuses it — the RCM
    pass and the permuted-CSR materialization are the dominant host cost on
    large meshes and must not run twice."""
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    perm = np.asarray(reverse_cuthill_mckee(a, symmetric_mode=True))
    ap = a[perm][:, perm].tocsr()
    n = ap.shape[0]
    ct = np.asarray(ap.indices, dtype=np.int64) // T
    rt = np.repeat(np.arange(n, dtype=np.int64) // T, np.diff(ap.indptr))
    ntiles = np.unique(rt * (-(-n // T)) + ct).size
    return ap.nnz / (ntiles * T * T), ntiles, perm


# Chip-measured rate-model constants (v5e, k=32; BASELINE.md 2026-08-18).
_TILED_GNNZS_PER_FILL = 49.0   # tiled nnz/s = this x tile fill
_GATHER_BOUND_GNNZS = 0.55     # random-row-gather speed of light
_TILED_MARGIN = 1.3            # tile only when predicted to win by this


def from_scipy_auto(
    a,
    dtype=jnp.float32,
    *,
    max_diagonals: int = 48,
    min_fill: float = 0.0028,
    max_ell_width: int = 64,
    max_pad_bytes: int = 8 << 30,
    tile_dtype=None,
    verbose: bool = False,
):
    """Pick and build the best operator container for ``a`` (square sparse).

    Args:
      max_diagonals: use DIA when the matrix has at most this many distinct
        nonzero diagonals (stencils/banded matrices; the Pallas stencil
        kernel streams one coefficient row per diagonal).
      min_fill: hard fill floor for the RCM tile format (default = the
        measured break-even against the worst gather rate; the measured
        rate model above it decides tiled-vs-gather per matrix).
      max_ell_width: fall back to ELL when the max row degree is bounded by
        this, else CSR.
      tile_dtype: forwarded to TiledOperator (e.g. jnp.bfloat16).
    """
    from blockcg_tpu.operators.csr import CSROperator, ELLOperator
    from blockcg_tpu.operators.dia import DIAOperator
    from blockcg_tpu.operators.tiled import TiledOperator

    a = a.tocsr()
    if a.shape[0] != a.shape[1]:
        raise ValueError(f"square matrix required, got {a.shape}")
    coo = a.tocoo()
    offsets = np.unique(coo.col.astype(np.int64) - coo.row.astype(np.int64))

    if offsets.size <= max_diagonals:
        if verbose:
            print(f"[auto] DIA: {offsets.size} diagonals")
        return DIAOperator.from_scipy(a, dtype=dtype)

    counts = np.diff(a.indptr)
    fill, ntiles, perm = _predicted_rcm_fill(a)
    tiled_est = _TILED_GNNZS_PER_FILL * fill
    ell_ok = counts.max() <= max_ell_width
    gather_est = _GATHER_BOUND_GNNZS * (
        (counts.mean() / max(counts.max(), 1)) ** 2 if ell_ok else 0.25)
    if (fill >= min_fill and tiled_est >= _TILED_MARGIN * gather_est
            and ntiles * 128 * 128 * 4 <= max_pad_bytes):
        if verbose:
            print(f"[auto] tiled+RCM: predicted fill {fill:.2%}, "
                  f"{ntiles} tiles, est {tiled_est:.2f} vs gather "
                  f"{gather_est:.2f} Gnnz/s")
        try:
            return TiledOperator.from_scipy(
                a, dtype=dtype, perm=perm, tile_dtype=tile_dtype,
                max_pad_bytes=max_pad_bytes,
            )
        except ValueError:
            # Padding after the tile-multiple row pad crossed the budget
            # (the estimate above is pre-padding): fall through to the
            # gather formats — falling back IS the selector's job.
            pass

    if ell_ok:
        if verbose:
            print(f"[auto] ELL: width {int(counts.max())} (tiled est "
                  f"{tiled_est:.2f} did not clear gather est "
                  f"{gather_est:.2f} Gnnz/s x {_TILED_MARGIN})")
        return ELLOperator.from_scipy(a, dtype=dtype)
    if verbose:
        print(f"[auto] CSR: max row degree {int(counts.max())}")
    return CSROperator.from_scipy(a, dtype=dtype)
