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

The decision thresholds come from measured throughput (BASELINE.md):
the tile kernel's nnz/s ~= fill x tile-load bandwidth, the XLA gather path
runs ~0.5 Gnnz/s, so tiling wins whenever predicted fill clears
``min_fill`` (default 0.5%, ~2x the break-even).
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


def from_scipy_auto(
    a,
    dtype=jnp.float32,
    *,
    max_diagonals: int = 48,
    min_fill: float = 0.005,
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
      min_fill: use the RCM-reordered tile format when the predicted tile
        fill clears this (padded-tile HBM traffic is the cost; below the
        threshold the XLA gather path wins).
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

    fill, ntiles, perm = _predicted_rcm_fill(a)
    if fill >= min_fill and ntiles * 128 * 128 * 4 <= max_pad_bytes:
        if verbose:
            print(f"[auto] tiled+RCM: predicted fill {fill:.2%}, "
                  f"{ntiles} tiles")
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

    counts = np.diff(a.indptr)
    if counts.max() <= max_ell_width:
        if verbose:
            print(f"[auto] ELL: width {int(counts.max())} "
                  f"(RCM fill {fill:.2%} below {min_fill:.1%})")
        return ELLOperator.from_scipy(a, dtype=dtype)
    if verbose:
        print(f"[auto] CSR: max row degree {int(counts.max())}")
    return CSROperator.from_scipy(a, dtype=dtype)
