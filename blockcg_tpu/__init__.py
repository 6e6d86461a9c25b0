"""blockcg-tpu: TPU-native block conjugate-gradient solvers.

A brand-new JAX/XLA/Pallas framework providing the solver capabilities of the
reference ``lkeegan/blockCG`` (C++/Eigen, single process): CG, block CG (BCG,
O'Leary 1980), and the thin-QR-stabilized SBCGrQ variant (Dubrulle, BIT 41
(2001)) for symmetric positive-definite sparse systems ``A X = B`` with many
right-hand sides.

Reference parity note: the reference mount (/root/reference) was empty in every
session; parity is against the capability contract in SURVEY.md / BASELINE.json
(solver family + recurrences in SURVEY.md §1.2, component inventory §3).

Layering (SURVEY.md §2.2):
  L4 solver API    : solve_cg / solve_bcg / solve_sbcgrq  (this module's exports)
  L3 solver core   : jitted ``lax.while_loop`` bodies (blockcg_tpu.solvers)
  L2 dist. algebra : row-partitioned operator, halo exchange, psum Gram
                     (blockcg_tpu.parallel)
  L1 kernels       : Pallas/Mosaic SpMM + CholQR (blockcg_tpu.ops)
  L0 platform      : jax, pjit/shard_map, Mesh over ICI/DCN
"""

from blockcg_tpu.utils.platform import enable_compilation_cache as _encc

# Persistent compilation cache, enabled for every entry point by the
# package import itself (pure config: touches no backend). Measured round-3
# cost of cold compiles through this sandbox's remote-compile tunnel:
# 346 s per ring-solve shape, 519-777 s for full-size config 5 — per
# PROCESS. The cache key hashes the serialized HLO, so kernel edits never
# hit stale entries. BLOCKCG_NO_COMPILE_CACHE=1 opts out.
_encc()

from blockcg_tpu.types import SolverOptions, SolverInfo
from blockcg_tpu.operators import (
    CSROperator,
    ELLOperator,
    DIAOperator,
    BSROperator,
    DenseOperator,
)
from blockcg_tpu.solvers import (
    solve_cg,
    solve_bcg,
    solve_bcga,
    solve_bcgdq,
    solve_pbcg,
    solve_psbcgrq,
    jacobi_preconditioner,
    solve_bcgrq,
    solve_sbcgrq,
    solve_sbcgrq_deflated,
    solve_refined,
    solve_refined_lean,
    solve_sbcgrq_cheb,
    solve_shifted_cg,
    solve_shifted_sbcgrq,
)

__version__ = "0.1.0"

__all__ = [
    "SolverOptions",
    "SolverInfo",
    "CSROperator",
    "ELLOperator",
    "DIAOperator",
    "BSROperator",
    "DenseOperator",
    "solve_cg",
    "solve_bcg",
    "solve_bcga",
    "solve_bcgdq",
    "solve_bcgrq",
    "solve_sbcgrq",
    "solve_sbcgrq_deflated",
    "solve_refined",
    "solve_refined_lean",
    "solve_sbcgrq_cheb",
    "solve_shifted_cg",
    "solve_shifted_sbcgrq",
]
