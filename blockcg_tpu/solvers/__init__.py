from blockcg_tpu.solvers.cg import solve_cg
from blockcg_tpu.solvers.bcg import solve_bcg
from blockcg_tpu.solvers.bcga import solve_bcga
from blockcg_tpu.solvers.bcgdq import solve_bcgdq
from blockcg_tpu.solvers.sbcgrq import solve_sbcgrq
from blockcg_tpu.solvers.deflate import solve_sbcgrq_deflated

# Dubrulle-ladder naming parity (BIT 41 (2001)): the reference README's
# "BCGrQ" is the residual-QR member of the ladder — our SBCGrQ.
solve_bcgrq = solve_sbcgrq
from blockcg_tpu.solvers.pbcg import (jacobi_preconditioner,
                                      solve_pbcg, solve_psbcgrq)
from blockcg_tpu.solvers.poly import solve_sbcgrq_cheb
from blockcg_tpu.solvers.refine import solve_refined, solve_refined_lean
from blockcg_tpu.solvers.shifted import solve_shifted_cg
from blockcg_tpu.solvers.shifted_block import solve_shifted_sbcgrq
from blockcg_tpu.solvers.common import cholqr, block_dot, col_norms2

__all__ = [
    "solve_cg",
    "solve_bcg",
    "solve_bcga",
    "solve_bcgdq",
    "solve_pbcg",
    "solve_psbcgrq",
    "jacobi_preconditioner",
    "solve_bcgrq",
    "solve_sbcgrq",
    "solve_sbcgrq_deflated",
    "solve_refined",
    "solve_refined_lean",
    "solve_sbcgrq_cheb",
    "solve_shifted_cg",
    "solve_shifted_sbcgrq",
    "cholqr",
    "block_dot",
    "col_norms2",
]
