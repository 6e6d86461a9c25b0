from blockcg_tpu.solvers.cg import solve_cg
from blockcg_tpu.solvers.bcg import solve_bcg
from blockcg_tpu.solvers.sbcgrq import solve_sbcgrq
from blockcg_tpu.solvers.refine import solve_refined
from blockcg_tpu.solvers.shifted import solve_shifted_cg
from blockcg_tpu.solvers.common import cholqr, block_dot, col_norms2

__all__ = [
    "solve_cg",
    "solve_bcg",
    "solve_sbcgrq",
    "solve_refined",
    "solve_shifted_cg",
    "cholqr",
    "block_dot",
    "col_norms2",
]
